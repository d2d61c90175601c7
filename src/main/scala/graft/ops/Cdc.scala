package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture style merge: latest-wins upsert of an update batch
  * into a keyed base snapshot — the maintenance step every long-lived
  * training-data corpus needs (re-crawled documents, corrected labels,
  * re-scored quality columns) expressed as one declarative window, not a
  * row-at-a-time MERGE.
  *
  * Scale shape: one shuffle on the merge keys. `row_number` keeps exactly
  * one row per key, and Spark 4's WindowGroupLimit pushes the rn=1 filter
  * into the sort, so no full-partition window materializes. On a cluster
  * where the base snapshot is bucketed by the key ([[Sources.writeBucketed]])
  * the base side shuffles zero bytes — only the (much smaller) update batch
  * moves.
  */
object Cdc {

  /** Latest-wins upsert: rows from `updates` replace same-key rows of
    * `base`; within each side the greatest `order` wins; a full tie goes to
    * the update row (`__pri`), making the result total-order deterministic
    * whenever `keys ++ order` is a unique key of each input.
    */
  def upsert(
      base: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      order: Seq[Column]): DataFrame = {
    val u = base.withColumn("__pri", lit(0))
      .unionByName(updates.withColumn("__pri", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(_.desc) :+ col("__pri").desc: _*)
    u.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__pri")
  }
}
