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

  /** Full CDC apply — [[upsert]] completed with DELETES: `ops` carries an
    * `opCol` ∈ {I, U, D} per change row (the Debezium/Delta-MERGE event
    * shape), the latest op per key wins (greatest `order`, tie to the op
    * row over the base row), and a winning D removes the key from the
    * snapshot entirely — the GDPR-erasure / retraction path a
    * latest-wins upsert structurally cannot express.
    *
    * Same scale shape as [[upsert]]: the union shuffles once on the merge
    * keys, WindowGroupLimit prunes to one row per key during the sort,
    * and the D-filter is a post-window predicate — no join, no second
    * pass. I and U apply identically (both mean "this payload is the
    * current row"); the distinction is the upstream log's, not the
    * merge's.
    *
    * Deletes are NOT retained as tombstones: a winning D removes the key
    * from the output entirely. In incremental foreachBatch use
    * (`StreamingSpec`) that means a later batch delivering an op with an
    * OLDER `order` value resurrects the deleted key — incremental
    * chaining is equivalent to one global apply only when batch
    * boundaries respect the order column (time-partitioned, in-order
    * batches, the CDC-log norm). For out-of-order logs keep the D rows
    * as explicit tombstone rows in the snapshot and filter on read.
    */
  def applyCdc(
      base: DataFrame,
      ops: DataFrame,
      keys: Seq[String],
      order: Seq[Column],
      opCol: String = "op"): DataFrame = {
    val u = base.withColumn("__pri", lit(0)).withColumn("__op", lit("U"))
      .unionByName(ops.withColumn("__pri", lit(1)).withColumn("__op", col(opCol)).drop(opCol))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(order.map(_.desc) :+ col("__pri").desc: _*)
    u.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("__op") =!= "D")
      .drop("__rn", "__pri", "__op")
  }

  /** Snapshot diff — the INVERSE of [[applyCdc]]: given two full keyed
    * snapshots (old and new corpus versions), emit the implied change log —
    * one row per key that was Inserted (only in new), Deleted (only in
    * old), or Updated (in both with any `compareCols` value differing,
    * null-safely). Unchanged keys emit nothing, so the output is sized by
    * the CHURN, not the corpus. This is the dataset-versioning audit every
    * corpus refresh needs (which documents entered / left / changed between
    * two crawls) and the bridge back to the CDC world: feeding the diff to
    * [[applyCdc]] reconstructs `new` from `old` exactly (round-trip pinned
    * in `OperatorProps`).
    *
    * Output: `keys`, `op` ∈ {I, U, D}, each compare column carrying the
    * CURRENT payload (new value for I/U, old value for D — the shape
    * [[applyCdc]] consumes), plus `<c>_old` audit columns (old value; NULL
    * for I).
    *
    * Scale shape: ONE full-outer shuffle join on the key — both sides move
    * once, or zero bytes when the snapshots are stored bucketed by the key
    * ([[Sources.writeBucketed]], the layout a versioned corpus store should
    * use anyway). Comparison is row-local (`<=>` per column, no window, no
    * second pass); pass a fingerprint column (e.g. `md5(text)`) instead of
    * wide payloads to keep the shuffled row narrow.
    *
    * Presence is tracked with explicit marker columns, not payload
    * null-ness, so keys whose compare columns are legitimately NULL
    * classify correctly (NULL vs NULL = unchanged; NULL vs value = U).
    * Empty `compareCols` degrades to a presence-only diff: I and D rows
    * by key membership, never U.
    */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val o = oldSnap
      .select(keys.map(col) ++ compareCols.map(c => col(c).as(s"__o_$c")): _*)
      .withColumn("__in_old", lit(1))
    val n = newSnap
      .select(keys.map(col) ++ compareCols.map(c => col(c).as(s"__n_$c")): _*)
      .withColumn("__in_new", lit(1))
    // empty compareCols is the presence-only diff (I/D by key, no U rows):
    // fold from false rather than reduce, which would throw on Nil
    val changed = compareCols
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .foldLeft(lit(false))(_ || _)
    o.join(n, keys, "full_outer")
      .withColumn(
        "op",
        when(col("__in_old").isNull, lit("I"))
          .when(col("__in_new").isNull, lit("D"))
          .when(changed, lit("U")))
      .filter(col("op").isNotNull)
      .select(
        keys.map(col) ++ Seq(col("op")) ++
          compareCols.map(c =>
            when(col("op") === "D", col(s"__o_$c")).otherwise(col(s"__n_$c")).as(c)) ++
          compareCols.map(c => col(s"__o_$c").as(s"${c}_old")): _*)
  }

  /** Slowly-changing-dimension type-2 history: every change row becomes a
    * VERSION with a validity interval — `valid_from` = its own `tsCol`,
    * `valid_to` = the next version's `tsCol` (NULL while current),
    * half-open [from, to) so the intervals tile the timeline exactly.
    * `order` must extend `tsCol` to a total order per key (same-instant
    * ties); `version` numbers versions 1..n per key and `is_current` ∈
    * {0,1} marks the open row — the columns an as-of join ([[graft.ops.Joins]])
    * or a point-in-time training-data reconstruction filters on.
    *
    * Scale shape: ONE window shuffle on `keys` — lead() and row_number()
    * share the same (keys, order) window frame, so Catalyst evaluates both
    * in a single Window operator over one sort, and per-key partitions
    * process in parallel (the key space is the shard space).
    */
  def scd2(
      changes: DataFrame,
      keys: Seq[String],
      tsCol: String,
      order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("valid_to").isNull.cast("long"))
  }
}
