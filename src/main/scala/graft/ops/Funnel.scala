package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-step funnel matching over an event log: for each entity, the
  * earliest time it performed step 1, the earliest step-2 event STRICTLY
  * after that, and so on — the sequential-pattern query behind conversion
  * funnels and multi-stage pipeline audits.
  *
  * Spark-first shape: one conditional `min` aggregation per step, chained
  * through a key join that carries the previous step's timestamp. Every
  * stage shuffles on the same entity key, so Exchange reuse keeps this at
  * ONE physical shuffle of the event log per step over pre-filtered rows
  * (each stage scans only its own step's events — predicate pushed to the
  * scan), never a per-entity sort of the whole log. Steps are a fixed small
  * list, so the chain length is bounded at plan time.
  */
object Funnel {

  /** One output row per distinct key: `t1_us .. tN_us` (BIGINT event-time
    * of the earliest in-order match per step, NULL once the funnel stalls)
    * and `steps_completed`.
    */
  def steps(
      df: DataFrame,
      keyCol: String,
      typeCol: String,
      tsCol: String,
      stepTypes: Seq[String]): DataFrame = {
    require(stepTypes.nonEmpty, "funnel needs at least one step")
    val keys = df.select(col(keyCol)).distinct()
    // step 1: unconditional earliest
    var cur = df.filter(col(typeCol) === stepTypes.head)
      .groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("t1_us"))
    // step i: earliest event of type i strictly after step i-1's time;
    // the inner join prunes entities that already stalled
    stepTypes.zipWithIndex.drop(1).foreach { case (st, i) =>
      val prev = s"t${i}_us"
      val next = s"t${i + 1}_us"
      val cand = df.filter(col(typeCol) === st)
        .join(cur.select(col(keyCol), col(prev)), Seq(keyCol))
        .filter(col(tsCol) > col(prev))
        .groupBy(col(keyCol))
        .agg(min(col(tsCol)).as(next))
      cur = cur.join(cand, Seq(keyCol), "left")
    }
    val tCols = stepTypes.indices.map(i => s"t${i + 1}_us")
    val completed = tCols
      .map(c => col(c).isNotNull.cast("long"))
      .reduce(_ + _)
    keys.join(cur, Seq(keyCol), "left")
      .select(col(keyCol) +: tCols.map(col) :+ completed.as("steps_completed"): _*)
  }
}
