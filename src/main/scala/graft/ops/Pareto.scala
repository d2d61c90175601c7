package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto skyline (multi-objective curation): keep the rows no other
  * row dominates, maximizing BOTH `x` and `y` — e.g. pick the documents on
  * the quality/length frontier instead of thresholding each axis
  * separately.
  *
  * Dominance: row A dominates row B iff xA >= xB AND yA >= yB AND A is
  * strictly better on at least one axis. Exact duplicates (xA = xB,
  * yA = yB) do not dominate each other — both survive, matching the usual
  * skyline-with-ties convention.
  *
  * Per partition the test is two window passes over an integral `x`:
  * `max(y)` over the strictly-greater-x prefix (ORDER BY x DESC RANGE
  * UNBOUNDED PRECEDING .. 1 PRECEDING — probed bit-identical Spark vs
  * DuckDB) and `max(y)` over the same-x peer group. A row survives iff
  * neither bound beats its y.
  *
  * Scale shape: a single global window would serialize the whole input
  * through one task, so [[skyline2d]] runs the classic two-stage
  * distributed skyline instead — local skylines per hash bucket (the
  * window partitions on the bucket, so all buckets prune in parallel),
  * then the global test over the union of local survivors. Safe because
  * dominance is transitive: any row dominated in its bucket is dominated
  * globally by the same (or a yet-better) row, so stage 1 never discards
  * a global-skyline row; stage 2 sees orders of magnitude fewer rows
  * (survivors per bucket are the bucket's own frontier). Worst case
  * (anti-correlated axes) the frontier itself is large and stage 2 pays
  * for it — that cost is inherent to the result size, not the plan.
  */
object Pareto {
  /** One skyline pruning pass: drop rows dominated WITHIN each `part`
    * group. `xCol` must be integral (the strict-prefix window is a range
    * frame at offset 1).
    */
  private def prune(in: DataFrame, part: Seq[Column], xCol: String, yCol: String): DataFrame = {
    val wStrict = Window.partitionBy(part: _*).orderBy(col(xCol).desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSameX = Window.partitionBy(part :+ col(xCol): _*)
    in.withColumn("__y_gt", max(col(yCol)).over(wStrict))
      .withColumn("__y_eq", max(col(yCol)).over(wSameX))
      .filter(
        (col("__y_gt").isNull || col("__y_gt") < col(yCol)) &&
          col("__y_eq") === col(yCol))
      .drop("__y_gt", "__y_eq")
  }

  /** Distributed 2-D skyline maximizing (`xCol`, `yCol`), both non-NULL
    * and `xCol` integral. `bucket` is any deterministic expression (e.g.
    * `pmod(col("id"), 32)`) spreading rows across stage-1 groups; the
    * result is the same for every bucketing, including `lit(0)` (the
    * direct single-pass form the DuckDB oracle runs).
    */
  def skyline2d(df: DataFrame, xCol: String, yCol: String, bucket: Column): DataFrame = {
    val local = prune(df.withColumn("__bkt", bucket), Seq(col("__bkt")), xCol, yCol)
      .drop("__bkt")
    prune(local, Seq.empty, xCol, yCol)
  }
}
