package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the Deequ-style constraint suite a
  * production ingest runs before promoting a batch (the relational sibling of
  * the text-quality gates in [[Text]]).
  *
  * Design for scale: every scan-expressible constraint (completeness, range,
  * domain membership, uniqueness) folds into ONE single-pass aggregation over
  * the audited table — `n` constraints never cost `n` scans. Uniqueness rides
  * the same pass as `count_distinct` (Catalyst plans the distinct aggregate
  * as one Expand over the already-read rows, not a second scan). Referential
  * integrity is the only constraint that needs a second relation; it runs as
  * ONE left-anti join against the parent's key projection — broadcast when
  * the parent is a dimension, shuffle otherwise — and contributes a single
  * violation count. The report is assembled driver-free: the metric rows are
  * exploded from an array of structs over the two one-row aggregates, so the
  * whole suite is 2 jobs regardless of how many constraints it carries.
  *
  * Determinism contract: every reported value is an integer count or a
  * boolean over integer counts — no floating point anywhere, so the DuckDB
  * oracle matches bit-for-bit by construction.
  */
object Quality {

  /** One declared constraint: a display name plus a violation-count column
    * evaluated inside the single-pass aggregate (count of rows FAILING the
    * predicate; 0 = fully satisfied).
    */
  final case class Check(name: String, violations: org.apache.spark.sql.Column)

  /** Count of rows where `pred` is false or null — the violation form all
    * row-local checks reduce to. (Null-safe: a null predicate result counts
    * as a violation, matching SQL `count(*) FILTER (WHERE NOT coalesce(p,
    * false))`.)
    */
  def failing(pred: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L))

  /** Run `checks` in one pass over `df`, plus one referential-integrity
    * check (`childKey` ⊆ `parent[parentKey]`) as a left-anti join, and emit
    * the validation report: one row per constraint with
    * `(constraint, violations, total, passed)`.
    *
    * `broadcastParent` broadcasts the parent's distinct-key projection —
    * right for dimension parents (the aggregated key frame has no stats, so
    * the planner would otherwise assume huge and shuffle the child; same
    * trap as the `unigramLogProb` vocab join). Set it false when the parent
    * is beyond broadcast range — the anti join then shuffles both sides on
    * the key, still one pass of the child.
    */
  def validate(
      df: DataFrame,
      checks: Seq[Check],
      childKey: String,
      parent: DataFrame,
      parentKey: String,
      riName: String,
      broadcastParent: Boolean = true): DataFrame = {
    val aggCols = count(lit(1)).as("__total") +:
      checks.zipWithIndex.map { case (c, i) => c.violations.cast("long").as(s"__v$i") }
    val scanMetrics = df.agg(aggCols.head, aggCols.tail: _*)

    val parentKeys = parent.select(col(parentKey).as(childKey)).distinct()
    val riViolations = df
      .join(
        if (broadcastParent) broadcast(parentKeys) else parentKeys,
        Seq(childKey),
        "left_anti")
      .agg(count(lit(1)).as("__vri"))

    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("constraint"), col(s"__v$i").as("violations"))
    } :+ struct(lit(riName).as("constraint"), col("__vri").as("violations"))

    scanMetrics
      .crossJoin(broadcast(riViolations))
      .select(col("__total"), explode(array(rows: _*)).as("__r"))
      .select(
        col("__r.constraint").as("constraint"),
        col("__r.violations").as("violations"),
        col("__total").as("total"),
        (col("__r.violations") === 0L).as("passed"))
  }
}
