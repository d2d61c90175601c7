package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the Deequ-style constraint suite a
  * production ingest runs before promoting a batch (the relational sibling of
  * the text-quality gates in [[Text]]).
  *
  * Design for scale — constraints fold by their NATURE, not all into one agg:
  *
  *   - Row-local constraints (completeness, range, domain membership) fold
  *     into ONE single-pass aggregation — `n` such constraints never cost
  *     `n` scans.
  *   - Uniqueness is a SET-level constraint and runs as its own distinct
  *     aggregate over a single-column projection. Keeping it out of the
  *     shared pass keeps that pass a keyless one-row aggregate — fused,
  *     Spark's one-distinct planning keys the partial aggregates by the
  *     distinct column and carries every other metric as merge state
  *     through the full-cardinality grouping. Probed honestly at 200M
  *     rows over parquet (BASELINE.md): warm, split / per-constraint /
  *     fused-distinct land within ~15% of each other — columnar pruning
  *     means per-constraint scans re-read only their own columns, so
  *     pass-count is NOT an IO multiplier on parquet. The fold's real wins
  *     are job-scheduling overhead (one job vs one per constraint — the
  *     difference a 1000-table audit feels) and sources without column
  *     pruning (row formats, streams), and those come at no measured cost.
  *   - Referential integrity needs the parent relation and runs as ONE
  *     left-anti join against the parent's key projection — broadcast when
  *     the parent is a dimension, shuffle otherwise.
  *
  * The report is assembled driver-free: metric rows are exploded from an
  * array of structs over the one-row aggregates, so the suite is 3 jobs
  * regardless of how many row-local constraints it carries.
  *
  * Determinism contract: every reported value is an integer count or a
  * boolean over integer counts — no floating point anywhere, so the DuckDB
  * oracle matches bit-for-bit by construction.
  */
object Quality {

  /** One declared row-local constraint: a display name plus a
    * violation-count column evaluated inside the single-pass aggregate
    * (count of rows FAILING the predicate; 0 = fully satisfied).
    */
  final case class Check(name: String, violations: org.apache.spark.sql.Column)

  /** Count of rows where `pred` is false or null — the violation form all
    * row-local checks reduce to. (Null-safe: a null predicate result counts
    * as a violation, matching SQL `count(*) FILTER (WHERE NOT coalesce(p,
    * false))`.)
    */
  def failing(pred: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L))

  /** The fused row-local metric pass as a standalone one-row frame
    * (`total`, then one violation count per check, in declaration order).
    * This is also the per-micro-batch partial for CONTINUOUS constraint
    * monitoring: every value is an integer count, so merging batches is
    * elementwise addition — associative, exact, and the merged totals are
    * bit-equal to validating the concatenated batches from scratch
    * (`StreamingSpec` drives it through `foreachBatch`). The other two
    * constraint kinds keep their batch shapes in a stream too: uniqueness
    * against history is [[Dedup.exactDedupStream]]'s fingerprint state,
    * and RI probes the (slowly-changing) parent as a broadcast join per
    * batch.
    */
  def scanCounts(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggCols = count(lit(1)).cast("long").as("total") +:
      checks.map(c => c.violations.cast("long").as(c.name))
    df.agg(aggCols.head, aggCols.tail: _*)
      .na.fill(0L) // empty batch: sums are NULL, a monitor wants 0s
  }

  /** Run the row-local `checks` in one pass over `df`, a uniqueness check
    * on `uniqueCol` as its own pruned distinct aggregate, and one
    * referential-integrity check (`childKey` ⊆ `parent[parentKey]`) as a
    * left-anti join; emit the validation report — one row per constraint
    * with `(constraint, violations, total, passed)`. A null child key never
    * matches a parent key, so null FKs count as RI orphans (and the
    * completeness check is the constraint that names them).
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
      uniqueCol: Option[(String, String)],
      childKey: String,
      parent: DataFrame,
      parentKey: String,
      riName: String,
      broadcastParent: Boolean = true): DataFrame = {
    val aggCols = count(lit(1)).as("__total") +:
      checks.zipWithIndex.map { case (c, i) => c.violations.cast("long").as(s"__v$i") }
    val scanMetrics = df.agg(aggCols.head, aggCols.tail: _*)

    val uniq = uniqueCol.map { case (_, c) =>
      df.select(col(c))
        .agg((count(lit(1)) - countDistinct(col(c))).cast("long").as("__vu"))
    }

    val parentKeys = parent.select(col(parentKey).as(childKey)).distinct()
    val riViolations = df
      .join(
        if (broadcastParent) broadcast(parentKeys) else parentKeys,
        Seq(childKey),
        "left_anti")
      .agg(count(lit(1)).as("__vri"))

    val rows = (checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("constraint"), col(s"__v$i").as("violations"))
    } ++ uniqueCol.map { case (n, _) =>
      struct(lit(n).as("constraint"), col("__vu").as("violations"))
    }) :+ struct(lit(riName).as("constraint"), col("__vri").as("violations"))

    val joined = uniq.foldLeft(scanMetrics)((a, u) => a.crossJoin(broadcast(u)))
      .crossJoin(broadcast(riViolations))
    joined
      .select(col("__total"), explode(array(rows: _*)).as("__r"))
      .select(
        col("__r.constraint").as("constraint"),
        col("__r.violations").as("violations"),
        col("__total").as("total"),
        (col("__r.violations") === 0L).as("passed"))
  }
}
