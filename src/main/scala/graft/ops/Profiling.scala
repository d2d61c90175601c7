package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling — the audit every training-data ingest runs
  * before anything else: per-column row/null/distinct counts.
  *
  * Scale shape: ONE aggregation pass over the table computes every
  * column's counters, then a `stack` unpivots the single result row into
  * one row per column. Never one scan per column. The EXACT distinct path
  * has a hidden cost: Spark plans N simultaneous `countDistinct`s via an
  * Expand node that replicates every input row ~(N+1)× before the shuffle —
  * acceptable for a correctness gate, wrong for a routine 100 TB ingest
  * audit. `approx = true` swaps in `approx_count_distinct` (HyperLogLog++,
  * default rsd 5%): no Expand, no replication, one ordinary hash
  * aggregation — that is the variant to run at scale.
  */
object Profiling {

  /** One row per profiled column: (column, n_rows, n_null, n_distinct).
    * n_distinct excludes NULL (SQL count-distinct semantics). Exact by
    * default; `approx = true` estimates distincts via HyperLogLog++ (see
    * the Expand note above — use it at scale).
    */
  def profile(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val distinctOf: String => org.apache.spark.sql.Column =
      if (approx) c => approx_count_distinct(col(c)) else c => countDistinct(col(c))
    val aggs = cols.flatMap(c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        distinctOf(c).as(s"__dist_$c"))) :+ count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', __null_$c, __dist_$c")
      .mkString(", ")
    row.select(
      expr(s"stack(${cols.size}, $stackArgs) AS (column, n_null, n_distinct)"),
      col("__n").as("n_rows"))
      .select(col("column"), col("n_rows"), col("n_null"), col("n_distinct"))
  }

  /** Physical-partition row counts — the first thing to look at when a
    * stage straggles: one `spark_partition_id` groupBy (map-side combined,
    * one row per partition) showing exactly how skewed the current
    * distribution is. Diagnostic: the ids are plan-dependent, so this is
    * for eyes/assertions on a KNOWN plan, never for oracle-checked output.
    */
  def partitionSizes(df: DataFrame): DataFrame =
    df.groupBy(spark_partition_id().as("partition"))
      .agg(count(lit(1)).as("n_rows"))
}
