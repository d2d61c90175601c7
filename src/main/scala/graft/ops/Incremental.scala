package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance: keep an aggregate table current by merging
  * the partial state of each new ingest batch instead of re-aggregating the
  * full history — at 100 TB the difference between touching one day and
  * touching three years.
  *
  * The state is (count, exact DECIMAL sum) per group — a commutative monoid,
  * so merge order and batch boundaries cannot change the result: finalize ∘
  * mergeAll(partials) is BIT-identical to a from-scratch aggregation (the
  * `ivm_merge_agg` query pins that against the direct DuckDB oracle). The
  * same pair is what [[Exact.dmean]] computes in one pass and what
  * [[Skew.saltedStats]] merges across salt shards — one algebra, three
  * execution shapes.
  */
object Incremental {

  /** Per-batch partial state: count + exact decimal sum per group. */
  def partials(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol).cast(Exact.SumType)).as("total"))

  /** Merge two partial-state tables (associative/commutative). */
  def mergePartials(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("total")).as("total"))

  /** Close the state into (n, mean_value) — same arithmetic as
    * [[Exact.dmean]]: decimal total cast to double, divided by the count.
    */
  def finalizeMean(parts: DataFrame): DataFrame =
    parts
      .withColumn("mean_value", col("total").cast("double") / col("n"))
      .drop("total")

  /** Incremental COUNT DISTINCT state: a DataSketches HLL sketch per group
    * (`hll_sketch_agg`) — the mergeable analog of the (count, sum) monoid
    * for a measure that a plain counter cannot maintain. Each ingest batch
    * sketches only its own rows; [[hllMerge]] unions batch states without
    * touching history; `hll_sketch_estimate` closes the state.
    *
    * Determinism contract — measured, WEAKER than this engine's exact
    * ops and stated plainly: Spark aggregates `hll_sketch_agg` as
    * per-partition partial sketches unioned at the end, and a
    * DataSketches union is not bit-identical to a one-shot sketch
    * (HLL mode transitions differ), so the estimate can wobble by ±ε
    * UNDER DIFFERENT PARTITIONING, not just different batch splits
    * (`PipelineOpsSpec` pins the wobble bound and same-plan stability).
    * That is the 100 TB trade: re-counting distincts exactly means
    * re-scanning every batch ever ingested; the exact path per batch
    * stays [[partials]]/`countDistinct`.
    */
  def hllPartials(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol)).as("hll"))

  /** Merge two HLL state tables (associative/commutative union). */
  def hllMerge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("hll")).as("hll"))

  /** Close HLL state into a distinct-count estimate per group. */
  def hllFinalize(parts: DataFrame): DataFrame =
    parts
      .withColumn("approx_distinct", hll_sketch_estimate(col("hll")))
      .drop("hll")
}
