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

  /** Per-batch partial state: row count, NON-NULL value count, and exact
    * decimal sum per group. `n` is the row count (what a `count(*)` oracle
    * reports); `nv` is the non-null count the mean divides by — SQL mean
    * semantics (`sum(x)/count(x)`), so a driver regen that introduces NULL
    * values cannot diverge [[finalizeMean]] from [[Exact.sqlDmean]].
    */
  def partials(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        count(col(valueCol)).as("nv"),
        sum(col(valueCol).cast(Exact.SumType)).as("total"))

  /** Merge two partial-state tables (associative/commutative). */
  def mergePartials(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("nv")).as("nv"),
        sum(col("total")).as("total"))

  /** Close the state into (n, mean_value) — same arithmetic as
    * [[Exact.dmean]]: decimal total cast to double, divided by the NON-NULL
    * count (`nv`). All-NULL groups yield NULL (NULL total propagates before
    * ANSI's zero-divisor check fires) in both engines.
    */
  def finalizeMean(parts: DataFrame): DataFrame =
    parts
      .withColumn("mean_value", col("total").cast("double") / col("nv"))
      .drop("total", "nv")

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

  /** Incremental QUANTILE state: a fixed-bin integer histogram per group —
    * the mergeable analog of [[Stats.exactQuantiles]] for a measure that,
    * like distinct-count, cannot be maintained from (count, sum) alone.
    * Exact quantiles need the batch's raw rows; at 100 TB an incremental
    * profile cannot re-scan history, so the state is (group, bin) → count
    * with DATA-INDEPENDENT bin config `(lo, width, nBins)` supplied by the
    * caller — batch boundaries and merge order then provably cannot change
    * the state (integer counts over a fixed bin universe form the same
    * commutative monoid as [[partials]]; `OperatorProps` pins split
    * invariance).
    *
    * Determinism contract (unlike [[hllPartials]], this one IS oracle-
    * checkable): bin = clamp(⌊(x − lo)/width⌋, 0, nBins−1) in IEEE double —
    * identical in both engines — and [[histQuantile]] interpolates within
    * the located bin with one fixed expression tree, so `ivm_hist_quantile`
    * hash-matches DuckDB. The SEMANTIC trade vs exact quantiles is binned
    * resolution: the result is the exact quantile of the binned (clamped,
    * within-bin-uniform) distribution, not of the raw values. NULL values
    * are excluded, matching every aggregate here.
    *
    * Scale shape: the state is ≤ groups × nBins rows regardless of corpus
    * size; partials map-side combine to the same bound per partition.
    */
  def histPartials(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      lo: Double,
      width: Double,
      nBins: Int): DataFrame = {
    require(width > 0 && nBins > 0, s"bad histogram config: width=$width nBins=$nBins")
    val bin = least(
      greatest(floor((col(valueCol) - lit(lo)) / lit(width)), lit(0L)),
      lit(nBins - 1L))
    df.filter(col(valueCol).isNotNull)
      .groupBy((keys.map(col) :+ bin.as("bin")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two histogram state tables (associative/commutative). */
  def histMerge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((keys :+ "bin").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Incremental OHLC state: per group, (count, earliest-row struct,
    * latest-row struct, high, low) — the candlestick aggregate
    * (`w22_ohlc`) as a commutative monoid, so a tick store can roll
    * candles forward per ingest batch without re-reading the day. The
    * open/close carriers are whole (ts, id, value) structs ordered
    * lexicographically on the total (ts, id) key: min/max of a struct is
    * associative, so merge order and batch boundaries provably cannot
    * change which row wins — and the closed open/close/high/low are raw
    * row VALUES (no arithmetic), hence engine-exact like [[histPartials]]
    * (the `ivm_ohlc_merge` oracle is the direct from-scratch
    * candlestick). NULL values are excluded, matching every aggregate
    * here. State is one row per group; partials map-side combine.
    */
  def ohlcPartials(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      idCol: String,
      valueCol: String): DataFrame = {
    val row = struct(col(tsCol), col(idCol), col(valueCol).as("v"))
    df.filter(col(valueCol).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        min(row).as("f"),
        max(row).as("l"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"))
  }

  /** Merge two OHLC state tables (associative/commutative). */
  def ohlcMerge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        min(col("f")).as("f"),
        max(col("l")).as("l"),
        max(col("high")).as("high"),
        min(col("low")).as("low"))

  /** Close OHLC state into (n, open, high, low, close) per group. */
  def ohlcFinalize(parts: DataFrame): DataFrame =
    parts.select(
      parts.columns.filterNot(Set("f", "l", "high", "low", "n")).map(col).toSeq ++ Seq(
        col("n"),
        col("f.v").as("open"),
        col("high"),
        col("low"),
        col("l.v").as("close")): _*)

  /** Close histogram state into per-group quantiles: for each q ∈ `qs`
    * (0 < q ≤ 1), locate the first bin whose cumulative count reaches
    * t = q·n and interpolate linearly inside it —
    * q_value = lo + width·(bin + (t − cum_before)/cnt). Emits one row per
    * (group, q) with columns `q`, `q_value`. The window runs over the
    * state (≤ nBins rows per group), not the data.
    */
  def histQuantile(
      parts: DataFrame,
      keys: Seq[String],
      qs: Seq[Double],
      lo: Double,
      width: Double): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"qs must be in (0, 1]: $qs")
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(keys.map(col): _*).orderBy(col("bin"))
    val wAll = Window.partitionBy(keys.map(col): _*)
    val t = col("q") * col("n").cast("double")
    parts
      .withColumn("cum", sum(col("cnt")).over(wOrd))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .filter(col("cum").cast("double") >= t && (col("cum") - col("cnt")).cast("double") < t)
      .withColumn(
        "q_value",
        lit(lo) + lit(width) * (col("bin").cast("double") +
          (t - (col("cum") - col("cnt")).cast("double")) / col("cnt").cast("double")))
      .select((keys.map(col) :+ col("q") :+ col("q_value")): _*)
  }
}
