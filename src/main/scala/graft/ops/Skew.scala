package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation: salted two-phase aggregation for hot keys. Phase 1
  * aggregates per (keys, salt) — spreading one hot key over `saltBuckets`
  * reducers — phase 2 combines the partials. Exact-decimal sums make the
  * result independent of the salt split, so the salted plan is
  * bit-identical to the direct groupBy (and to the DuckDB oracle).
  *
  * Spark's AQE skew handling covers joins; this is the aggregation-side
  * tool for when one key carries a disproportionate share of rows.
  */
object Skew {

  /** count/mean/min/max of `valueCol` per `keys`, salted. The salt is
    * derived from the value column hash — deterministic, uniform, and
    * independent of row order.
    */
  def saltedStats(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(saltBuckets.toLong)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(
        count(col(valueCol)).as("__n"),
        sum(col(valueCol).cast(Exact.SumType)).as("__s"),
        min(col(valueCol)).as("__min"),
        max(col(valueCol)).as("__max"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__n")).as("n"),
        (sum(col("__s")).cast("double") / sum(col("__n"))).as("mean_value"),
        min(col("__min")).as("min_value"),
        max(col("__max")).as("max_value"))
  }

  /** Salted equi-join for a skewed BIG side: the big side gets a
    * deterministic per-row salt (hash of `spreadCol` — any well-distributed
    * payload column), the small side is replicated `saltBuckets`× with
    * every salt value, and the join runs on (key, salt) — a key carrying
    * 30% of the corpus now lands on `saltBuckets` reducers instead of one.
    * The salt never reaches the output, so the result is EXACTLY the plain
    * join's (and the oracle's).
    *
    * This is the manual form of what AQE skew-join does adaptively; use it
    * when the skew is known ahead of time (Zipf keys in training data) or
    * the join sits under an aggregation where AQE's split doesn't reach.
    * Cost: small side inflates `saltBuckets`× — keep it for genuinely
    * small dimension sides.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      spreadCol: String,
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val saltedBig = big.withColumn(
      "__salt", pmod(xxhash64(col(spreadCol)), lit(saltBuckets.toLong)))
    val replicated = small
      .withColumn("__salt", explode(lit((0L until saltBuckets.toLong).toArray)))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Key-skew AUDIT — the measurement that decides whether [[saltedJoin]] /
    * [[saltedStats]] / AQE skew handling are needed at all: per `groupCol`,
    * the distribution of per-`keyCol` row counts summarized as the key
    * count, total rows, the hottest key's rows and per-million share, and
    * the Gini coefficient of the count distribution (0 = perfectly even,
    * → 1 = one key owns everything). Run it on the join/groupBy key of a
    * new feed before picking a partitioning — at 100 TB a 0.9-Gini key is
    * the difference between a 10-minute and a 10-hour stage.
    *
    * Shape: one map-side-combined groupBy collapses the corpus to the
    * (group, key) count table; the rank the Gini needs rides
    * [[Windows.chunkedScan]] chunked on the count value itself
    * (non-decreasing along the (count, key) order by construction), so a
    * group with millions of keys never funnels through one task.
    *
    * Determinism: counts and ranks are BIGINT; the rank-weighted sum
    * Σᵢ i·xᵢ and the n·Σx denominator are accumulated as DECIMAL(38,0) —
    * their true bound is n_keys·n_rows (the hottest key at rank n
    * contributes n·W), which a 100 TB feed with ~10⁷ keys over ~10¹²
    * rows pushes past 2⁶³, exactly the hot-key regime this audit exists
    * to flag; a BIGINT accumulator would wrap silently into a garbage
    * (possibly negative) Gini. The decimals hold n_keys·n_rows < 10³⁸
    * exactly and convert to double only for the ONE closing division; at
    * oracle-checked magnitudes (< 2⁵³) that conversion is the identical
    * exact int→double in both engines. Gini = (2·Σᵢ i·xᵢ − (n+1)·Σxᵢ) /
    * (n·Σxᵢ) with x sorted ascending, i the 1-based rank.
    */
  def keySkewAudit(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val cnts = df.groupBy(col(groupCol), col(keyCol)).agg(count(lit(1)).as("__c"))
    val ranked = Windows.chunkedScan(
      cnts,
      keys = Seq(groupCol),
      orderCols = Seq(col("__c"), col(keyCol)),
      deltaCol = "__c",
      chunk = col("__c"),
      idxOut = "__i",
      cntOut = "__nk",
      totOut = "__nr")
    ranked
      .groupBy(col(groupCol))
      .agg(
        max(col("__nk")).as("n_keys"),
        max(col("__nr")).as("n_rows"),
        max(col("__c")).as("max_key_rows"),
        sum(col("__i").cast(dec38) * col("__c")).as("__siw"))
      .withColumn("top_share_ppm", expr("(1000000 * max_key_rows) DIV n_rows"))
      .withColumn("gini",
        (lit(2L).cast(dec38) * col("__siw")
          - (col("n_keys") + 1L).cast(dec38) * col("n_rows").cast(dec38)).cast("double") /
          (col("n_keys").cast(dec38) * col("n_rows").cast(dec38)).cast("double"))
      .select(groupCol, "n_keys", "n_rows", "max_key_rows", "top_share_ppm", "gini")
  }
}
