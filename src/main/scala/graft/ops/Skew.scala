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
}
