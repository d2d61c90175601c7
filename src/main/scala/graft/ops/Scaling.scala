package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scaler fit + transform (SURVEY §2.7, M4; fit = A10/A11 aggregations).
  *
  * The reference uses four sklearn scalers, fit per trial / globally /
  * per subject (`/root/reference/load_data.py:66-158`,
  * `/root/reference/generate_submission.py:304-313`):
  *   - standard:  (x - mean) / std         (std = population, sklearn ddof=0)
  *   - zero_mean: (x - mean)               (StandardScaler(with_std=False))
  *   - minmax:    (x - min) / (max - min)
  *   - robust:    (x - median) / (q_hi - q_lo)
  *
  * Spark-first: the fit is a plain aggregation (automatically partial +
  * final, the distributed generalization of `partial_fit`), the transform a
  * projection after joining the per-group stats back — a broadcast join,
  * since there is one stats row per group. Pure SQL on both engines (no
  * MLlib state), so the DuckDB oracle can replicate it bit-for-bit via
  * [[Exact]] decimal sums.
  */
object Scaling {

  /** Population stddev (sklearn StandardScaler uses ddof=0), exact-decimal
    * (sum-of-squares scale bound: see [[Exact.SqType]]).
    */
  private def dstddevPop(c: Column): Column = {
    val n = count(c).cast("double")
    val s = sum(c.cast(Exact.SumType)).cast("double")
    val s2 = sum((c * c).cast(Exact.SqType)).cast("double")
    when(n > 0, sqrt(greatest((s2 - s * s / n) / n, lit(0.0))))
  }

  /** Fit scaler stats per group; returns one row per group with
    * `__center` / `__scale` columns, then applies the affine transform to
    * `valueCol`, emitting `outCol`. `kind` ∈ standard | zero_mean | minmax |
    * robust. Robust quantiles use the exact interpolated formula of
    * [[Stats.exactQuantiles]].
    */
  def scale(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      kind: String,
      outCol: String,
      robustRange: (Double, Double) = (0.25, 0.75)): DataFrame = {
    val v = col(valueCol)
    val stats: DataFrame = kind match {
      case "standard" =>
        df.groupBy(keys.map(col): _*)
          .agg(Exact.dmean(v).as("__center"), dstddevPop(v).as("__scale"))
      case "zero_mean" =>
        df.groupBy(keys.map(col): _*)
          .agg(Exact.dmean(v).as("__center"), lit(1.0).as("__scale"))
      case "minmax" =>
        df.groupBy(keys.map(col): _*)
          .agg(min(v).as("__center"), (max(v) - min(v)).as("__scale"))
      case "robust" =>
        val (qlo, qhi) = robustRange
        val q = Stats.exactQuantiles(df, keys, valueCol, Seq(qlo, 0.5, qhi))
        q.groupBy(keys.map(col): _*)
          .agg(
            min(when(col("q") === 0.5, col("q_value"))).as("__center"),
            (min(when(col("q") === qhi, col("q_value"))) -
              min(when(col("q") === qlo, col("q_value")))).as("__scale"))
      case other => throw new IllegalArgumentException(s"unknown scaler kind $other")
    }
    val joined =
      if (keys.isEmpty) df.crossJoin(broadcast(stats))
      else df.join(broadcast(stats), keys)
    joined
      .withColumn(
        outCol,
        when(col("__scale") === 0.0 || col("__scale").isNull, v - col("__center"))
          .otherwise((v - col("__center")) / col("__scale")))
      .drop("__center", "__scale")
  }

  /** Percent-rank (ECDF) normalization per group — the QuantileTransformer-
    * style feature map to [0, 1]: out = (rank − 1)/(n − 1), ranked by the
    * raw value only, so TIED values share a quantile (sklearn semantics)
    * and the result is deterministic without a tiebreak.
    *
    * NOT a `percent_rank()` window over the raw rows: that plan sorts each
    * key's ENTIRE series inside one task, so parallelism is bounded by key
    * cardinality — with a handful of groups, one task sorts a fifth of the
    * corpus while the other cores idle (a straight scale-killer at 100 TB).
    * Instead the same two-phase shape as [[Stats.exactQuantiles]]:
    *
    *   1. `groupBy(keys, value) → count` — fully parallel partial+final
    *      aggregation; the output is one row per DISTINCT (key, value),
    *      which for quantized/bounded measures plateaus far below the row
    *      count (events at sf0.1: 18k distinct vs 100k rows, and the
    *      distinct universe stops growing with corpus size).
    *   2. One ordered window over that small distinct frame: cumulative
    *      count `cum`, group total `n`; rank of a value = cum − cnt + 1
    *      (ties share the min rank by construction — every tied row is in
    *      the same distinct-frame row), so out = (cum − cnt)/(n − 1), the
    *      exact integer pair `percent_rank` divides, cast and divided in
    *      the same IEEE order both engines use. n = 1 ⇒ 0.0, as
    *      `percent_rank` defines it.
    *   3. Equi-join back on (keys, value) — co-partitioned with phase 1's
    *      shuffle, null-safe on the value so a NULL group (groupBy keeps
    *      it, matching the window's NULLS FIRST rank) maps back to its rows.
    *
    * Output is bit-identical to the window formulation (rank is tie-stable,
    * the division is the same two longs); `m4_scale_rank` pins that against
    * the oracle's literal `percent_rank()`, and `ScalingSpec` pins it
    * in-engine.
    */
  def rankNormalize(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      outCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gcols = (keys :+ valueCol).map(col)
    val counts = df.groupBy(gcols: _*).agg(count(lit(1)).as("__cnt"))
    val wOrd = Window.partitionBy(keys.map(col): _*).orderBy(col(valueCol))
    val wAll = Window.partitionBy(keys.map(col): _*)
    val ranked = counts
      .withColumn("__cum", sum(col("__cnt")).over(wOrd))
      .withColumn("__n", sum(col("__cnt")).over(wAll))
      .withColumn(
        outCol,
        when(
          col("__n") > 1,
          (col("__cum") - col("__cnt")).cast("double") / (col("__n") - 1).cast("double"))
          .otherwise(lit(0.0)))
      .select((keys :+ valueCol).map(c => col(c).as(s"__r_$c")) :+ col(outCol): _*)
    val cond = (keys :+ valueCol).map(c => df(c) <=> col(s"__r_$c")).reduce(_ && _)
    df.join(ranked, cond).drop((keys :+ valueCol).map(c => s"__r_$c"): _*)
  }
}
