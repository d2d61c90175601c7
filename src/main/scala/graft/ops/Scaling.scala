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
    * and the result is deterministic without a tiebreak — `rank()` is
    * tie-stable in both engines and the division is one double op.
    *
    * Scale shape: one shuffle on the group keys, one ordered window pass.
    * Unlike the fitted scalers above there is no stats row to broadcast —
    * the "fit" IS the ranking.
    */
  def rankNormalize(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      outCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(valueCol))
    df.withColumn(outCol, percent_rank().over(w))
  }
}
