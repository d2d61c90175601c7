package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series windowing (SURVEY §2.5, W1-W4, W7).
  *
  * The reference's core competency: tumbling 200 ms bucketing
  * (`/root/reference/load_data.py:122-123`), strided row windows
  * (`/root/reference/utils.py:10-16`), cumsum moving average
  * (`/root/reference/utils.py:4-7`), windowed downsampling
  * (`/root/reference/utils.py:19-35`), and multi-horizon lookback/lookahead
  * feature windows (`/root/reference/generate_submission.py:344-366`).
  *
  * Spark-first: all of these are window-frame or groupBy expressions —
  * incremental per partition, shuffled once on the partition keys, no
  * materialized per-window matrices. At scale the single shuffle on
  * (entity, bucket) replaces the reference's driver-resident dict-of-ndarrays.
  */
object Windows {

  /** W1: tumbling bucket id in integer milliseconds:
    * `bucket = floor(ts_ms / step) * step` — the exact arithmetic of
    * ref `load_data.py:122-123` (`int(x*1000) // step * step`), kept in
    * LongType to avoid float keys.
    */
  def tumbleMs(tsMs: Column, stepMs: Long): Column =
    tsMs - pmod(tsMs, lit(stepMs)) // pure integer arithmetic: no double-division rounding

  /** W1 on a TimestampType column, in ms since epoch. */
  def tumbleTs(ts: Column, stepMs: Long): Column =
    tumbleMs(unix_millis(ts), stepMs)

  /** W2: strided (tumbling over row index) window id: rows are numbered in
    * `order` within `parts`, then chunked `winSize` at a time
    * (ref `utils.py:10-16` with shift == win_size, the only configuration the
    * pipeline uses — `generate_submission.py:374,467`).
    */
  def stridedWindowId(
      df: DataFrame,
      parts: Seq[String],
      order: Seq[Column],
      winSize: Int,
      idCol: String = "win_id"): DataFrame = {
    val w = Window.partitionBy(parts.map(col): _*).orderBy(order: _*)
    val rn0 = row_number().over(w) - 1
    df.withColumn(idCol, ((rn0 - pmod(rn0, lit(winSize))) / winSize).cast("long"))
  }

  /** W3: length-n moving average per key, trailing frame [-(n-1), 0]
    * (ref `utils.py:4-7`). Exact decimal accumulation (see [[Exact]]) so the
    * result is independent of evaluation order.
    */
  def movingAvg(
      df: DataFrame,
      parts: Seq[String],
      order: Seq[Column],
      valueCol: String,
      n: Int,
      outCol: String = "moving_avg"): DataFrame = {
    val w = Window
      .partitionBy(parts.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(-(n - 1), 0)
    val s = sum(col(valueCol).cast(Exact.SumType)).over(w).cast("double")
    val c = count(col(valueCol)).over(w)
    df.withColumn(outCol, s / c)
  }

  /** W4: downsample-by-window aggregation, the four kernels of
    * ref `utils.py:19-35`: mean / abs_mean / abs_max / abs_max_orig
    * (signed value with max |value|).
    */
  def downsampleAgg(method: String, c: Column): Column = method match {
    case "mean"         => Exact.dmean(c)
    case "abs_mean"     => Exact.dmean(abs(c))
    case "abs_max"      => max(abs(c))
    case "abs_max_orig" => Stats.signedAbsMax(c)
    case other          => throw new IllegalArgumentException(s"unknown downsampling method $other")
  }

  /** W4: bucket a series and aggregate each bucket with one of the reference
    * kernels, one output row per (parts, bucket).
    */
  def downsample(
      df: DataFrame,
      parts: Seq[String],
      tsMsCol: String,
      valueCol: String,
      stepMs: Long,
      method: String,
      outCol: String = "ds_value"): DataFrame = {
    val bucketed = df.withColumn("bucket", tumbleMs(col(tsMsCol), stepMs))
    bucketed
      .groupBy((parts :+ "bucket").map(col): _*)
      .agg(downsampleAgg(method, col(valueCol)).as(outCol))
  }

  /** W7: multi-horizon lookback/lookahead stats. For each row (window end)
    * and each horizon h (ms), aggregates `valueCol` over the trailing range
    * frame [-h, -1] and the leading range frame [0, h-1] — the 8 mocap
    * feature blocks of ref `generate_submission.py:344-366,437-459`.
    * Emits columns `<stat>_back_<h>` / `<stat>_fwd_<h>`.
    *
    * rangeBetween on the ms column avoids the reference's bucket-walking
    * range fetch (`utils.py:56-76`) and any join: one shuffle on `parts`,
    * then incremental frame evaluation.
    */
  def horizonStats(
      df: DataFrame,
      parts: Seq[String],
      tsMsCol: String,
      valueCol: String,
      horizonsMs: Seq[Long],
      prefix: String = ""): DataFrame = {
    val base = Window
      .partitionBy(parts.map(col): _*)
      .orderBy(col(tsMsCol))
    val v = col(valueCol)
    val p = if (prefix.isEmpty) "" else s"${prefix}_"
    horizonsMs.foldLeft(df) { (d, h) =>
      val back = base.rangeBetween(-h, -1)
      val fwd = base.rangeBetween(0, h - 1)
      d.withColumn(s"${p}mean_back_$h", sum(v.cast(Exact.SumType)).over(back).cast("double") / count(v).over(back))
        .withColumn(s"${p}min_back_$h", min(v).over(back))
        .withColumn(s"${p}max_back_$h", max(v).over(back))
        .withColumn(s"${p}mean_fwd_$h", sum(v.cast(Exact.SumType)).over(fwd).cast("double") / count(v).over(fwd))
        .withColumn(s"${p}min_fwd_$h", min(v).over(fwd))
        .withColumn(s"${p}max_fwd_$h", max(v).over(fwd))
    }
  }

  /** W6: up-sample by repeating each row `factor` times with a 0-based
    * `rep_idx` column (ref label repeat ×120,
    * `generate_submission.py:179-180`).
    */
  def upsampleRepeat(df: DataFrame, factor: Int, idxCol: String = "rep_idx"): DataFrame =
    df.withColumn(idxCol, explode(sequence(lit(0), lit(factor - 1))))
}
