package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Missing-value handling (SURVEY §2.2, P9-P11).
  *
  * The one genuinely custom composite operator: linear interpolation of NULL
  * runs, the Spark equivalent of the reference's
  * `df.interpolate(method="linear", axis=0).fillna(0)`
  * (`/root/reference/load_data.py:95,171`). pandas semantics replicated
  * exactly (SURVEY §7.4):
  *   - interior NULL runs: linear between the surrounding known points;
  *   - trailing NULLs: forward-filled with the last known value;
  *   - leading NULLs: left NULL by interpolate, then the chained `.fillna(0)`
  *     turns them into 0 — exposed here as [[interpolateThenZero]].
  *
  * Implementation is pure window expressions (two frames per column), no
  * join, no UDF — one shuffle on the partition keys, incremental frames,
  * fully whole-stage-codegen'd. Scales to any series length because nothing
  * is collected per group.
  */
object Cleaning {

  /** P9: fill NULLs with a constant. */
  def fillConstant(df: DataFrame, cols: Seq[String], v: Double): DataFrame =
    df.na.fill(v, cols)

  /** P11: NaN and NULL → 0 (ref `np.nan_to_num`,
    * `generate_submission.py:36,373,466`).
    */
  def nanToZero(c: Column): Column = coalesce(nanvl(c, lit(0.0)), lit(0.0))

  /** P10: linear interpolation of NULL runs in `valueCols`, ordered by
    * `xCol` within `parts`. `xCol` is the interpolation abscissa: pass a
    * row-position column for pandas' index-linear semantics, or a timestamp
    * (ms) column for time-weighted interpolation.
    */
  def interpolateLinear(
      df: DataFrame,
      parts: Seq[String],
      xCol: String,
      valueCols: Seq[String]): DataFrame = {
    val back = Window
      .partitionBy(parts.map(col): _*)
      .orderBy(col(xCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val fwd = Window
      .partitionBy(parts.map(col): _*)
      .orderBy(col(xCol))
      .rowsBetween(0, Window.unboundedFollowing)
    valueCols.foldLeft(df) { (d, c) =>
      val v = col(c)
      val x = col(xCol).cast("double")
      val prevV = last(v, ignoreNulls = true).over(back)
      val prevX = last(when(v.isNotNull, x), ignoreNulls = true).over(back)
      val nextV = first(v, ignoreNulls = true).over(fwd)
      val nextX = first(when(v.isNotNull, x), ignoreNulls = true).over(fwd)
      val interp = when(v.isNotNull, v)
        .when(prevV.isNull, lit(null).cast("double")) // leading run: stays NULL
        .when(nextV.isNull, prevV) // trailing run: forward fill
        .otherwise(prevV + (nextV - prevV) * (x - prevX) / (nextX - prevX))
      d.withColumn(c, interp)
    }
  }

  /** The reference's exact chain: interpolate, then fill remaining (leading)
    * NULLs with 0 (ref `load_data.py:95`).
    */
  def interpolateThenZero(
      df: DataFrame,
      parts: Seq[String],
      xCol: String,
      valueCols: Seq[String]): DataFrame =
    fillConstant(interpolateLinear(df, parts, xCol, valueCols), valueCols, 0.0)
}
