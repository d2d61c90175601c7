package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops._
import graft.ml.{Encoders, Ensemble, Impute}

/** End-to-end composition mirroring the reference pipeline
  * (`/root/reference/generate_submission.py:133-569`, SURVEY §3.1) over
  * FIXTURES.md §A-shaped inputs: label intervals + per-trial EMG + mocap →
  * 200 ms windowed features → seeded ensemble → vote → decode → RLE →
  * submission segments.
  *
  * Everything is one lazy plan per stage; the per-file Python loops become
  * partitioning by (subject, trial). Shuffle boundaries: the window bucket
  * groupBy, the features⋈targets join, the horizon window functions, and
  * the MLlib fits — exactly the reference's semantic boundaries.
  */
object Bbdc {
  val StepMs = 200L

  /** Stage 2 (load_targets, `load_data.py:13-53`): parse the headerless
    * label table (key, start_s, end_s, action), derive subject/trial/arm,
    * and smear intervals onto the 200 ms grid with the reference's running
    * cursor: window w gets the action of the first interval (by start)
    * whose floor(end*1000/step)*step is ≥ w, starting after the previous
    * interval's last grid point (`load_data.py:34-42`).
    *
    * DELIBERATE boundary divergence from the reference: its cursor loop
    * (`while win_end < end * 1000`) tests the strict inequality on the
    * FLOAT product `end * 1000`, so an interval whose end lands exactly on
    * a grid point cedes that window to the NEXT interval iff the float
    * product is exactly representable — behavior that flips with the 15th
    * decimal digit of the input. This implementation uses the inclusive
    * integer grid end (floor(end_ms / step) · step, end_ms truncated from
    * the scaled double), which assigns the boundary window to the EARLIER
    * interval deterministically. Cleanup, not replication: the reference's
    * own result depends on float representation; ours is a pure function
    * of the millisecond integers.
    */
  def targetsToGrid(labels: DataFrame): DataFrame = {
    val parsed = labels.select(
      substring(col("key"), 1, 3).as("subject"),
      substring(col("key"), 4, 3).as("trial"),
      element_at(split(col("key"), "\\."), 2).as("arm"),
      (col("start_s") * 1000).cast("long").as("start_ms"),
      (col("end_s") * 1000).cast("long").as("end_ms"),
      col("action"))
    val w = Window.partitionBy("subject", "trial", "arm").orderBy("start_ms")
    val gridEnd = (col("end_ms") / StepMs).cast("long") * StepMs
    val prevEnd = coalesce(lag(gridEnd, 1).over(w), lit(0L))
    parsed
      .withColumn("__first", prevEnd + StepMs)
      .withColumn("__last", gridEnd)
      .withColumn(
        "window_ms",
        explode(
          when(col("__first") <= col("__last"),
            sequence(col("__first"), col("__last"), lit(StepMs)))
            .otherwise(array().cast("array<long>"))))
      .select("subject", "trial", "arm", "window_ms", "action")
  }

  /** Stages 3-4 (loaders, `load_data.py:56-134,137-229`): clean one sensor
    * table (ts_ms + value columns keyed by subject/trial): linear
    * interpolation of NULL runs then fill 0, per trial, ordered by ts.
    */
  def cleanSensors(df: DataFrame, valueCols: Seq[String]): DataFrame =
    Cleaning.interpolateThenZero(df, Seq("subject", "trial"), "ts_ms", valueCols)

  /** Mocap reference-frame subtraction (P7/P8, `load_data.py:202-212`):
    * subtract the reference sensor column per the map, skipping the
    * configured exceptions — a plan-time conditional projection.
    */
  def applyReferenceFrame(
      df: DataFrame,
      refMap: Map[String, String],
      skip: String => Boolean): DataFrame =
    refMap.foldLeft(df) { case (d, (sensor, ref)) =>
      if (skip(sensor) || !d.columns.contains(sensor) || !d.columns.contains(ref)) d
      else d.withColumn(sensor, col(sensor) - col(ref))
    }

  /** Stage on EMG (M5, `generate_submission.py:171-302`): repair a broken
    * channel for the affected subjects from the healthy channels.
    */
  def repairChannel(
      emg: DataFrame,
      broken: String,
      healthy: Seq[String],
      fixSubjects: Seq[String]): DataFrame =
    Impute.linearRepair(
      emg,
      broken,
      healthy,
      trainFilter = !col("subject").isin(fixSubjects: _*),
      fixPredicate = col("subject").isin(fixSubjects: _*))

  /** Stage 8 (feature build, `generate_submission.py:315-379`): per
    * (subject, trial, 200 ms window): EMG block = per-channel mean of
    * abs values (A7); mocap block = per-column mean/min/max over lookback
    * and lookahead horizons (W7). One shuffle on (subject, trial) for the
    * windows; horizon stats ride range frames on the bucketed series.
    */
  def buildFeatures(
      emg: DataFrame,
      emgChannels: Seq[String],
      mocap: DataFrame,
      mocapCols: Seq[String],
      horizonsMs: Seq[Long]): DataFrame = {
    val emgAggs = emgChannels.map(c => Exact.dmean(abs(col(c))).as(s"emg_absmean_$c"))
    val emgWin = emg
      .withColumn("window_ms", Windows.tumbleMs(col("ts_ms"), StepMs) + StepMs)
      .groupBy("subject", "trial", "window_ms")
      .agg(emgAggs.head, emgAggs.tail: _*)
    val moAggs = mocapCols.map(c => Exact.dmean(col(c)).as(c))
    val mocapWin = mocap
      .withColumn("window_ms", Windows.tumbleMs(col("ts_ms"), StepMs) + StepMs)
      .groupBy("subject", "trial", "window_ms")
      .agg(moAggs.head, moAggs.tail: _*)
    val withHorizons = mocapCols.foldLeft(mocapWin) { (d, c) =>
      Windows.horizonStats(d, Seq("subject", "trial"), "window_ms", c, horizonsMs, prefix = c)
    }
    emgWin.join(withHorizons, Seq("subject", "trial", "window_ms"), "inner")
      .na.fill(0.0)
  }

  /** Stages 10-12 (train/predict/vote/decode/RLE,
    * `generate_submission.py:478-569`) for one arm: join features to the
    * arm's targets (J1), fit the seeded ensemble on the train subjects,
    * vote, decode, RLE the predicted timeline into end-exclusive segments
    * in seconds (W9 semantics incl. the closing flush).
    */
  def trainPredictSegments(
      features: DataFrame,
      targets: DataFrame,
      arm: String,
      testSubject: String,
      nModels: Int): DataFrame = {
    val armTargets = targets.filter(col("arm") === arm)
    val idx = Encoders.fitLabelIndex(armTargets, "action")
    val joined = Encoders.encode(
      features.join(
        armTargets.select("subject", "trial", "window_ms", "action"),
        Seq("subject", "trial", "window_ms"),
        "inner"),
      idx, "action", "label")
      .withColumn("label", col("label").cast("double"))
    val featCols = features.columns.filterNot(Seq("subject", "trial", "window_ms").contains).toSeq
    val train = joined.filter(col("subject") =!= testSubject)
    val test = joined.filter(col("subject") === testSubject)
    val voted = Ensemble.fitPredictVote(
      train, test, featCols, "label", nModels, "pred_code")
    val decoded = Encoders.decode(
      voted.withColumn("pred_code", col("pred_code").cast("long")),
      idx, "pred_code", "pred_action")
    val rle = Segments.runLengthEncode(
      decoded.withColumn("key", concat(col("subject"), col("trial"), lit("."), lit(arm))),
      Seq("key"),
      "window_ms",
      "pred_action")
    rle.select(
      col("key"),
      (col("seg_start") / 1000.0).as("start_s"),
      (col("seg_end") / 1000.0).as("end_s"),
      col("pred_action").as("action"))
  }
}
