package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** M5: linear-regression channel repair — the reference fits a
  * LinearRegression predicting a broken sensor channel from the healthy
  * ones and overwrites it in place for the affected subjects
  * (`/root/reference/generate_submission.py:171-234` ch4,
  * `:237-302` ch0; the reference's loop bug at `:285` is not replicated —
  * the fix-subject set is an explicit parameter, SURVEY §7.4).
  *
  * Spark-first: fit on the healthy rows (MLlib normal-equation solver,
  * deterministic), then a single `when(fixPredicate, prediction)
  * .otherwise(original)` projection — immutable derived DataFrame instead
  * of the reference's in-place dict mutation.
  */
object Impute {

  /** Fit target ~ features on `trainFilter` rows; overwrite `targetCol`
    * with the model prediction on rows matching `fixPredicate`.
    */
  def linearRepair(
      df: DataFrame,
      targetCol: String,
      featureCols: Seq[String],
      trainFilter: Column,
      fixPredicate: Column): DataFrame = {
    val asm = new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("__features")
    val train = asm.transform(df.filter(trainFilter))
    val model = new LinearRegression()
      .setFeaturesCol("__features")
      .setLabelCol(targetCol)
      .setPredictionCol("__pred")
      .setSolver("normal")
      .fit(train)
    val scored = model.transform(asm.transform(df))
    scored
      .withColumn(targetCol, when(fixPredicate, col("__pred")).otherwise(col(targetCol)))
      .drop("__features", "__pred")
  }

  /** Single-feature OLS channel repair — the SQL-expressible flavor of
    * [[linearRepair]]: closed-form slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²)
    * and intercept = (Σy − slope·Σx)/n, with every Σ an EXACT scale-9
    * decimal sum (order-independent, so results don't depend on partition
    * count and a DuckDB oracle replicates them bit-for-bit; scale 9 per the
    * engine's float rules — feature/target magnitudes ≲ 1e2 keep the
    * quantization point well inside the double repr). The slope/intercept
    * combination and the per-row prediction slope·x + intercept are the
    * same left-associated IEEE double expressions in both engines.
    *
    * Scale shape: one aggregation pass over the train rows (map-side
    * combined), then a broadcast of the single stats row — the fit never
    * shuffles the corpus, and the repair is a pure projection.
    */
  def ols1Repair(
      df: DataFrame,
      targetCol: String,
      featureCol: String,
      trainFilter: Column,
      fixPredicate: Column): DataFrame = {
    val acc = DecimalType(38, 9)
    val x = col(featureCol).cast("double")
    val y = col(targetCol).cast("double")
    val stats = df.filter(trainFilter).agg(
      count(lit(1)).cast("double").as("__n"),
      sum(x.cast(acc)).cast("double").as("__sx"),
      sum(y.cast(acc)).cast("double").as("__sy"),
      sum((x * y).cast(acc)).cast("double").as("__sxy"),
      sum((x * x).cast(acc)).cast("double").as("__sxx"))
    df.crossJoin(broadcast(stats))
      .withColumn(
        "__slope",
        (col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
          (col("__n") * col("__sxx") - col("__sx") * col("__sx")))
      .withColumn("__icept", (col("__sy") - col("__slope") * col("__sx")) / col("__n"))
      .withColumn(targetCol, when(fixPredicate, col("__slope") * x + col("__icept")).otherwise(y))
      .drop("__n", "__sx", "__sy", "__sxy", "__sxx", "__slope", "__icept")
  }
}
