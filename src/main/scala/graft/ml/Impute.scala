package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
