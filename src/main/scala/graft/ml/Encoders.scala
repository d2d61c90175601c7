package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Label encode / decode / one-hot (SURVEY §2.7 M1-M3) as pure DataFrame
  * transforms: the fitted "model" is a tiny distinct-labels frame that
  * broadcasts everywhere (the Spark analog of sklearn's fitted
  * LabelEncoder/LabelBinarizer at `/root/reference/load_data.py:25-28`,
  * `/root/reference/generate_submission.py:163-168`).
  *
  * Codes are assigned by sorted label order — exactly sklearn's
  * LabelEncoder semantics — via dense_rank over the distinct set, so the
  * mapping is deterministic and oracle-checkable. MLlib's StringIndexer
  * (frequency order) is deliberately not used for parity-sensitive paths.
  */
object Encoders {

  /** Fit: distinct labels → (label, code) with codes 0..n-1 in sort order. */
  def fitLabelIndex(df: DataFrame, labelCol: String): DataFrame =
    df.select(col(labelCol)).distinct()
      .withColumn("code", (dense_rank().over(Window.orderBy(col(labelCol))) - 1).cast("long"))

  /** M1 transform: add `outCol` integer codes via broadcast join. */
  def encode(df: DataFrame, index: DataFrame, labelCol: String, outCol: String): DataFrame =
    df.join(broadcast(index.withColumnRenamed("code", outCol)), Seq(labelCol), "left")

  /** M2 inverse transform: codes back to labels. */
  def decode(df: DataFrame, index: DataFrame, codeCol: String, outCol: String): DataFrame =
    df.join(
      broadcast(index
        .withColumnRenamed("code", codeCol)
        .withColumnRenamed(index.columns.head, outCol)),
      Seq(codeCol),
      "left")

  /** M3: one-hot columns `<prefix>_<label>` (0/1 ints), one per distinct
    * label in `labels` — LabelBinarizer with dropLast=false. The label set
    * is a compile-time/collected list so the projection is static.
    */
  def oneHot(df: DataFrame, labelCol: String, labels: Seq[String], prefix: String): DataFrame =
    labels.foldLeft(df) { (d, l) =>
      d.withColumn(s"${prefix}_$l", when(col(labelCol) === l, 1).otherwise(0))
    }
}
