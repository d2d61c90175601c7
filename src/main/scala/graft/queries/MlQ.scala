package graft.queries

import org.apache.spark.sql.functions._
import graft.ml.{Encoders, Ensemble, Impute}

/** ML operator queries (SURVEY §2.7). Encode/decode/one-hot are pure SQL
  * and oracle-checked; the MLlib fits (M5 imputation, M6-M9 ensemble+vote)
  * have no SQL equivalent — registered without oracle, so the driver
  * records the weaker rows-only check.
  */
object MlQ {
  import Q._

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  val defs: Seq[QDef] = Seq(
    QDef(
      "m2_label_decode",
      // encode → decode roundtrip over the fitted label index
      (s, d) => {
        val idx = Encoders.fitLabelIndex(events(s, d), "event_type")
        Encoders.decode(idx, idx, "code", "decoded")
          .select("event_type", "code", "decoded")
      },
      Some("""SELECT event_type, CAST(dense_rank() OVER (ORDER BY event_type) - 1 AS BIGINT) AS code,
              event_type AS decoded
              FROM (SELECT DISTINCT event_type FROM events)""")),

    QDef(
      "m3_onehot",
      (s, d) =>
        Encoders.oneHot(events(s, d), "event_type", eventTypes, "oh")
          .select(col("event_id") +: eventTypes.map(t => col(s"oh_$t")): _*),
      Some {
        val cases = eventTypes
          .map(t => s"CASE WHEN event_type = '$t' THEN 1 ELSE 0 END AS oh_$t")
          .mkString(", ")
        s"SELECT event_id, $cases FROM events"
      }),

    QDef(
      "m5_impute_linreg",
      // "broken channel" repair: dim 1 of every 5th vector is predicted
      // from dims 2..8 via LinearRegression fit on the healthy rows
      (s, d) => {
        val e = t(s, d, "embeddings").select(
          col("vec_id") +:
            (1 to 8).map(i => element_at(col("embedding"), i).cast("double").as(s"e_$i")): _*)
        val repaired = Impute.linearRepair(
          e.withColumn("e_1_orig", col("e_1")),
          "e_1",
          (2 to 8).map(i => s"e_$i"),
          trainFilter = col("vec_id") % 5 =!= 0,
          fixPredicate = col("vec_id") % 5 === 0)
        repaired.select("vec_id", "e_1_orig", "e_1")
      },
      None),

    QDef(
      "m6_ensemble_vote",
      // seeded randomized-param RF ensemble + majority vote on the
      // embeddings classification task (labels 0..9)
      (s, d) => {
        val e = t(s, d, "embeddings").select(
          col("vec_id") +: col("label").cast("double").as("label") +:
            (1 to 16).map(i => element_at(col("embedding"), i).cast("double").as(s"f_$i")): _*)
        val train = e.filter(col("vec_id") % 4 =!= 0)
        Ensemble.fitPredictVote(
          train, e, (1 to 16).map(i => s"f_$i"), "label", nModels = 3, outCol = "pred_vote")
          .select(col("vec_id"), col("label").cast("int").as("label"), col("pred_vote"))
      },
      None)
  )
}
