package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EncodersSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq("lift", "nothing", "pull", "lift").toDF("action")

  test("fitLabelIndex assigns 0-based codes in sorted label order (sklearn semantics)") {
    val idx = Encoders.fitLabelIndex(df, "action")
      .as[(String, Long)].collect().toMap
    assert(idx == Map("lift" -> 0L, "nothing" -> 1L, "pull" -> 2L))
  }

  test("encode/decode roundtrip restores the labels") {
    val idx = Encoders.fitLabelIndex(df, "action")
    val enc = Encoders.encode(df, idx, "action", "code")
    val dec = Encoders.decode(enc.drop("action"), idx, "code", "action_back")
    assert(dec.select("action_back").as[String].collect().sorted.toSeq ==
      Seq("lift", "lift", "nothing", "pull"))
  }

  test("oneHot emits a 0/1 column per label, dropLast=false") {
    val oh = Encoders.oneHot(df, "action", Seq("lift", "nothing", "pull"), "oh")
    val rows = oh.select("action", "oh_lift", "oh_nothing", "oh_pull")
      .as[(String, Int, Int, Int)].collect().toSet
    assert(rows == Set(
      ("lift", 1, 0, 0), ("nothing", 0, 1, 0), ("pull", 0, 0, 1)))
  }
}
