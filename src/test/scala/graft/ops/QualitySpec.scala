package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deequ-style constraint suite (ops/Quality) + PMI collocation mining
  * (Text.pmiCollocations) — round-8 additions.
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def report(rows: Seq[(Option[Long], Long, Double, String)]) = {
    val df = rows.toDF("fk", "id", "price", "status")
    val parent = Seq(10L, 20L).toDF("pk")
    Quality.validate(
      df,
      Seq(
        Quality.Check("complete_fk", Quality.failing(col("fk").isNotNull)),
        Quality.Check("range_price", Quality.failing(col("price") > 0 && col("price") <= 100.0)),
        Quality.Check("domain_status", Quality.failing(col("status").isin("A", "B")))),
      Some(("unique_id", "id")),
      "fk", parent, "pk", "ref_fk")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("Quality.validate: clean batch passes every constraint") {
    val r = report(Seq(
      (Some(10L), 1L, 5.0, "A"),
      (Some(20L), 2L, 99.5, "B")))
    assert(r.size == 5)
    assert(r.values.forall { case (v, total, passed) => v == 0L && total == 2L && passed })
  }

  test("Quality.validate: each violation kind is counted and fails exactly its constraint") {
    val r = report(Seq(
      (Some(10L), 1L, 5.0, "A"),   // clean
      (None, 2L, 5.0, "A"),        // null fk (completeness; anti-join drops nulls? no: null fk is NOT in parent → also RI)
      (Some(10L), 2L, 5.0, "A"),   // duplicate id
      (Some(20L), 3L, -1.0, "A"),  // out of range
      (Some(10L), 4L, 5.0, "Z"),   // bad domain
      (Some(99L), 5L, 5.0, "B")))  // orphan fk
    assert(r("complete_fk") == ((1L, 6L, false)))
    assert(r("unique_id") == ((1L, 6L, false)))
    assert(r("range_price") == ((1L, 6L, false)))
    assert(r("domain_status") == ((1L, 6L, false)))
    // left_anti with null-unsafe equality keeps the null-fk row too: a null
    // child key can never match a parent key, so it counts as an RI orphan
    // alongside the genuinely unknown 99L
    assert(r("ref_fk") == ((2L, 6L, false)))
  }

  test("Quality.validate: report is a single row per constraint, schema fixed") {
    val out = Quality.validate(
      Seq((Some(1L), 1L)).toDF("fk", "id"),
      Seq(Quality.Check("complete_fk", Quality.failing(col("fk").isNotNull))),
      None,
      "fk", Seq(1L).toDF("pk"), "pk", "ref_fk")
    assert(out.columns.toSeq == Seq("constraint", "violations", "total", "passed"))
    assert(out.count() == 2)
  }

  test("Text.pmiCollocations: always-paired tokens score high, independent pairs near zero") {
    // corpus: "x y" always adjacent (perfect collocation), fillers a/b vary
    val docs = (1 to 40).map(i => (i.toLong, s"x y a b ${if (i % 2 == 0) "a" else "b"} c")).toDF("doc_id", "text")
    val out = Text.pmiCollocations(docs, "text", minCount = 5, k = 50)
      .select("w1", "w2", "pmi").as[(String, String, Double)].collect()
    val byPair = out.map(r => (r._1, r._2) -> r._3).toMap
    // x is always followed by y: joint prob = unigram prob, so
    // pmi = ln(cxy/Nb) - ln(cx/Nu) - ln(cy/Nu) with cxy=cx=cy=40 — strictly
    // positive and the top pair
    assert(byPair.contains(("x", "y")))
    assert(byPair(("x", "y")) > 1.0)
    assert(out.head._1 == "x" && out.head._2 == "y")
    // counts floor: every emitted pair has joint count >= 5 (no singleton noise)
    val cnts = Text.pmiCollocations(docs, "text", 5, 50)
      .select("c_xy").as[Long].collect()
    assert(cnts.forall(_ >= 5L))
  }

  test("Text.pmiCollocations: deterministic top-k under reshuffling, total tiebreak order") {
    val docs = (1 to 30).map(i => (i.toLong, "p q p q r s")).toDF("doc_id", "text")
    val a = Text.pmiCollocations(docs, "text", 2, 10).collect().toSeq
    val b = Text.pmiCollocations(docs.repartition(7), "text", 2, 10).collect().toSeq
    assert(a == b)
    // ties (identical counts => identical pmi) are ordered by (w1, w2)
    val pmis = a.map(r => (r.getAs[Double]("pmi"), r.getAs[String]("w1"), r.getAs[String]("w2")))
    assert(pmis == pmis.sortBy { case (p, w1, w2) => (-p, w1, w2) })
  }
}
