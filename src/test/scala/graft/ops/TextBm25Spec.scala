package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextBm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark spark runs fast"),
    (2L, "spark runs on a cluster today"),
    (3L, "ducks swim on the pond"),
    (4L, "the pond is calm and still today")
  ).toDF("doc_id", "text")

  test("bm25: tf monotonicity, absent terms score exactly zero") {
    val scores = Text.bm25(docs, "doc_id", "text", Seq("spark"))
      .select("doc_id", "bm25_score").as[(Long, Double)].collect().toMap
    // doc 1 has tf=3 vs doc 2 tf=1 and is shorter: strictly higher score
    assert(scores(1L) > scores(2L))
    assert(scores(2L) > 0.0)
    // no occurrence -> tf=0 -> contribution is an exact 0.0
    assert(scores(3L) == 0.0 && scores(4L) == 0.0)
  }

  test("bm25: multi-term score is the fixed-order sum of single-term scores") {
    val both = Text.bm25(docs, "doc_id", "text", Seq("spark", "pond"))
      .select("doc_id", "bm25_score").as[(Long, Double)].collect().toMap
    val s1 = Text.bm25(docs, "doc_id", "text", Seq("spark"))
      .select("doc_id", "bm25_score").as[(Long, Double)].collect().toMap
    val s2 = Text.bm25(docs, "doc_id", "text", Seq("pond"))
      .select("doc_id", "bm25_score").as[(Long, Double)].collect().toMap
    docs.select("doc_id").as[Long].collect().foreach { id =>
      assert(both(id) == s1(id) + s2(id), s"doc $id")
    }
  }

  test("MathLn matches java.lang.Math.log (not StrictMath) and is null-safe") {
    val xs = Seq(Some(1.2975), Some(0.5), Some(1.0), None).toDF("x")
    val out = xs.select(graft.functions.MathLn(col("x")).as("l"))
      .as[Option[Double]].collect().toSeq
    assert(out(0).contains(java.lang.Math.log(1.2975)))
    assert(out(1).contains(java.lang.Math.log(0.5)))
    assert(out(2).contains(0.0))
    assert(out(3).isEmpty)
    // the reason this expression exists: StrictMath disagrees on some inputs
    val diverging = (380 to 410).map(df => (500.0 - df + 0.5) / (df + 0.5) + 1.0)
      .filter(x => java.lang.Math.log(x) != StrictMath.log(x))
    assert(diverging.nonEmpty)
    val viaExpr = diverging.toDF("x")
      .select(graft.functions.MathLn(col("x"))).as[Double].collect()
    assert(viaExpr.toSeq == diverging.map(java.lang.Math.log))
  }

  test("redact: sequential rules, pre-replacement counts, word boundaries") {
    val pii = Seq(
      (1L, "mail bob@corp.io and alice@x.dev about the spark job"),
      (2L, "no addresses here just spark sparkle"),
      (3L, "spark")
    ).toDF("doc_id", "text")
    val out = Text.redact(
      pii, "doc_id", "text",
      Seq("\\bspark\\b" -> "[TOOL]",
          "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}" -> "[EMAIL]"))
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // \b keeps "sparkle" intact; counts sum across rules on the ORIGINAL text
    assert(out(1L) == ((3L, "mail [EMAIL] and [EMAIL] about the [TOOL] job")))
    assert(out(2L) == ((1L, "no addresses here just [TOOL] sparkle")))
    assert(out(3L) == ((1L, "[TOOL]")))
  }

  test("redact: a replacement string cannot inflate a later rule's count") {
    val df = Seq((1L, "aa")).toDF("doc_id", "text")
    // rule 1 rewrites to text that rule 2 WOULD match; count stays at the
    // original text's matches (aa -> 1 for rule1, 0 for rule2)
    val out = Text.redact(df, "doc_id", "text", Seq("aa" -> "bb", "bb" -> "cc"))
      .as[(Long, Long, String)].collect().head
    assert(out == ((1L, 1L, "cc")))
  }

  test("zipfFit: closed-form OLS over exact (rank, count) pairs, ties ranked by token") {
    // counts: a=4, b=2, c=2, d=1 → ranks a=1, b=2, c=3 (tie broken by
    // token asc), d=4
    val df = Seq((1L, "a a a a b b"), (2L, "c c d")).toDF("doc_id", "text")
    val out = Text.zipfFit(df, "text")
      .select("n_types", "zipf_slope", "zipf_intercept")
      .as[(Long, Double, Double)].head()
    val pts = Seq((1L, 4L), (2L, 2L), (3L, 2L), (4L, 1L))
      .map { case (r, c) => (math.log(r.toDouble), math.log(c.toDouble)) }
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val (sxy, sxx) = (pts.map(p => p._1 * p._2).sum, pts.map(p => p._1 * p._1).sum)
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    assert(out._1 == 4L)
    // trunc-9 quantization bounds the sum error at 4e-9; 1e-6 is 250x margin
    assert(math.abs(out._2 - slope) < 1e-6)
    assert(math.abs(out._3 - icept) < 1e-6)
  }
}
