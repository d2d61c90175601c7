package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** The engine's core determinism claim: exact-decimal aggregation is
  * independent of partitioning (= of cluster size and shuffle layout).
  */
class ExactSpec extends SparkSpec {
  import spark.implicits._

  test("dsum/dmean are bit-identical across partition counts") {
    val rng = new Random(7)
    val vs = Seq.fill(5000)(rng.nextDouble() * 1000 - 500)
    def runWith(parts: Int): (Double, Double) = {
      val df = vs.map(("k", _)).toDF("k", "v").repartition(parts)
      df.groupBy("k")
        .agg(Exact.dsum(col("v")).as("s"), Exact.dmean(col("v")).as("m"))
        .as[(String, Double, Double)].head() match { case (_, s, m) => (s, m) }
    }
    val base = runWith(1)
    for (p <- Seq(2, 7, 32)) {
      val r = runWith(p)
      assert(
        java.lang.Double.doubleToRawLongBits(r._1) == java.lang.Double.doubleToRawLongBits(base._1) &&
          java.lang.Double.doubleToRawLongBits(r._2) == java.lang.Double.doubleToRawLongBits(base._2),
        s"partitions=$p diverged: $r vs $base")
    }
  }

  test("dsumTrunc4 is partition-invariant and tie-free where a rounding cast splits engines") {
    // 1/1024 = 0.0009765625 is a dyadic double that is an EXACT decimal
    // tie at scale 4 (0.00009765625·... -> odd/2^(s+1) family): a rounding
    // DECIMAL cast breaks it HALF_UP in Java vs half-even in DuckDB — the
    // divergence a17_corr hit at sf0.01. Truncation has no tie: floor of
    // the identical product double is identical everywhere.
    val tieVals = Seq(1.0 / 1024, 3.0 / 1024, -5.0 / 1024, 0.00005, -0.00015)
    val big = (1 to 500).map(i => 1e10 + i * 0.37 + 1.0 / 1024)
    val df = (tieVals ++ big).map(("k", _)).toDF("k", "v")
    val base = df.repartition(1).groupBy("k")
      .agg(Exact.dsumTrunc4(col("v")).as("s")).as[(String, Double)].head()._2
    for (p <- Seq(2, 7, 32)) {
      val r = df.repartition(p).groupBy("k")
        .agg(Exact.dsumTrunc4(col("v")).as("s")).as[(String, Double)].head()._2
      assert(java.lang.Double.doubleToRawLongBits(r)
        == java.lang.Double.doubleToRawLongBits(base), s"partitions=$p: $r vs $base")
    }
    // truncation semantics: sign·floor(|v|·10^4)/10^4 per row
    val one = Seq(("k", 1.0 / 1024)).toDF("k", "v")
      .groupBy("k").agg(Exact.dsumTrunc4(col("v")).as("s")).as[(String, Double)].head()._2
    assert(one == 0.0009) // floor(9.765625)/1e4 — truncated, not rounded to 0.001
    val neg = Seq(("k", -1.0 / 1024)).toDF("k", "v")
      .groupBy("k").agg(Exact.dsumTrunc4(col("v")).as("s")).as[(String, Double)].head()._2
    assert(neg == -0.0009) // truncation toward zero, symmetric
  }

  test("saltedStats matches the direct aggregation bit for bit") {
    val rng = new Random(11)
    val df = Seq.fill(4000)(("hot", rng.nextDouble() * 99)).toDF("k", "v")
    val direct = df.groupBy("k").agg(
      count(col("v")).as("n"),
      Exact.dmean(col("v")).as("mean_value"),
      min(col("v")).as("min_value"),
      max(col("v")).as("max_value"))
    val salted = Skew.saltedStats(df, Seq("k"), "v", 16)
    val d = direct.as[(String, Long, Double, Double, Double)].head()
    val s = salted.as[(String, Long, Double, Double, Double)].head()
    assert(d == s)
  }

  test("keySkewAudit: zero Gini on even keys, closed-form Gini on skew, repartition-stable") {
    // even group: 4 keys x 5 rows each -> gini exactly 0
    val even = (0 until 20).map(i => ("ev", (i % 4).toLong)).toDF("g", "k")
    // skewed group: keys with counts 1,1,1,1,16 -> sorted x=(1,1,1,1,16),
    // sum(i*x) = 1+2+3+4+80 = 90, n=5, W=20:
    // gini = (2*90 - 6*20)/(5*20) = 60/100 = 0.6
    val skew = ((0 until 4).map(i => ("sk", i.toLong)) ++
      Seq.fill(16)(("sk", 99L))).toDF("g", "k")
    val out = Skew.keySkewAudit(even.union(skew), "g", "k")
      .select("g", "n_keys", "n_rows", "max_key_rows", "top_share_ppm", "gini")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("ev") == (("ev", 4L, 20L, 5L, 250000L, 0.0)))
    assert(out("sk") == (("sk", 5L, 20L, 16L, 800000L, 0.6)))
    // chunked-scan rank must be partitioning-invariant
    val re = Skew.keySkewAudit(even.union(skew).repartition(7), "g", "k")
      .select("g", "n_keys", "n_rows", "max_key_rows", "top_share_ppm", "gini")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(re == out)
  }
}
