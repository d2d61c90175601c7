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
}
