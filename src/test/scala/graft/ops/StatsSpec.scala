package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("diffMean telescopes to mean of first differences") {
    // diffs of (1, 4, 9, 16) = (3, 5, 7) → mean 5 = (16-1)/3
    val df = Seq(("k", 1L, 1.0), ("k", 2L, 4.0), ("k", 3L, 9.0), ("k", 4L, 16.0))
      .toDF("k", "ts", "v")
    val out = df.groupBy("k").agg(Stats.diffMean(col("ts"), col("v")).as("d"))
      .select("d").as[Double].head()
    assert(out == 5.0)
  }

  test("diffMean is NULL for singleton groups") {
    val df = Seq(("k", 1L, 1.0)).toDF("k", "ts", "v")
    assert(df.groupBy("k").agg(Stats.diffMean(col("ts"), col("v")).as("d"))
      .filter(col("d").isNull).count() == 1)
  }

  test("boundarySumDiff: sum(last w) - sum(first w)") {
    val df = (1 to 6).map(i => ("k", i.toLong, i.toDouble)).toDF("k", "ts", "v")
    val ranked = Stats.withEndRanks(df, Seq("k"), Seq(col("ts")))
    val out = ranked.groupBy("k")
      .agg(Stats.boundarySumDiff(col("v"), col("rn_asc"), col("rn_desc"), 2).as("d"))
      .select("d").as[Double].head()
    assert(out == (5.0 + 6.0) - (1.0 + 2.0))
  }

  test("modeDeterministic breaks ties with the smallest value") {
    val df = Seq(("k", "b"), ("k", "b"), ("k", "a"), ("k", "a"), ("k", "c"))
      .toDF("k", "v")
    val out = Stats.modeDeterministic(df, Seq("k"), "v", "m").select("m").as[String].head()
    assert(out == "a")
  }

  test("exactQuantiles: median and quartiles with linear interpolation") {
    val df = (1 to 4).map(i => ("k", i.toDouble)).toDF("k", "v")
    val out = Stats.exactQuantiles(df, Seq("k"), "v", Seq(0.25, 0.5, 0.75))
      .select("q", "q_value").as[(Double, Double)].collect().toMap
    // numpy linear: q25 = 1.75, q50 = 2.5, q75 = 3.25
    assert(out(0.25) == 1.75 && out(0.5) == 2.5 && out(0.75) == 3.25)
  }

  test("argmaxArray: first occurrence wins on ties (numpy argmax)") {
    val df = Seq(Tuple1(Seq(1.0, 5.0, 5.0, 2.0))).toDF("a")
    assert(df.select(Stats.argmaxArray(col("a")).as("i")).as[Int].head() == 1)
  }
}
