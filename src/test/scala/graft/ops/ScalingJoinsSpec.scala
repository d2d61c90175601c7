package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScalingJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("standard scaler: (x - mean) / population stddev") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0)).toDF("k", "v")
    val out = Scaling.scale(df, Seq("k"), "v", "standard", "s")
      .orderBy("v").select("s").as[Double].collect().toSeq
    val sd = math.sqrt(2.0 / 3.0) // population stddev of 1,2,3
    assert(out.zip(Seq(-1.0 / sd, 0.0, 1.0 / sd)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("minmax scaler maps to [0, 1]") {
    val df = Seq(("g", 2.0), ("g", 4.0), ("g", 6.0)).toDF("k", "v")
    val out = Scaling.scale(df, Seq("k"), "v", "minmax", "s")
      .orderBy("v").select("s").as[Double].collect().toSeq
    assert(out == Seq(0.0, 0.5, 1.0))
  }

  test("zero-scale group degrades to centering (no division by zero)") {
    val df = Seq(("g", 5.0), ("g", 5.0)).toDF("k", "v")
    val out = Scaling.scale(df, Seq("k"), "v", "minmax", "s")
      .select("s").as[Double].collect().toSeq
    assert(out == Seq(0.0, 0.0))
  }

  test("robust scaler: (x - median) / IQR") {
    val df = (1 to 5).map(i => ("g", i.toDouble)).toDF("k", "v")
    val out = Scaling.scale(df, Seq("k"), "v", "robust", "s")
      .orderBy("v").select("s").as[Double].collect().toSeq
    // median 3, q25 = 2, q75 = 4 → IQR 2
    assert(out == Seq(-1.0, -0.5, 0.0, 0.5, 1.0))
  }

  test("rankNormalize is bit-equal to the percent_rank window formulation") {
    import org.apache.spark.sql.expressions.Window
    // ties, a singleton group (n = 1 → 0.0), a NULL value (NULLS FIRST rank),
    // and enough rows that the distinct frame is genuinely smaller
    val rows: Seq[(String, java.lang.Double)] =
      (0 until 400).map(i => (s"g${i % 3}", java.lang.Double.valueOf((i % 25).toDouble))) ++
        Seq(
          ("solo", java.lang.Double.valueOf(9.0)), // n = 1 group → 0.0
          ("g1", null: java.lang.Double)) // NULL ranks first, like the window
    val df = rows.toDF("k", "v")
    val twoPhase = Scaling.rankNormalize(df, Seq("k"), "v", "q")
      .groupBy("k", "v").agg(count(lit(1)).as("n"), min("q").as("qmin"), max("q").as("qmax"))
    val window = df.withColumn(
        "q", percent_rank().over(Window.partitionBy("k").orderBy("v")))
      .groupBy("k", "v").agg(count(lit(1)).as("n"), min("q").as("qmin"), max("q").as("qmax"))
    assert(twoPhase.exceptAll(window).isEmpty && window.exceptAll(twoPhase).isEmpty)
    assert(twoPhase.count() == window.count() &&
      Scaling.rankNormalize(df, Seq("k"), "v", "q").count() == df.count())
  }

  test("rangeFetchPadded pads missing buckets exactly once") {
    val anchors = Seq(("k", 1000L)).toDF("k", "anchor")
    val series = Seq(("k", 1000L, 7L), ("k", 1200L, 9L)).toDF("k", "bucket", "n")
    val out = Joins.rangeFetchPadded(anchors, series, Seq("k"), "anchor", "bucket", 0L, 600L, 200L)
      .select(col("fetch_bucket"), coalesce(col("n"), lit(-1L)).as("n"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(out == Seq((1000L, 7L), (1200L, 9L), (1400L, -1L)))
  }

  test("lookupWithDefault fills misses with the default") {
    val left = Seq(("a"), ("b")).toDF("k")
    val right = Seq(("a", "hit")).toDF("k", "v")
    val out = Joins.lookupWithDefault(left, right, Seq("k"), "v", lit("nothing"))
      .orderBy("k").select("v").as[String].collect().toSeq
    assert(out == Seq("hit", "nothing"))
  }

  test("asOf carries the latest sample at-or-before each anchor, NULL before the first") {
    val anchors = Seq(("k", 50L), ("k", 100L), ("k", 250L)).toDF("k", "t")
    val samples = Seq(("k", 100L, 1.0), ("k", 200L, 2.0)).toDF("k", "ts", "value")
    val out = Joins.asOf(anchors, samples, Seq("k"), "t", "ts", Seq("value"))
      .orderBy("t")
      .select(col("t"), col("asof_ts"), col("asof_value"))
      .as[(Long, Option[Long], Option[Double])].collect().toSeq
    assert(out == Seq(
      (50L, None, None), // before any sample
      (100L, Some(100L), Some(1.0)), // inclusive: sample at exactly t
      (250L, Some(200L), Some(2.0))))
  }

  test("rangeFetch pulls only rows inside [t - left, t + right)") {
    val anchors = Seq(("k", 1000L)).toDF("k", "t")
    val samples = Seq(("k", 799L), ("k", 800L), ("k", 1199L), ("k", 1200L))
      .toDF("k", "ts")
    val out = Joins.rangeFetch(anchors, samples, Seq("k"), "t", "ts", 200L, 200L)
      .select(col("s.ts")).as[Long].collect().sorted.toSeq
    assert(out == Seq(800L, 1199L))
  }
}
