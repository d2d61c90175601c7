package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def windowed(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn(
      "rnk",
      row_number().over(Window.partitionBy("g").orderBy(col("v").desc, col("id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select("g", "id", "v", "rnk")

  test("heap top-k matches the window formulation exactly (ties, small groups, k > group size)") {
    val rng = new Random(7)
    // group 0 has 1 row (< k); values collide often to exercise the tiebreak
    val rows = (0 until 500).map { i =>
      val g = if (i == 0) 0L else 1L + rng.nextInt(9)
      (g, i.toLong, rng.nextInt(20).toDouble)
    }
    val df = rows.toDF("g", "id", "v")
    val expected = windowed(df, 3).as[(Long, Long, Double, Long)].collect().toSet
    val actual = graft.ops.TopK.perKey(df, Seq("g"), Seq(("v", true), ("id", false)), 3)
      .select("g", "id", "v", "rnk").as[(Long, Long, Double, Long)].collect().toSet
    assert(actual == expected)
  }

  test("the plan uses TopKPerKeyExec and contains NO Sort") {
    val df = (0L until 100L).map(i => (i % 5, i, i * 1.5)).toDF("g", "id", "v")
    val out = graft.ops.TopK.perKey(df, Seq("g"), Seq(("v", true), ("id", false)), 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"custom exec missing:\n$plan")
    assert(!plan.contains("Sort"), s"heap operator must not sort partitions:\n$plan")
    assert(out.count() == 10)
  }

  test("float group keys normalize: 0.0 and -0.0 are ONE group (window semantics)") {
    val df = Seq((0.0, 1L, 5.0), (-0.0, 2L, 7.0), (-0.0, 3L, 3.0))
      .toDF("g", "id", "v")
    val out = graft.ops.TopK.perKey(df, Seq("g"), Seq(("v", true), ("id", false)), 2)
      .select("id", "rnk").as[(Long, Long)].collect().toSet
    // one group of three rows → top-2 by v desc: ids 2 (7.0), 1 (5.0)
    assert(out == Set((2L, 1L), (1L, 2L)))
  }

  test("registered via SparkSessionExtensions too (strategy idempotent)") {
    // calling perKey twice must not register the strategy twice
    val df = (0L until 10L).map(i => (0L, i, i.toDouble)).toDF("g", "id", "v")
    graft.ops.TopK.perKey(df, Seq("g"), Seq(("v", false)), 1).count()
    graft.ops.TopK.perKey(df, Seq("g"), Seq(("v", false)), 1).count()
    val n = spark.experimental.extraStrategies.count(_ == TopKPerKeyStrategy)
    assert(n == 1)
  }
}
