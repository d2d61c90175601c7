package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class ImputeSpec extends SparkSpec {
  import spark.implicits._

  test("linearRepair recovers an exact linear relation on the fix rows") {
    val rng = new Random(5)
    // y = 3*x1 - 2*x2 + 1 exactly; rows 0..19 are "broken" (y corrupted)
    val rows = (0 until 100).map { i =>
      val x1 = rng.nextDouble() * 10
      val x2 = rng.nextDouble() * 10
      val trueY = 3 * x1 - 2 * x2 + 1
      val y = if (i < 20) -999.0 else trueY
      (i.toLong, x1, x2, y, trueY)
    }
    val df = rows.toDF("id", "x1", "x2", "y", "true_y")
    val repaired = Impute.linearRepair(
      df, "y", Seq("x1", "x2"),
      trainFilter = col("id") >= 20,
      fixPredicate = col("id") < 20)
    val fixErr = repaired.filter(col("id") < 20)
      .select(max(abs(col("y") - col("true_y")))).as[Double].head()
    assert(fixErr < 1e-6, s"broken rows not recovered, max err $fixErr")
    // healthy rows untouched
    val healthyErr = repaired.filter(col("id") >= 20)
      .select(max(abs(col("y") - col("true_y")))).as[Double].head()
    assert(healthyErr == 0.0)
  }

  test("ols1Repair recovers an exact single-feature linear relation") {
    val rng = new Random(9)
    // y = -1.5*x + 4 exactly; every 5th row corrupted
    val rows = (0 until 100).map { i =>
      val x = rng.nextDouble() * 8
      val trueY = -1.5 * x + 4
      val y = if (i % 5 == 0) 777.0 else trueY
      (i.toLong, x, y, trueY)
    }
    val df = rows.toDF("id", "x", "y", "true_y")
    val repaired = Impute.ols1Repair(
      df, "y", "x",
      trainFilter = col("id") % 5 =!= 0,
      fixPredicate = col("id") % 5 === 0)
    val fixErr = repaired.filter(col("id") % 5 === 0)
      .select(max(abs(col("y") - col("true_y")))).as[Double].head()
    // exact decimal sums quantize inputs at scale 9 → recovery to ~1e-6
    assert(fixErr < 1e-6, s"broken rows not recovered, max err $fixErr")
    val healthyErr = repaired.filter(col("id") % 5 =!= 0)
      .select(max(abs(col("y") - col("true_y")))).as[Double].head()
    assert(healthyErr == 0.0)
  }
}
