package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // synthetic corpus with a PLANTED dominant axis u = (1, 1, 0, ..., 0)/√2:
  // vec i = a_i·u + small off-axis noise, a_i spread in [-8, 8]
  private val dims = 8
  private def planted(n: Int) = (0 until n).map { i =>
    val a = (i % 17).toDouble - 8.0
    val arr = Array.tabulate(dims) { d =>
      val axis = if (d < 2) a / math.sqrt(2.0) else 0.0
      axis + 0.01 * (((i * 31 + d * 7) % 11) - 5)
    }
    (i.toLong, arr.map(_.toFloat))
  }

  test("powerIteration recovers a planted dominant axis") {
    val df = planted(200).toDF("vec_id", "embedding")
    val cells = Pca.sampleCov(df, "vec_id", "embedding", sampleEvery = 1)
      .as[(Int, Int, Double)].collect().toSeq
    val v = Pca.powerIteration(cells, dims, iters = 8)
    val u = Array.tabulate(dims)(d => if (d < 2) 1.0 / math.sqrt(2.0) else 0.0)
    val cos = v.zip(u).map { case (a, b) => a * b }.sum /
      math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(cos) > 0.99, s"recovered direction off-axis: |cos| = ${math.abs(cos)}")
    // unit norm (trunc-9 algebra keeps it within quantization noise)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-6)
    // sign canonicalization: first nonzero component positive
    assert(v(v.indexWhere(_ != 0.0)) > 0)
  }

  test("pc1Scores: on-axis extremes rank highest; scores track the axis coefficient") {
    val df = planted(200).toDF("vec_id", "embedding")
    val scores = Pca.pc1Scores(df, "vec_id", "embedding", dims, iters = 8, sampleEvery = 1)
      .as[(Long, Double)].collect().toMap
    assert(scores.size == 200)
    // the centered axis coefficient of vec i is ((i % 17) - 8) - mean; the
    // most extreme |coefficient| rows must carry the most extreme |score|
    val coef = (0 until 200).map(i => i.toLong -> ((i % 17).toDouble - 8.0)).toMap
    val meanC = coef.values.sum / 200.0
    val byScore = scores.toSeq.sortBy { case (_, s) => -math.abs(s) }.map(_._1).take(10)
    val byCoef = coef.toSeq.sortBy { case (_, c) => -math.abs(c - meanC) }.map(_._2)
    val topCoefAbs = math.abs(byCoef.head - meanC)
    byScore.foreach { id =>
      assert(math.abs(coef(id) - meanC) > topCoefAbs - 1.5,
        s"vec $id in score top-10 but its axis coefficient is not extreme")
    }
    // signed scores correlate with the signed coefficient (not just |.|)
    val corrNum = scores.toSeq.map { case (id, s) => s * (coef(id) - meanC) }.sum
    assert(corrNum.abs > 0, "scores carry no axis signal")
  }

  test("powerIteration rejects a degenerate all-zero covariance loudly") {
    intercept[IllegalArgumentException] {
      Pca.powerIteration(Seq.empty, dims, iters = 3)
    }
  }
}
