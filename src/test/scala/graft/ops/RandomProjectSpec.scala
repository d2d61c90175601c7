package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class RandomProjectSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, dims: Int, seed: Int) = {
    val rng = new Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dims)(rng.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding")
  }

  test("randomProject: right shape, deterministic across runs") {
    val df = corpus(50, 64, seed = 5)
    val r1 = Vectors.randomProject(df, "vec_id", "embedding", 64, 16)
      .as[(Long, Long, Double)].collect().toSet
    val r2 = Vectors.randomProject(df, "vec_id", "embedding", 64, 16)
      .as[(Long, Long, Double)].collect().toSet
    assert(r1.size == 50 * 16)
    assert(r1.map(_._2) == (0L until 16L).toSet)
    assert(r1 == r2)
  }

  test("randomProject roughly preserves norms (JL sanity)") {
    val df = corpus(40, 64, seed = 17)
    val inNorm = df.select(col("vec_id"), Vectors.norm2Exact(col("embedding")).as("n2"))
      .as[(Long, Double)].collect().toMap
    val outNorm = Vectors.randomProject(df, "vec_id", "embedding", 64, 16)
      .groupBy("vec_id").agg(sum(col("value") * col("value")).as("n2"))
      .as[(Long, Double)].collect().toMap
    // E[‖Px‖²] = ‖x‖² for ±1/√k projections; at k=16 individual ratios are
    // noisy but the corpus mean concentrates
    val ratios = inNorm.keys.map(id => outNorm(id) / inNorm(id))
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"mean norm ratio $mean")
  }
}
