package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan-shape assertions for the scale-critical operators: the 100 TB
  * posture claims (broadcast the small side, stream the corpus, no stray
  * exchange) pinned against the actual physical plans, so a refactor that
  * silently flips a join strategy fails CI instead of a cluster run.
  */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("contaminationCheck broadcasts the benchmark shingles, not the corpus") {
    val train = (0L until 50L).map(i => (i, s"alpha beta gamma tok$i delta epsilon zeta"))
      .toDF("doc_id", "text")
    val bench = Seq((900L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val p = plan(Dedup.contaminationCheck(train, bench, "doc_id", "text", 5))
    Caches.releaseAll()
    assert(p.contains("BroadcastHashJoin"), s"benchmark side not broadcast:\n$p")
  }

  test("randomProject broadcasts the sign matrix") {
    val df = (0L until 20L).map(i => (i, Array.fill(8)(0.1f))).toDF("vec_id", "embedding")
    val p = plan(Vectors.randomProject(df, "vec_id", "embedding", 8, 4))
    assert(p.contains("BroadcastHashJoin"), s"sign matrix not broadcast:\n$p")
  }

  test("stratifiedSample is one shuffle (single window, no join)") {
    val df = (0L until 100L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "g")
    val p = plan(Sampling.stratifiedSample(df, "id", Seq("g"), 3))
    assert(!p.contains("Join"), s"unexpected join:\n$p")
    // exactly one exchange: the strata partitioning for the window
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$p")
  }

  test("assignSplit and sampleDeterministic are pure projections/filters — zero exchanges") {
    val df = spark.range(100).toDF("id")
    val p1 = plan(Sampling.assignSplit(df, "id", 10, Seq(("train", 8), ("val", 9), ("test", 10))))
    val p2 = plan(Sampling.sampleDeterministic(df, "id", 1, 10))
    assert(!p1.contains("Exchange") && !p2.contains("Exchange"))
  }
}
