package graft.queries

import graft.SparkSpec

/** Registry-wide plan lint: every registered query's physical plan at
  * sf0.001, checked for the accidents that silently wreck 100 TB runs.
  *
  * - No `CartesianProduct`: an unhinted cross join enumerates |L|·|R|
  *   pairs with no build side — every intentional all-pairs shape in the
  *   registry broadcasts its small side (BroadcastNestedLoopJoin), which
  *   is allowed and asserted AS the distinction.
  *
  * Building a plan is cheap, so this sweeps all 180 queries where the
  * per-operator specs each pin one; a new query with a forgotten
  * `broadcast()` hint fails here before it ever reaches the bench.
  * (Queries with plan-time scalar probes run those tiny jobs during
  * construction — that is their documented design, and at sf0.001 the
  * whole sweep stays in test-suite budget.)
  */
class RegistryPlanLintSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("no registered query plans a CartesianProduct at sf0.001") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan =
        try fn(spark, sfDir).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLANNING FAILED: ${e.getMessage}" }
      graft.ops.Caches.releaseAll()
      if (plan.contains("CartesianProduct") || plan.contains("PLANNING FAILED"))
        Some(name -> plan.linesIterator.take(3).mkString(" | "))
      else None
    }
    assert(offenders.isEmpty,
      s"queries with CartesianProduct or planning failures:\n${offenders.mkString("\n")}")
  }
}
