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

  /** The query's physical plan PLUS every plan hidden behind a persisted
    * intermediate: `TreeNode.collect` stops at `InMemoryTableScanExec`
    * leaves (and `toString` doesn't render the cached relation), so a lint
    * over the top plan alone would miss anything `Caches.trackPersist` put
    * below a cache boundary — which is most of Dedup/Graph/Sketch. Descends
    * recursively (cached plans can nest further caches). localCheckpoint
    * boundaries are genuinely opaque (the plan is truncated to an RDD scan,
    * and the checkpointed job already ran at build time) — those shapes are
    * pinned by their own operator specs instead.
    */
  private def expandedPlans(
      plan: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
    plan +: plan
      .collect { case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => im }
      .flatMap(im => expandedPlans(im.relation.cachedPlan))

  test("no registered query plans a CartesianProduct at sf0.001 (incl. cached sub-plans)") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan =
        try expandedPlans(fn(spark, sfDir).queryExecution.executedPlan).map(_.toString).mkString("\n")
        catch { case e: Throwable => s"PLANNING FAILED: ${e.getMessage}" }
      graft.ops.Caches.releaseAll()
      if (plan.contains("CartesianProduct") || plan.contains("PLANNING FAILED"))
        Some(name -> plan.linesIterator.take(3).mkString(" | "))
      else None
    }
    assert(offenders.isEmpty,
      s"queries with CartesianProduct or planning failures:\n${offenders.mkString("\n")}")
  }

  /** Queries whose plans CONTAIN an unpartitioned WindowExec, each one
    * audited: the window's INPUT frame is sub-linear by construction, so
    * the single task it funnels through is sized by a frontier / distinct
    * set / cell grid, never the corpus.
    *
    *   - m1/m2 label codecs: distinct labels (|labels| rows)
    *   - m12/m12b AUC, m16 spearman: rank offsets over DISTINCT score
    *     values (bounded-distinct contract in `Stats.binaryAuc`/`spearman`)
    *   - t21 zipf: cumulative offsets over distinct COUNT values (O(√corpus))
    *   - t10/temperature_mix: lang×source / source cell grids
    *   - o6 skyline: stage-2 window over per-bucket frontiers
    *   - w27 RFM: exactQuantiles' rank windows over distinct metric values
    */
  private val globalWindowWhitelist = Set(
    "m1_label_encode", "m2_label_decode", "m12_auc", "m12b_auc_quantized",
    "m16_spearman", "t21_zipf_slope", "t10_mix_divergence",
    "temperature_mix", "o6_skyline", "w27_rfm")

  test("global (unpartitioned) windows appear only over audited sub-linear frames") {
    // an unpartitioned WindowExec sorts its ENTIRE input through one task —
    // the quietest way to lose a 1000-executor cluster. Every intentional
    // one in the registry feeds a sub-linear frame (see whitelist); a new
    // query that forgets to partition (or to pre-aggregate to a distinct
    // frame first) fails here before it ever meets real data.
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    spark.conf.set("spark.sql.adaptive.enabled", "false") // plain plan tree for collect()
    try {
      val failures = scala.collection.mutable.ListBuffer.empty[String]
      val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        val n =
          try
            expandedPlans(fn(spark, sfDir).queryExecution.executedPlan).flatMap(_.collect {
              case w: WindowExec if w.partitionSpec.isEmpty => w: Any
              case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w: Any
            }).size
          catch { case e: Throwable => failures += s"$name: ${e.getMessage}"; 0 }
        graft.ops.Caches.releaseAll()
        if (n > 0) Some(name) else None
      }.toSet
      assert(failures.isEmpty, s"planning failed during window lint:\n${failures.mkString("\n")}")
      assert((offenders -- globalWindowWhitelist).isEmpty,
        "UNAUDITED global window (sorts its whole input through ONE task) in: " +
          s"${(offenders -- globalWindowWhitelist).mkString(", ")} — partition it, " +
          "pre-aggregate to a sub-linear frame, or audit + whitelist with justification")
      assert((globalWindowWhitelist -- offenders).isEmpty,
        "stale whitelist entries (no global window in plan anymore): " +
          s"${(globalWindowWhitelist -- offenders).mkString(", ")} — remove them")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
