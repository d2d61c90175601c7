package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan

/** Registry-wide plan lint: every registered query's physical plan at
  * sf0.001, checked for the accidents that silently wreck 100 TB runs.
  *
  * - No `CartesianProduct`: an unhinted cross join enumerates |L|·|R|
  *   pairs with no build side — every intentional all-pairs shape in the
  *   registry broadcasts its small side (BroadcastNestedLoopJoin), which
  *   is allowed and asserted AS the distinction.
  * - Global (unpartitioned) windows only over audited sub-linear frames.
  * - A GOLDEN per-query plan signature (join strategies, exchanges,
  *   windows, cache boundaries): wall-time is contention-noise on a shared
  *   box (seven rounds of verdicts), but plan shape is deterministic — a
  *   lost `broadcast()` hint (round 4's 40 s → 8.5 s vocab join), a join
  *   that flips BHJ→SMJ, or a new shuffle shows up here as a one-line
  *   diff long before it costs a bench round. After a DELIBERATE plan
  *   change, regenerate with `GRAFT_BLESS_GOLDEN=1 sbt test` and review
  *   the signature diff like any other golden artifact.
  *
  * Building a plan is cheap, so ONE sweep (AQE off, for a plain statically
  * planned tree) serves all three tests; a new query with a forgotten
  * broadcast hint fails here before it ever reaches the bench. (Queries
  * with plan-time scalar probes run those tiny jobs during construction —
  * that is their documented design, and at sf0.001 the whole sweep stays
  * in test-suite budget.)
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
  private def expandedPlans(plan: SparkPlan): Seq[SparkPlan] =
    plan +: plan
      .collect { case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => im }
      .flatMap(im => expandedPlans(im.relation.cachedPlan))

  /** Deterministic shape summary of one query's expanded physical plan.
    * Counts only STRATEGY-carrying nodes (joins, exchanges, windows, cache
    * boundaries) — not sorts/projections/filters, which churn with harmless
    * refactors and would make the golden noisy. Plus the SCAN PRUNING
    * state: per parquet scan, the table, the columns that actually reach
    * the reader (`requiredSchema` — a scan reading `text` for a 2-column
    * projection is a pruning regression), and how many data filters landed
    * at the scan node (a pushdown that stops reaching the scan shows as
    * the count dropping). Identical scans collapse with a ×N multiplicity.
    */
  private def signature(plans: Seq[SparkPlan]): String = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins._
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    var bhj, smj, shj, bnlj, cart, xchg, bcast, win, gwin, wgl, gwgl, cache = 0
    val scans = scala.collection.mutable.ListBuffer.empty[String]
    plans.foreach(_.foreach {
      case _: BroadcastHashJoinExec => bhj += 1
      case _: SortMergeJoinExec => smj += 1
      case _: ShuffledHashJoinExec => shj += 1
      case _: BroadcastNestedLoopJoinExec => bnlj += 1
      case _: CartesianProductExec => cart += 1
      case _: ShuffleExchangeExec => xchg += 1
      case _: BroadcastExchangeExec => bcast += 1
      case w: WindowExec => if (w.partitionSpec.isEmpty) gwin += 1 else win += 1
      case w: WindowGroupLimitExec => if (w.partitionSpec.isEmpty) gwgl += 1 else wgl += 1
      case _: InMemoryTableScanExec => cache += 1
      case f: FileSourceScanExec =>
        val table = f.relation.location.rootPaths.headOption
          .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
        scans += s"$table{${f.requiredSchema.fieldNames.sorted.mkString(",")}|f=${f.dataFilters.size}}"
      case _ => ()
    })
    val scanSig = scans.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (s, l) => if (l.size == 1) s else s"$s×${l.size}" }.mkString(";")
    s"bhj=$bhj smj=$smj shj=$shj bnlj=$bnlj cart=$cart xchg=$xchg " +
      s"bcast=$bcast win=$win gwin=$gwin wgl=$wgl gwgl=$gwgl cache=$cache " +
      s"scans=$scanSig"
  }

  private case class Sweep(
      signatures: Map[String, String],
      rawFloatAggs: Map[String, Seq[String]],
      nondet: Map[String, Seq[String]],
      failures: Seq[String])

  /** Expressions the analyzed plan marks non-deterministic (rand(),
    * monotonically_increasing_id, shuffle(), …): any one of them makes a
    * query's output partitioning- or retry-dependent, which an oracle hash
    * cannot tolerate — the engine samples/salts/ranks via hashes instead
    * (DETERMINISM.md §9). Reports the outermost flagged node per site.
    */
  private def nondetExprs(analyzed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] = {
    val hits = scala.collection.mutable.ListBuffer.empty[String]
    analyzed.foreach(_.expressions.foreach(_.foreach { e =>
      if (!e.deterministic && e.children.forall(_.deterministic))
        hits += e.getClass.getSimpleName
    }))
    hits.toList
  }

  /** Raw DOUBLE/FLOAT Sum/Average aggregates in the ANALYZED plan: both are
    * partition-order-dependent (float addition doesn't associate), so any
    * oracle-checked query carrying one can hash-diverge under a different
    * partitioning — the engine's convention (DETERMINISM.md) is that every
    * float aggregation routes through the `Exact` decimal paths. Currently
    * ZERO hits registry-wide (probed); this keeps it that way.
    */
  private def rawFloatAggs(analyzed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Average, Sum}
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    val hits = scala.collection.mutable.ListBuffer.empty[String]
    analyzed.foreach(_.expressions.foreach(_.foreach {
      case s: Sum if s.child.dataType == DoubleType || s.child.dataType == FloatType =>
        hits += s"sum(${s.child.sql.take(60)})"
      case a: Average if a.child.dataType == DoubleType || a.child.dataType == FloatType =>
        hits += s"avg(${a.child.sql.take(60)})"
      case _ => ()
    }))
    hits.toList
  }

  /** One planning pass over the whole registry, shared by all three tests.
    * AQE is disabled for the sweep: the STATIC planner choice is the
    * deterministic, pinnable artifact (AQE's runtime re-plan can only
    * improve on it) and `AdaptiveSparkPlanExec` hides the tree from
    * `collect` until execution.
    */
  private lazy val sweep: Sweep = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // cold fit memos: a pre-warmed memo (another suite ran registered
    // queries first) changes plan-time cache-materialization stats and
    // flips broadcast-vs-SMJ choices — reset so the sweep is
    // deterministic under ANY suite order (see graft.ops.Fits.reset)
    graft.ops.Fits.reset()
    try {
      val failures = scala.collection.mutable.ListBuffer.empty[String]
      // FIT-PIPELINE pseudo-queries: the PCA covariance fit and the IVF
      // Lloyd fits are collected EAGERLY at query-build time by the
      // memoized per-dataset caches (Pca.fitK via pcaFitFor; SimilarityQ's
      // ivfFits/hierFits), so the registered queries' signatures contain
      // only the post-fit routing plan — a fit-plan regression (lost
      // broadcast, new exchange, un-pruned scan) would be invisible there.
      // Planning the fit frames directly closes that blind spot: they are
      // fully lazy DataFrames (collect happens only inside fitK/fitCollect),
      // so this costs a plan, not a job.
      val fitFrames: Seq[(String, org.apache.spark.sql.DataFrame)] = {
        import org.apache.spark.sql.functions.col
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id"), col("embedding"))
        val eN = emb.withColumn("n2", graft.ops.Vectors.norm2Exact(col("embedding")))
        Seq(
          "__fit_pca_cov" ->
            graft.ml.Pca.sampleCov(emb, "vec_id", "embedding", 64, 4),
          "__fit_ivf_flat" ->
            graft.ml.IvfQuantizer.fitRanked(eN, "vec_id", "embedding", "n2", 8, 2, sampleEvery = 4),
          "__fit_ivf_hier" ->
            graft.ml.IvfQuantizer.fitAssignHier(eN, "vec_id", "embedding", "n2", 3, 1, se1 = 4, se2 = 2))
      }
      val rows = (graft.SparkEntry.queries.toSeq.sortBy(_._1).map {
        case (name, fn) => (name, () => fn(spark, sfDir))
      } ++ fitFrames.map { case (name, df) => (name, () => df) }).flatMap {
        case (name, build) =>
          val out =
            try {
              val qe = build().queryExecution
              Some((name, signature(expandedPlans(qe.executedPlan)),
                rawFloatAggs(qe.analyzed), nondetExprs(qe.analyzed)))
            } catch { case e: Throwable => failures += s"$name: ${e.getMessage}"; None }
          graft.ops.Caches.releaseAll()
          out
      }
      Sweep(
        rows.map(r => r._1 -> r._2).toMap,
        rows.collect { case (n, _, fa, _) if fa.nonEmpty => n -> fa }.toMap,
        rows.collect { case (n, _, _, nd) if nd.nonEmpty => n -> nd }.toMap,
        failures.toList)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("COVERAGE.md header count matches the live registry size") {
    // the r9 round shipped a stale header (191 documented vs 193 live) —
    // tie the doc to SparkEntry.queries.size so registry growth without a
    // COVERAGE.md refresh fails loudly instead of drifting silently
    val header = scala.io.Source.fromFile("COVERAGE.md", "UTF-8").getLines().take(20).mkString(" ")
    val m = """\*\*(\d+) registered\b""".r.findFirstMatchIn(header)
    assert(m.nonEmpty, "COVERAGE.md header lost its '**N registered' count marker")
    assert(m.get.group(1).toInt == graft.SparkEntry.queries.size,
      s"COVERAGE.md header says ${m.get.group(1)} registered queries but the " +
        s"registry has ${graft.SparkEntry.queries.size} — refresh the header counts")
  }

  test("every registered query plans successfully; none plans a CartesianProduct") {
    assert(sweep.failures.isEmpty,
      s"planning failed for:\n${sweep.failures.mkString("\n")}")
    val cart = sweep.signatures.filter(!_._2.contains("cart=0")).keys.toSeq.sorted
    assert(cart.isEmpty, s"queries with CartesianProduct (incl. cached sub-plans): " +
      s"${cart.mkString(", ")} — broadcast the small side or rewrite the join")
  }

  test("no registered query aggregates raw DOUBLE/FLOAT (partition-order-dependent)") {
    val bad = sweep.rawFloatAggs.toSeq.sortBy(_._1)
      .map { case (n, hs) => s"$n: ${hs.distinct.mkString("; ")}" }
    assert(bad.isEmpty,
      "raw float Sum/Average found (hash can diverge under repartitioning) — " +
        s"route through Exact.dsum/dmean/dsumTrunc* instead:\n${bad.mkString("\n")}")
  }

  test("non-deterministic expressions appear only as MLlib's flagged predict UDFs") {
    // the only tolerated marker: MLlib model-transform ScalaUDFs in the
    // three rows-only ML entries — MLlib flags them non-deterministic
    // conservatively, while the actual predictions are seed-pinned
    // (BbdcSpec run-twice equality, MlBoundsSpec memorization floors).
    // Anything else (rand, monotonically_increasing_id, shuffle, …) is a
    // partitioning/retry dependence an oracle hash cannot tolerate.
    val allowed = Set("m5_impute_linreg", "m6_ensemble_vote", "m6b_ensemble_boosted")
    val bad = sweep.nondet.toSeq.sortBy(_._1).collect {
      case (n, hs) if !(allowed.contains(n) && hs.distinct == Seq("ScalaUDF")) =>
        s"$n: ${hs.distinct.mkString(", ")}"
    }
    assert(bad.isEmpty,
      "non-deterministic expressions in registered plans — replace with " +
        s"hash-based sampling/ids (DETERMINISM.md §9):\n${bad.mkString("\n")}")
    assert((allowed -- sweep.nondet.keySet).isEmpty,
      "stale nondet whitelist (no flagged UDF anymore): " +
        s"${(allowed -- sweep.nondet.keySet).mkString(", ")} — remove")
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
    *   - t10/temperature_mix/mix_epochs: lang×source / source / lang cell grids
    *   - o6 skyline: stage-2 window over per-bucket frontiers
    *   - w27 RFM: exactQuantiles' rank windows over distinct metric values
    */
  private val globalWindowWhitelist = Set(
    "m1_label_encode", "m2_label_decode", "m12_auc", "m12b_auc_quantized",
    "m16_spearman", "t21_zipf_slope", "t10_mix_divergence",
    "temperature_mix", "mix_epochs", "o6_skyline", "w27_rfm")

  test("global (unpartitioned) windows appear only over audited sub-linear frames") {
    // an unpartitioned WindowExec sorts its ENTIRE input through one task —
    // the quietest way to lose a 1000-executor cluster. Every intentional
    // one in the registry feeds a sub-linear frame (see whitelist); a new
    // query that forgets to partition (or to pre-aggregate to a distinct
    // frame first) fails here before it ever meets real data.
    val offenders = sweep.signatures.collect {
      case (name, sig) if !(sig.contains("gwin=0") && sig.contains("gwgl=0")) => name
    }.toSet
    assert((offenders -- globalWindowWhitelist).isEmpty,
      "UNAUDITED global window (sorts its whole input through ONE task) in: " +
        s"${(offenders -- globalWindowWhitelist).mkString(", ")} — partition it, " +
        "pre-aggregate to a sub-linear frame, or audit + whitelist with justification")
    assert((globalWindowWhitelist -- offenders).isEmpty,
      "stale whitelist entries (no global window in plan anymore): " +
        s"${(globalWindowWhitelist -- offenders).mkString(", ")} — remove them")
  }

  test("per-query plan signatures match the blessed golden") {
    val lines = sweep.signatures.toSeq.sortBy(_._1).map { case (n, s) => s"$n $s" }
    if (sys.env.contains("GRAFT_BLESS_GOLDEN")) {
      val p = java.nio.file.Paths.get("src/test/resources/plan_signatures.txt")
      java.nio.file.Files.write(p, lines.mkString("", "\n", "\n").getBytes("UTF-8"))
      info(s"BLESSED ${lines.size} signatures -> $p")
    } else {
      val stream = getClass.getResourceAsStream("/plan_signatures.txt")
      assert(stream != null,
        "golden plan-signature file missing — bless with GRAFT_BLESS_GOLDEN=1 sbt test")
      val golden = scala.io.Source.fromInputStream(stream, "UTF-8").getLines().toSeq
        .filter(_.nonEmpty).map { l =>
          val i = l.indexOf(' '); l.take(i) -> l.drop(i + 1)
        }.toMap
      val gone = (golden.keySet -- sweep.signatures.keySet).toSeq.sorted
      val added = (sweep.signatures.keySet -- golden.keySet).toSeq.sorted
      val changed = sweep.signatures.toSeq.sortBy(_._1).collect {
        case (n, s) if golden.contains(n) && golden(n) != s =>
          s"$n\n  golden: ${golden(n)}\n  now:    $s"
      }
      assert(gone.isEmpty && added.isEmpty && changed.isEmpty,
        "plan signatures diverged from the blessed golden — a join strategy, " +
          "shuffle, window, or cache boundary changed. If DELIBERATE, re-bless " +
          "with GRAFT_BLESS_GOLDEN=1 sbt test and review the diff.\n" +
          (if (gone.nonEmpty) s"missing queries: ${gone.mkString(", ")}\n" else "") +
          (if (added.nonEmpty) s"new queries (bless to pin): ${added.mkString(", ")}\n" else "") +
          changed.mkString("\n"))
    }
  }
}
