package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative graph analytics over candidate-pair graphs — the companion to
  * [[Dedup.connectedComponents]]: where CC answers "which documents form one
  * duplicate group", PageRank ranks how CENTRAL each document is inside the
  * near-dup web (a high-rank doc is the canonical/most-connected variant, a
  * natural keep-policy signal alongside the quality score of d8).
  *
  * Cross-engine determinism: ranks are scaled BIGINTs (1.0 ≡ 10^12), the
  * per-edge contribution is integer division `rank DIV degree`, and the
  * damping update is `0.15 + 0.85·Σ` computed as
  * `150_000_000_000 + (85·Σ) DIV 100` — every step is exact 64-bit integer
  * arithmetic, so a fixed iteration count yields bit-identical results on
  * any partitioning and in the DuckDB oracle (positive operands: Spark's
  * truncating `DIV` and DuckDB's flooring `//` agree). No floats anywhere.
  *
  * Scale shape: per iteration one join of the edge list against the rank
  * vector plus one groupBy on dst — both shuffles are over EDGES (dedup
  * graphs are sparse: near-dup pairs, not cliques), and the edge+degree
  * frames are persisted once.
  *
  * Overflow bound, ENFORCED: total rank mass is ≤ n·scale at every
  * iteration (mass starts at n·scale and the damped update is a
  * contraction on the total: new_total ≤ 0.15·n·scale + 0.85·old_total),
  * so the largest Σ any node can receive is n·scale and the hottest
  * intermediate is `85·Σ ≤ 85·n·scale`. [[derivedScale]] picks the largest
  * power of 10 that provably fits that in int64 (capped at the canonical
  * 10^12), and [[pagerankScaled]] validates any explicitly-passed scale
  * against the same bound — a graph too large for its scale fails at plan
  * time with the bound in the message, never mid-job with a raw ANSI
  * overflow. The node count this needs is one cheap scalar off the
  * persisted `ids` frame (same cost class as [[Dedup.connectedComponents]]'
  * convergence probe); callers that know `n` from table metadata can pass
  * `scale` explicitly and skip nothing — the count also guards the bound.
  */
object Graph {

  /** Canonical rank scale (1.0 ≡ 10^12) — the value [[derivedScale]]
    * returns for every graph up to ~10^5 nodes, and the constant the `g1`
    * oracle mirrors.
    */
  val Scale: Long = 1000000000000L

  /** Largest power-of-10 scale such that `85·n·scale` fits int64, capped
    * at [[Scale]]: 10^12 through n ≈ 10^5, one decade less per 10× beyond.
    * Fails for graphs past n ≈ 10^15 (scale would drop under 100, where
    * the 0.15 base term stops being exact).
    */
  def derivedScale(n: Long): Long = {
    require(n > 0, s"derivedScale needs a positive node count, got $n")
    val bound = Long.MaxValue / 85L / n
    var s = Scale
    while (s > bound) s /= 10
    require(s >= 100, s"graph too large for 64-bit scaled PageRank: n=$n")
    s
  }

  /** Fixed-iteration damped PageRank (d=0.85) over an UNDIRECTED pair list.
    * Every node in `nodes` gets a row; nodes with no incident edge hold the
    * base rank 0.15 (dangling mass is dropped, not redistributed — the
    * usual simplification for ranking *within* near-dup neighborhoods,
    * stated here as the contract). `scale` defaults to [[derivedScale]] of
    * the node count; an explicit value is validated against the same
    * overflow bound (and must mirror into any cross-engine oracle).
    */
  /** `checkpointEvery`: truncate the rank frame's lineage with an eager
    * `localCheckpoint` every N iterations — the same per-round hygiene as
    * [[Dedup.connectedComponents]]. At the default 5 iterations the
    * nested plan is harmless, so 0 (off) is the default; long-iteration
    * runs (≥ ~10) should pass 1 — without truncation Catalyst re-analyzes
    * one nesting level per round and plan prep grows superlinearly (on a
    * cluster with dynamic allocation, swap for reliable `checkpoint`).
    * Checkpointing changes no values, only the plan boundary.
    */
  def pagerankScaled(
      pairs: DataFrame,
      nodes: DataFrame,
      aCol: String,
      bCol: String,
      idCol: String,
      iters: Int = 5,
      scale: Option[Long] = None,
      checkpointEvery: Int = 0): DataFrame = {
    // persist the caller's pair relation BEFORE symmetrizing: the fwd/rev
    // union otherwise evaluates the (typically expensive, unpersisted)
    // upstream pair pipeline once per branch — measured on g1 at sf0.1:
    // the jaccardPairs join/agg chain ran twice inside the edge
    // materialization job (guide §2.4 — remove recomputed subtrees before
    // removing shuffles)
    val p0 = Caches.trackPersist(
      pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst")))
    // the edge list is PRE-PARTITIONED on src before persisting (guide
    // §2.4: two operations keyed the same way share one exchange): every
    // iteration joins edges on src, so the cached hashpartitioning makes
    // the per-round contribution join reuse the layout instead of
    // re-exchanging the edge list once per iteration — the only edge-sized
    // shuffle left per round is the unavoidable transpose (groupBy dst).
    // The repartition costs ONE extra exchange at materialization,
    // amortized over `iters` rounds; deg inherits the partitioning for
    // free (groupBy src over a src-partitioned cache plans no exchange)
    val edges = Caches.trackPersist(
      p0.union(p0.select(col("dst").as("src"), col("src").as("dst"))).distinct()
        .repartition(col("src")))
    val deg = Caches.trackPersist(
      edges.groupBy("src").agg(count(lit(1)).as("deg")))
    // referenced once per iteration plus the seed — persist, don't rescan;
    // partitioned on id so the per-round resurrect join (ids ⋈ contrib,
    // contrib already partitioned by id from its groupBy) is exchange-free
    val ids = Caches.trackPersist(
      nodes.select(col(idCol).cast("long").as("id")).repartition(col("id")))
    val n = math.max(ids.count(), 1L)
    val sc = scale.getOrElse(derivedScale(n))
    require(
      sc >= 100 && sc % 100 == 0 && sc <= Long.MaxValue / 85L / n,
      s"scale $sc overflows 85*n*scale at n=$n (max ${Long.MaxValue / 85L / n}); " +
        "use derivedScale or pass a smaller scale")
    val base = 15L * sc / 100 // 0.15, exact: sc is a multiple of 100
    var ranks = ids.withColumn("rank_scaled", lit(sc))
    (1 to iters).foreach { i =>
      // per-SOURCE contribution first (rank DIV deg depends only on the
      // node): the deg join runs over the node-sized rank frame, not once
      // per edge — identical integers per edge, node-sized shuffle bytes
      // (guide §2.3 "shuffle fewer bytes"); both deg and edges read their
      // cached src-partitioning, so the only exchanges in this round are
      // the node-sized ranks relocation and the edge-sized transpose
      val srcC = deg
        .join(ranks.select(col("id").as("src"), col("rank_scaled")), "src")
        .select(col("src"), expr("rank_scaled DIV deg").as("c"))
      val contrib = edges
        .join(srcC, "src")
        .select(col("dst").as("id"), col("c"))
        .groupBy("id")
        .agg(sum(col("c")).as("s"))
      ranks = ids
        .join(contrib, Seq("id"), "left")
        .select(
          col("id"),
          (lit(base) + expr("85 * coalesce(s, 0L) DIV 100")).as("rank_scaled"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** PERSONALIZED PageRank — [[pagerankScaled]] with the teleport mass
    * concentrated on a SEED set instead of spread uniformly: rank flows
    * outward from the seeds through the link structure, so scores read as
    * "proximity to the trusted set" — the TrustRank/seed-expansion move
    * (grow a curated domain allowlist from a hand-audited core; rank
    * candidate near-dups by their linkage to known-good docs). Seeds hold
    * the 0.15·scale base term and the initial mass; non-seeds start at 0
    * and earn rank only through in-edges. Same scaled-BIGINT arithmetic,
    * damping, dangling-mass contract and overflow bound as
    * [[pagerankScaled]] — with `seeds` = all of `nodes` the two are
    * bit-identical (spec-pinned), so this is a strict generalization.
    * Emits (idCol, is_seed, rank_scaled).
    */
  def personalizedPagerankScaled(
      pairs: DataFrame,
      nodes: DataFrame,
      seeds: DataFrame,
      aCol: String,
      bCol: String,
      idCol: String,
      iters: Int = 5,
      scale: Option[Long] = None,
      checkpointEvery: Int = 0): DataFrame = {
    // same pre-symmetrization persist + src pre-partitioning as
    // [[pagerankScaled]] — one upstream evaluation, and the per-round
    // contribution join reads the cached layout instead of re-exchanging
    // the edge list every iteration
    val p0 = Caches.trackPersist(
      pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst")))
    val edges = Caches.trackPersist(
      p0.union(p0.select(col("dst").as("src"), col("src").as("dst"))).distinct()
        .repartition(col("src")))
    val deg = Caches.trackPersist(edges.groupBy("src").agg(count(lit(1)).as("deg")))
    val seedIds = seeds.select(col(idCol).cast("long").as("id")).distinct()
      .withColumn("__s", lit(1L))
    // (id, is_seed) — referenced once per iteration plus the seed frame;
    // id-partitioned so the per-round resurrect join is exchange-free
    // (see pagerankScaled)
    val ids = Caches.trackPersist(
      nodes.select(col(idCol).cast("long").as("id"))
        .join(seedIds, Seq("id"), "left")
        .select(col("id"), coalesce(col("__s"), lit(0L)).as("is_seed"))
        .repartition(col("id")))
    val n = math.max(ids.count(), 1L)
    val sc = scale.getOrElse(derivedScale(n))
    require(
      sc >= 100 && sc % 100 == 0 && sc <= Long.MaxValue / 85L / n,
      s"scale $sc overflows 85*n*scale at n=$n (max ${Long.MaxValue / 85L / n}); " +
        "use derivedScale or pass a smaller scale")
    val base = when(col("is_seed") === 1L, lit(15L * sc / 100)).otherwise(lit(0L))
    var ranks = ids.select(
      col("id"),
      when(col("is_seed") === 1L, lit(sc)).otherwise(lit(0L)).as("rank_scaled"))
    (1 to iters).foreach { i =>
      // node-sized deg join + src-partitioned edge join — see
      // pagerankScaled (identical per-edge integers, fewer shuffled bytes)
      val srcC = deg
        .join(ranks.select(col("id").as("src"), col("rank_scaled")), "src")
        .select(col("src"), expr("rank_scaled DIV deg").as("c"))
      val contrib = edges
        .join(srcC, "src")
        .select(col("dst").as("id"), col("c"))
        .groupBy("id")
        .agg(sum(col("c")).as("s"))
      ranks = ids
        .join(contrib, Seq("id"), "left")
        .select(
          col("id"),
          (base + expr("85 * coalesce(s, 0L) DIV 100")).as("rank_scaled"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint()
    }
    ids.join(ranks, "id").select(col("id"), col("is_seed"), col("rank_scaled"))
  }

  /** Exact triangle census over an UNDIRECTED distinct pair list
    * (`aCol < bCol`, one row per edge — [[graft.ops.Dedup.jaccardPairs]]'
    * output shape): one summary row with the edge count, wedge count
    * (Σ d(d−1)/2 — straight off the degree table, never materialized as
    * rows), triangle count, and the global clustering coefficient
    * 3T/wedges (NULL when the graph has no wedge). Triangles measure how
    * clique-like the near-dup neighborhoods are — transitive duplication
    * (a~b, b~c ⇒ a~c) shows up as clustering near 1, drift chains near 0.
    *
    * Scale shape — the standard orientation bound: each edge is directed
    * from its (degree, id)-smaller endpoint, which makes the edge DAG's
    * out-degree O(√m) for ANY degree distribution, so the wedge self-join
    * enumerates Σ outdeg² = O(m^1.5) candidates instead of the Σ d²
    * blow-up a hub key would cause on the raw edge list (the same
    * hot-key argument as the banded-LSH candidate bound). Inside a
    * triangle the orientation DAG has exactly one node with out-degree 2,
    * so the wedge→closing-edge join counts each triangle exactly once —
    * no /3 correction, no dedup pass. All-integer arithmetic; the one
    * closing division is a single IEEE op both engines share.
    */
  def triangles(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    // the edge list is consumed four times (degrees, orientation, census) and
    // upstream it is typically an expensive dedup-pair pipeline — persist it
    // once or every reuse replays the whole chain (measured on g2 at sf0.1:
    // 18.5 s / 157 stages unpersisted vs 5.9 s cold-session persisted)
    val e0 = Caches.trackPersist(
      pairs.select(col(aCol).cast("long").as("ea"), col(bCol).cast("long").as("eb")))
    // NOTE (r14 bench): persisting deg (3 plan branches) was tried and
    // LOST (g2 wall 3.0 → 4.7 s at sf0.1) — each branch's recompute is one
    // cheap groupBy over the already-persisted e0, while the persist adds
    // a blocking materialization job and degrades the orientation joins'
    // broadcast planning (no stats on the cached frame)
    val deg = e0.select(col("ea").as("v")).union(e0.select(col("eb").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val withDeg = e0
      .join(deg.select(col("v").as("ea"), col("d").as("da")), "ea")
      .join(deg.select(col("v").as("eb"), col("d").as("db")), "eb")
    val o = withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("ea") < col("eb")),
        col("ea")).otherwise(col("eb")).as("u"),
      when(col("da") < col("db") || (col("da") === col("db") && col("ea") < col("eb")),
        col("eb")).otherwise(col("ea")).as("v"))
    // pre-partitioned on u: the wedge enumeration self-joins oP on u, so
    // both sides read the cached layout and the join plans NO exchange
    // (guide §2.4) — before this, each side of the self-join re-exchanged
    // the oriented edge list
    val oP = Caches.trackPersist(o.repartition(col("u")))
    val wedges = oP.as("e1")
      .join(oP.as("e2"), col("e1.u") === col("e2.u") && col("e1.v") =!= col("e2.v"))
      .select(col("e1.v").as("x"), col("e2.v").as("y"))
    val tri = wedges
      .join(oP.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val nEdges = e0.agg(count(lit(1)).as("n_edges"))
    val nWedges = deg.agg(sum(expr("d * (d - 1) DIV 2")).as("n_wedges"))
    nEdges.crossJoin(nWedges).crossJoin(tri)
      .select(
        col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") > 0,
          (lit(3L) * col("n_triangles")).cast("double") / col("n_wedges").cast("double"))
          .as("clustering"))
  }

  /** Fixed-round k-core peeling: nodes of the `rounds`-times-peeled graph
    * whose degree is still ≥ k, with that degree — the dense-cluster
    * extractor over the near-dup pair graph (a k-core is a maximal
    * subgraph where everyone has ≥ k in-core neighbors: template
    * boilerplate families and mirror farms show up as cores; chains and
    * stars don't).
    *
    * FIXED rounds, not run-to-convergence: peeling is monotone (each
    * round only removes nodes) and idempotent at the fixed point, so
    * extra rounds are no-ops and both engines running the same `rounds`
    * agree bit-for-bit whether or not the peel has converged — the same
    * move as the unrolled PageRank chain, chosen so the oracle needs no
    * plan-time convergence scalar. A diameter-ish `rounds` (default 8)
    * converges real dup graphs; the semantic is "the rounds-peeled
    * approximation from above" by contract.
    *
    * Scale shape: per round one degree groupBy + two semi-joins on the
    * node id — everything shuffles on v, nothing quadratic, and the edge
    * frame shrinks monotonically; `localCheckpoint` per round bounds the
    * nested-plan growth exactly as [[pagerankScaled]]'s hygiene does.
    */
  def kcore(pairs: DataFrame, aCol: String, bCol: String, k: Int, rounds: Int = 8): DataFrame = {
    require(k >= 1 && rounds >= 1, s"bad kcore config: k=$k rounds=$rounds")
    var e = Caches.trackPersist(
      pairs.select(col(aCol).cast("long").as("ea"), col(bCol).cast("long").as("eb")))
    def degrees(edges: DataFrame) =
      edges.select(col("ea").as("v")).union(edges.select(col("eb").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
    for (_ <- 1 to rounds) {
      val keep = degrees(e).filter(col("d") >= k).select("v")
      e = e
        .join(keep.withColumnRenamed("v", "ea"), Seq("ea"), "left_semi")
        .join(keep.withColumnRenamed("v", "eb"), Seq("eb"), "left_semi")
        .localCheckpoint(true)
    }
    degrees(e).filter(col("d") >= k)
      .select(col("v"), col("d").as("core_degree"))
  }

  /** Fixed-round synchronous label propagation — community detection over
    * the near-dup pair graph (the cluster-refinement complement of
    * [[graft.ops.Dedup.connectedComponents]]: CC merges everything
    * reachable; LPA splits a component along its dense regions, so a
    * bridge edge between two template families doesn't fuse them). Every
    * node starts labeled with its own id; each round it adopts the MODE of
    * its neighbors' labels, ties broken by the smallest label — integer
    * counts and a total (count desc, label asc) order, so every round is
    * deterministic in both engines.
    *
    * FIXED rounds by contract, not run-to-convergence: synchronous LPA can
    * 2-cycle on bipartite structures, so "the rounds-th iterate" is the
    * well-defined cross-engine semantic (the same move as the unrolled
    * PageRank chain and the fixed-round k-core peel); a diameter-ish
    * `rounds` settles real dup webs, whose communities are small and
    * dense.
    *
    * Scale shape: per round one edge-sized join on the node id + one
    * (node, label) groupBy + a per-node `row_number = 1` argmax that plans
    * as Partial+Final WindowGroupLimit (map-side pre-prune — a hot node
    * never ships all its candidate labels through one task); edges persist
    * once, `localCheckpoint` per round bounds the nested-plan growth
    * exactly like [[pagerankScaled]]. Isolated nodes have no edges and are
    * absent by construction (stated; CC makes them singletons instead).
    */
  def labelPropagation(pairs: DataFrame, aCol: String, bCol: String, rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"bad lpa config: rounds=$rounds")
    // pre-symmetrization persist: see [[pagerankScaled]]; src-partitioned
    // for the same reason — each round joins e on src, so the cached
    // layout replaces a per-round edge-sized exchange (the label seed's
    // distinct also rides it for free)
    val p0 = Caches.trackPersist(
      pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst")))
    val e = Caches.trackPersist(
      p0.union(p0.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(col("src")))
    var lbl = e.select(col("src").as("id")).distinct().withColumn("lbl", col("id"))
    for (_ <- 1 to rounds) {
      val cnt = e.join(lbl.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"), col("lbl"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("id").orderBy(col("c").desc, col("lbl"))
      lbl = cnt.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("id", "lbl")
        .localCheckpoint(true)
    }
    lbl.select(col("id").as("v"), col("lbl").as("community"))
  }
}
