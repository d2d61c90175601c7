package graft.ops

import org.apache.spark.sql.DataFrame
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
  * frames are persisted once. Overflow bound: Σ contributions ≤ n·10^12,
  * so `85·Σ` stays under 2^63 for corpora up to ~10^5 nodes per connected
  * component's rank mass — at larger n, drop SCALE one decade per 10×.
  */
object Graph {

  val Scale: Long = 1000000000000L // rank 1.0

  /** Fixed-iteration damped PageRank (d=0.85) over an UNDIRECTED pair list.
    * Every node in `nodes` gets a row; nodes with no incident edge hold the
    * base rank 0.15 (dangling mass is dropped, not redistributed — the
    * usual simplification for ranking *within* near-dup neighborhoods,
    * stated here as the contract).
    */
  def pagerankScaled(
      pairs: DataFrame,
      nodes: DataFrame,
      aCol: String,
      bCol: String,
      idCol: String,
      iters: Int = 5): DataFrame = {
    val fwd = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    val rev = pairs.select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst"))
    val edges = Caches.trackPersist(fwd.union(rev).distinct())
    val deg = Caches.trackPersist(
      edges.groupBy("src").agg(count(lit(1)).as("deg")))
    // referenced once per iteration plus the seed — persist, don't rescan
    val ids = Caches.trackPersist(nodes.select(col(idCol).cast("long").as("id")))
    var ranks = ids.withColumn("rank_scaled", lit(Scale))
    (1 to iters).foreach { _ =>
      val contrib = edges
        .join(deg, "src")
        .join(ranks.select(col("id").as("src"), col("rank_scaled")), "src")
        .select(col("dst").as("id"), expr("rank_scaled DIV deg").as("c"))
        .groupBy("id")
        .agg(sum(col("c")).as("s"))
      ranks = ids
        .join(contrib, Seq("id"), "left")
        .select(
          col("id"),
          (lit(150000000000L) + expr("85 * coalesce(s, 0L) DIV 100")).as("rank_scaled"))
    }
    ranks
  }
}
