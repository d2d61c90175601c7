// round-9 probe: pagerankScaled loop body — current shape (edges ⋈ deg ⋈
// ranks per iteration, ids left-join re-shuffled per round) vs a
// loop-invariant-hoisted shape (edges⋈deg pre-joined + repartitioned by
// src and persisted once; ids repartitioned by id and persisted). Warm
// both first, then time 2 rounds each (CLAUDE.md probe rules). Graph shaped
// like a near-dup web scaled up: ~2M nodes, ~4M undirected edges with a
// few hubs.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
val nN = 2000000L
val nE = 4000000L
val pairsRaw = spark.range(nE).select((xxhash64(col("id")) % nN).as("a"), (when(col("id") % 97 === 0, col("id") % 50).otherwise(xxhash64(col("id") + 7) % nN)).as("b")).select(abs(col("a")).as("a_id"), abs(col("b")).as("b_id")).filter(col("a_id") =!= col("b_id")).localCheckpoint(true)
val nodes = spark.range(nN).select(col("id").as("doc_id")).localCheckpoint(true)
val iters = 5
val sc = 1000000L // small scale fine for the probe

def current(): (Long, Long) = {
  val t0 = System.nanoTime
  val fwd = pairsRaw.select(col("a_id").as("src"), col("b_id").as("dst"))
  val rev = pairsRaw.select(col("b_id").as("src"), col("a_id").as("dst"))
  val edges = fwd.union(rev).distinct().persist()
  val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).persist()
  val ids = nodes.select(col("doc_id").as("id")).persist()
  ids.count()
  val base = 15L * sc / 100
  var ranks: DataFrame = ids.withColumn("rank_scaled", lit(sc))
  (1 to iters).foreach { i =>
    val contrib = edges.join(deg, "src").join(ranks.select(col("id").as("src"), col("rank_scaled")), "src").select(col("dst").as("id"), expr("rank_scaled DIV deg").as("c")).groupBy("id").agg(sum(col("c")).as("s"))
    ranks = ids.join(contrib, Seq("id"), "left").select(col("id"), (lit(base) + expr("85 * coalesce(s, 0L) DIV 100")).as("rank_scaled"))
  }
  val chk = ranks.agg(sum(col("rank_scaled"))).collect()(0).getLong(0)
  val ms = (System.nanoTime - t0) / 1000000
  edges.unpersist(); deg.unpersist(); ids.unpersist()
  (ms, chk)
}

def hoisted(): (Long, Long) = {
  val t0 = System.nanoTime
  val fwd = pairsRaw.select(col("a_id").as("src"), col("b_id").as("dst"))
  val rev = pairsRaw.select(col("b_id").as("src"), col("a_id").as("dst"))
  val edges = fwd.union(rev).distinct()
  val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
  val edgesDeg = edges.join(deg, "src").repartition(col("src")).persist()
  val ids = nodes.select(col("doc_id").as("id")).repartition(col("id")).persist()
  ids.count(); edgesDeg.count()
  val base = 15L * sc / 100
  var ranks: DataFrame = ids.withColumn("rank_scaled", lit(sc))
  (1 to iters).foreach { i =>
    val contrib = edgesDeg.join(ranks.select(col("id").as("src"), col("rank_scaled")), "src").select(col("dst").as("id"), expr("rank_scaled DIV deg").as("c")).groupBy("id").agg(sum(col("c")).as("s"))
    ranks = ids.join(contrib, Seq("id"), "left").select(col("id"), (lit(base) + expr("85 * coalesce(s, 0L) DIV 100")).as("rank_scaled"))
  }
  val chk = ranks.agg(sum(col("rank_scaled"))).collect()(0).getLong(0)
  val ms = (System.nanoTime - t0) / 1000000
  edgesDeg.unpersist(); ids.unpersist()
  (ms, chk)
}

current(); hoisted() // warm scan + JIT
val c1 = current(); val c2 = current()
val h1 = hoisted(); val h2 = hoisted()
println("CURRENT ms: " + Seq(c1._1, c2._1).mkString(", "))
println("HOISTED ms: " + Seq(h1._1, h2._1).mkString(", "))
println("EQUAL: " + (c1._2 == h1._2) + " chk=" + c1._2)
System.exit(0)
