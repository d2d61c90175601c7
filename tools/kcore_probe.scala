// round-8 probe: Graph.kcore fixed-round peel at graph scale — 1M nodes /
// ~2M random edges (the pagerank probe's shape), k=3, 8 rounds. Warmed
// (one throwaway smaller run), then 2 timed rounds.
import org.apache.spark.sql.functions._
val edges = spark.range(2000000L).select(pmod(hash(col("id")), lit(1000000)).cast("long").as("a"), pmod(hash(col("id") + 31), lit(1000000)).cast("long").as("b")).filter(col("a") =!= col("b")).localCheckpoint(true)
def run(k: Int): (Long, Long) = { val t0 = System.nanoTime; val n = graft.ops.Graph.kcore(edges, "a", "b", k, rounds = 8).count(); graft.ops.Caches.releaseAll(); ((System.nanoTime - t0) / 1000000, n) }
run(3)
val r1 = run(3); val r2 = run(3)
println("KCORE(1M nodes, 2M edges, k=3, 8 rounds) ms: " + Seq(r1._1, r2._1).mkString(", ") + " core nodes: " + r1._2)
System.exit(0)
