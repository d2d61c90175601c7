// round-10 probe: Graph.labelPropagation fixed-round LPA at graph scale —
// 1M nodes / ~2M random edges (the kcore probe's shape), 3 rounds. The
// per-round shape is an edge-sized join + (node, label) groupBy + a
// WindowGroupLimit argmax, so cost should track the edge count per round
// like the other fixed-round graph ops. Warmed (one throwaway full run),
// then 2 timed rounds; community-count sanity printed.
import org.apache.spark.sql.functions._
val edges = spark.range(2000000L).select(pmod(hash(col("id")), lit(1000000)).cast("long").as("a"), pmod(hash(col("id") + 31), lit(1000000)).cast("long").as("b")).filter(col("a") =!= col("b")).localCheckpoint(true)
def run(): (Long, Long, Long) = { val t0 = System.nanoTime; val out = graft.ops.Graph.labelPropagation(edges, "a", "b", rounds = 3); val n = out.count(); val c = out.select("community").distinct().count(); graft.ops.Caches.releaseAll(); ((System.nanoTime - t0) / 1000000, n, c) }
run()
val r1 = run(); val r2 = run()
println("LPA(1M nodes, 2M edges, 3 rounds) ms: " + Seq(r1._1, r2._1).mkString(", ") + " labeled nodes: " + r1._2 + " communities: " + r1._3)
System.exit(0)
