// round-11 probe (r10 verdict optional #7): Graph.labelPropagation at a
// HOT-NODE regime — the 1M-node/2M-edge random graph PLUS one hub node
// adjacent to 200k distinct spokes. The claim under test: the per-node
// argmax (`row_number = 1` directly over its window) plans as
// Partial+Final WindowGroupLimit, so the hub's 200k candidate (node,
// label) rows pre-prune map-side and never serialize through one window
// task. Warmed (one throwaway full run), then 2 timed rounds; compare
// against the uniform-graph lpa_probe numbers (~3 s/round) — a hot-node
// cliff would show as a multiple of that, not a ~10% delta.
import org.apache.spark.sql.functions._
val rnd = spark.range(2000000L).select(pmod(hash(col("id")), lit(1000000)).cast("long").as("a"), pmod(hash(col("id") + 31), lit(1000000)).cast("long").as("b")).filter(col("a") =!= col("b"))
// hub = node 1000000 (outside the random id space), spokes = 200k distinct nodes
val hub = spark.range(200000L).select(lit(1000000L).as("a"), col("id").as("b"))
val edges = rnd.union(hub).localCheckpoint(true)
def run(): (Long, Long, Long) = { val t0 = System.nanoTime; val out = graft.ops.Graph.labelPropagation(edges, "a", "b", rounds = 3); val n = out.count(); val c = out.select("community").distinct().count(); graft.ops.Caches.releaseAll(); ((System.nanoTime - t0) / 1000000, n, c) }
run()
val r1 = run(); val r2 = run()
println("LPA-HOT(1M+hub nodes, 2M+200k edges, 3 rounds) ms: " + Seq(r1._1, r2._1).mkString(", ") + " labeled nodes: " + r1._2 + " communities: " + r1._3)
// plan check: the argmax of one LPA round must contain WindowGroupLimit
val cnt = edges.select(col("a").cast("long").as("src"), col("b").cast("long").as("dst")).groupBy(col("dst").as("id"), col("src").as("lbl")).agg(count(lit(1)).as("c"))
val w = org.apache.spark.sql.expressions.Window.partitionBy("id").orderBy(col("c").desc, col("lbl"))
val plan = cnt.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).queryExecution.executedPlan.toString
println("WindowGroupLimit in plan: " + plan.contains("WindowGroupLimit"))
System.exit(0)
