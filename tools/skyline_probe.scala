// round-8 probe: Pareto.skyline2d two-stage distributed prune vs the
// direct single-window form, 10M random integer points. Warmed, 2 timed
// rounds per shape (CLAUDE.md probe rules).
import org.apache.spark.sql.functions._
val df = spark.range(10000000L).select(col("id"), pmod(hash(col("id")), lit(1000000)).cast("long").as("x"), pmod(hash(col("id") + 77), lit(1000000)).cast("long").as("y")).localCheckpoint(true)
def run(b: org.apache.spark.sql.Column): (Long, Set[(Long, Long, Long)]) = { val t0 = System.nanoTime; val r = graft.ops.Pareto.skyline2d(df, "x", "y", b).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet; ((System.nanoTime - t0) / 1000000, r) }
run(lit(0)); run(pmod(col("id"), lit(512)))
val d1 = run(lit(0)); val d2 = run(lit(0))
val c1 = run(pmod(col("id"), lit(512))); val c2 = run(pmod(col("id"), lit(512)))
println("DIRECT ms: " + Seq(d1._1, d2._1).mkString(", "))
println("BUCKETED ms: " + Seq(c1._1, c2._1).mkString(", "))
println("EQUAL: " + (d1._2 == c1._2) + " frontier=" + c1._2.size)
System.exit(0)
