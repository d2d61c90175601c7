// exactQuantiles distinct-cardinality regime probe (round 9): 10M rows,
// one group. Continuous measure (all-distinct doubles) vs the same values
// quantized to a 0.01 grid (the binaryAuc.scoreScale move). Warm, 2 timed
// rounds each (cold single-shot A-vs-B is ordering noise — CLAUDE.md).
import org.apache.spark.sql.functions._
val n = 10000000L
// deterministic pseudo-values off the id hash, uniform in [0, 1000)
val base = spark.range(n).select(
  (pmod(xxhash64(col("id")), lit(1000000000L)).cast("double") / 1e6).as("v"))
  .localCheckpoint(true)
def time(label: String)(f: => Unit): Unit = {
  val t0 = System.nanoTime(); f
  println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%8.2f s")
}
def run(df: org.apache.spark.sql.DataFrame): Unit = {
  graft.ops.Stats.exactQuantiles(df.withColumn("__g", lit(0)), Seq("__g"), "v", Seq(0.25, 0.5, 0.9)).collect()
}
val quantized = base.select((floor(col("v") * 100.0) / 100.0).as("v")).localCheckpoint(true)
run(base); run(quantized) // warm both shapes
for (r <- 1 to 2) { time(s"round=$r continuous_10M_distinct")(run(base)); time(s"round=$r quantized_100k_distinct")(run(quantized)) }
println("DISTINCTS " + base.select(countDistinct(col("v"))).first.getLong(0) + " vs " + quantized.select(countDistinct(col("v"))).first.getLong(0))
System.exit(0)
