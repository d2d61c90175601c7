// round-8 probe: Stats.cusumChangepoint chunked two-phase scan vs the
// direct single-window-per-key form, hot-key regime (3 keys x 10M rows).
// Warm both shapes first, then time 2 rounds each (cold single-shot
// comparisons are ordering noise — CLAUDE.md probe rules).
import org.apache.spark.sql.functions._
val n = 30000000L
val df = spark.range(n).select((col("id") % 3).cast("string").as("k"), col("id").as("i"), (sin(col("id").cast("double") / 1000.0) * 100.0 + when(col("id") > lit(n / 2), 25.0).otherwise(0.0)).as("v")).localCheckpoint(true)
def run(chunk: org.apache.spark.sql.Column): (Long, String) = { val t0 = System.nanoTime; val r = graft.ops.Stats.cusumChangepoint(df, Seq("k"), Seq(col("i")), "v", chunk = chunk, carry = Seq("i")).collect().map(_.toString).sorted.mkString("|"); ((System.nanoTime - t0) / 1000000, r) }
run(lit(0L)); run(expr("i DIV 30000"))
val d1 = run(lit(0L)); val d2 = run(lit(0L))
val c1 = run(expr("i DIV 30000")); val c2 = run(expr("i DIV 30000"))
println("DIRECT ms: " + Seq(d1._1, d2._1).mkString(", "))
println("CHUNKED ms: " + Seq(c1._1, c2._1).mkString(", "))
println("EQUAL: " + (d1._2 == c1._2))
println("RESULT: " + c1._2)
System.exit(0)
