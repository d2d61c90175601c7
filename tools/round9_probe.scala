// Warm 2-round probe of the registered d7/d6/o6 compositions at sf0.1
// (judge-clean timings for BASELINE.md). Forcing = xxhash64 over ALL
// output columns, same as Bench.
import org.apache.spark.sql.functions.{col, sum => fsum, xxhash64}
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
val sfDir = "/root/testdata/sf0.1"
def force(name: String): Double = {
  val t0 = System.nanoTime()
  val out = graft.SparkEntry.queries(name)(spark, sfDir)
  out.select(xxhash64(out.columns.toIndexedSeq.map(col): _*).cast("double").as("h")).agg(fsum("h")).collect()
  graft.ops.Caches.releaseAll()
  (System.nanoTime() - t0) / 1e9
}
// warm the scan + JIT once on each table the probes touch
Seq("documents").foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
force("d7_dup_clusters"); force("d6_shared_spans"); force("o6_skyline")
for (r <- 1 to 2; q <- Seq("d7_dup_clusters", "d6_shared_spans", "o6_skyline")) {
  println(f"PROBE round=$r $q%-18s ${force(q)}%8.2f s")
}
// o6 decomposition: bare scan+tokenize projection vs the full skyline
import org.apache.spark.sql.functions._
def nTypesScan(): Double = {
  val t0 = System.nanoTime()
  val docs = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("n_chars"), size(array_distinct(split(trim(coalesce(col("text"), lit(""))), " "))).cast("long").as("n_types"))
  docs.select(xxhash64(col("doc_id"), col("n_chars"), col("n_types")).cast("double").as("h")).agg(fsum("h")).collect()
  (System.nanoTime() - t0) / 1e9
}
nTypesScan()
for (r <- 1 to 2) println(f"PROBE round=$r o6_scan_only       ${nTypesScan()}%8.2f s")
System.exit(0)
