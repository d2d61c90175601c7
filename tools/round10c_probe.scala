// Round-10c probe: the END-TO-END SemDeDup keep ledger through the
// two-level hierarchical quantizer (the sim_semantic_dedup_hier shape) at
// 1M×64 — what the ledger stages ADD on top of the round-10b fit cost.
// Same corpus as round10_probe (16 planted clusters + uniform noise:
// same-cluster cosine ≈ 0.75 ≫ the 0.4 threshold, so leaves really do
// carry dup groups and the pair/ledger stages do real work). sampleEvery
// scaled with the corpus per the BASELINE operating rule (se1=400,
// se2=8 — the registered se literals are the test-scale setting). Warm,
// 2 timed rounds, full output-column forcing, local[32].
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.session.timeZone", "UTC")
val dir = "/tmp/probe_ivfpq_1m"
if (!new java.io.File(s"$dir/embeddings.parquet").exists) {
  val gen = spark.range(1000000L).select(
    col("id").as("vec_id"),
    expr("""transform(sequence(0, 63), j -> CAST(
         (CASE WHEN j = CAST(pmod(xxhash64(id), 16) * 4 AS INT) THEN 4.0 ELSE 0.0 END)
         + (CAST(pmod(xxhash64(id, j), 10000) AS DOUBLE) / 10000.0 - 0.5) AS FLOAT))""").as("embedding"),
    expr("CAST(pmod(xxhash64(id, -1), 6) AS INT)").as("label"))
  gen.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
}
println(s"CORPUS ${spark.read.parquet(s"$dir/embeddings.parquet").count()} vectors")

import graft.ops.{Caches, Vectors}
def e0 = {
  val b = spark.read.parquet(s"$dir/embeddings.parquet")
  b.select(col("vec_id"), col("embedding")).withColumn("n2", Vectors.norm2Exact(col("embedding")))
}
// the registered query body with corpus-scaled sampleEvery literals
def ledger = {
  val e = e0
  val k = graft.ml.IvfQuantizer.hierK(1000000L, 64)
  val leaf = Caches.trackPersist(graft.ml.IvfQuantizer.fitAssignHier(
    e, "vec_id", "embedding", "n2", k, 1, se1 = 400, se2 = 8))
  val m = Caches.trackPersist(e.join(leaf, "vec_id"))
  val a = m.select(col("ccell"), col("scell"), col("vec_id").as("query_id"), col("embedding").as("qe"), col("n2").as("qn2"))
  val c = m.select(col("ccell"), col("scell"), col("vec_id"), col("embedding").as("ce"), col("n2").as("cn2"))
  val dup = c.join(a, Seq("ccell", "scell")).filter(col("vec_id") < col("query_id")).withColumn("cos", Vectors.cosineFrom(Vectors.dotExact(col("qe"), col("ce")), col("qn2"), col("cn2"))).filter(col("cos") >= lit(0.4)).groupBy("query_id").agg(min(col("vec_id")).as("kept_by"), count(lit(1)).as("n_dup"), max(col("cos")).as("max_cos")).withColumnRenamed("query_id", "vec_id")
  m.select(col("vec_id")).join(dup, Seq("vec_id"), "left").select(col("vec_id"), col("kept_by").isNull.cast("long").as("keep"), col("kept_by"), col("n_dup"), col("max_cos"))
}
def force(df: org.apache.spark.sql.DataFrame): Long = {
  val r = df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).cast("double").as("h")).agg(sum("h"), count(lit(1))).collect()
  r(0).getLong(1)
}
def timed(tag: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
  val t0 = System.nanoTime()
  val rows = force(mk)
  Caches.releaseAll()
  val s = (System.nanoTime() - t0) / 1e9
  println(f"PROBE $tag%-28s $s%8.2f s  ($rows rows)")
  s
}
// warm scan + JIT
spark.read.parquet(s"$dir/embeddings.parquet").count()
timed("warmup_semdedup_hier")(ledger)
for (r <- 1 to 2) timed(s"r$r semdedup_hier_1m")(ledger)
// drop-rate sanity: the planted clusters make real dup groups, so the
// pair/ledger stages were exercised, not skipped on an empty relation
val l = ledger
val stats = l.agg(count(lit(1)).as("n"), sum("keep").as("kept"), sum("n_dup").as("dup_pairs"), max("n_dup").as("max_claims")).collect()(0)
println(s"LEDGER $stats")
Caches.releaseAll()
System.exit(0)
