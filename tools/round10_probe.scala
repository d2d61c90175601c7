// Round-10 probe: the composed IVF-PQ pipeline at ~100× the registry
// corpus (1M×64-dim vs sf0.1's 2,000 vectors — 500× rows; the two most
// expensive registered queries and the only ones without a BASELINE.md
// 100× row as of round 9). Discipline: warm the scan/JIT first, 2 timed
// rounds, force EVERY output column (xxhash64 checksum, same as Bench),
// quiet box, local[32].
//
// Reported split:
//   fit_coarse   = IvfQuantizer.fitRanked(k=8, iters=2, se=4) forced
//   fit_pq       = grouped 8-subspace fitAssign(k=8, iters=1, se=2) forced
//   full topk    = registered sim_ivfpq_topk (includes both fits + ADC)
//   full recall  = registered sim_ivfpq_recall (adds the exact baseline)
// plus the fixed-sample-size variant (se scaled 100×: coarse se=400,
// PQ se=200 — same ~2.5k/5k fit rows as sf0.1) to demonstrate the
// IvfQuantizer scaladoc claim on the COMPOSED pipeline: Lloyd-pass cost
// is set by the SAMPLE, so growing se with the corpus pins the fit cost
// while only the single broadcast assignment scales with n.
import org.apache.spark.sql.functions._
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

// ---- synthetic corpus: 1M×64 float vectors, 16 hash-anchored clusters +
// per-component uniform noise (deterministic: all pseudo-randomness from
// xxhash64), labels 0..5. Same schema as the driver's embeddings table.
val dir = "/tmp/probe_ivfpq_1m"
val n = 1000000L
val gen = spark.range(n).select(
  col("id").as("vec_id"),
  expr("""transform(sequence(0, 63), j -> CAST(
       (CASE WHEN j = CAST(pmod(xxhash64(id), 16) * 4 AS INT) THEN 4.0 ELSE 0.0 END)
       + (CAST(pmod(xxhash64(id, j), 10000) AS DOUBLE) / 10000.0 - 0.5) AS FLOAT))""").as("embedding"),
  expr("CAST(pmod(xxhash64(id, -1), 6) AS INT)").as("label"))
gen.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
println(s"GEN done: ${spark.read.parquet(s"$dir/embeddings.parquet").count()} vectors")

def force(df: org.apache.spark.sql.DataFrame): Long = {
  val r = df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).cast("double").as("h")).agg(sum("h"), count(lit(1))).collect()
  r(0).getLong(1)
}
def timed(tag: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
  val t0 = System.nanoTime()
  val rows = force(mk)
  graft.ops.Caches.releaseAll()
  val s = (System.nanoTime() - t0) / 1e9
  println(f"PROBE $tag%-28s $s%8.2f s  ($rows rows)")
  s
}

import graft.ops.Vectors
def e0 = {
  val b = spark.read.parquet(s"$dir/embeddings.parquet")
  b.select(col("vec_id"), col("embedding")).withColumn("n2", Vectors.norm2Exact(col("embedding")))
}
def esub = {
  val emb = spark.read.parquet(s"$dir/embeddings.parquet").select(col("vec_id"), col("embedding"))
  val slices = (0 until 8).map(sb => struct(lit(sb).as("sub"), slice(col("embedding"), sb * 8 + 1, 8).as("sv")))
  emb.select(col("vec_id"), explode(array(slices: _*)).as("e")).select(col("e.sub").as("sub"), col("vec_id"), col("e.sv").as("sv")).withColumn("sn2", Vectors.norm2Exact(col("sv")))
}
// warm scan + JIT on every shape once
spark.read.parquet(s"$dir/embeddings.parquet").count()
timed("warmup_fit_coarse")(graft.ml.IvfQuantizer.fitRanked(e0, "vec_id", "embedding", "n2", 8, 2, sampleEvery = 4))

// ---- fit-vs-scoring split, registered parameters (se=4 coarse / se=2 PQ)
for (r <- 1 to 2) {
  timed(s"r$r fit_coarse_se4")(graft.ml.IvfQuantizer.fitRanked(e0, "vec_id", "embedding", "n2", 8, 2, sampleEvery = 4))
  timed(s"r$r fit_pq_se2")(graft.ml.IvfQuantizer.fitAssign(esub, "vec_id", "sv", "sn2", 8, 1, 2, grpCols = Seq("sub")))
}
// ---- fixed-sample variant: se scaled with the corpus (coarse 400 / PQ 200
// → same fit-row count as the sf0.1 registry), full assignment unchanged
for (r <- 1 to 2) {
  timed(s"r$r fit_coarse_se400")(graft.ml.IvfQuantizer.fitRanked(e0, "vec_id", "embedding", "n2", 8, 2, sampleEvery = 400))
  timed(s"r$r fit_pq_se200")(graft.ml.IvfQuantizer.fitAssign(esub, "vec_id", "sv", "sn2", 8, 1, 200, grpCols = Seq("sub")))
}

// ---- the registered compositions, end to end (warmed by the fit runs;
// one full warmup pass each, then 2 timed rounds)
timed("warmup_ivfpq_topk")(graft.SparkEntry.queries("sim_ivfpq_topk")(spark, dir))
for (r <- 1 to 2) timed(s"r$r sim_ivfpq_topk")(graft.SparkEntry.queries("sim_ivfpq_topk")(spark, dir))
timed("warmup_ivfpq_recall")(graft.SparkEntry.queries("sim_ivfpq_recall")(spark, dir))
for (r <- 1 to 2) timed(s"r$r sim_ivfpq_recall")(graft.SparkEntry.queries("sim_ivfpq_recall")(spark, dir))
// recall − topk ≈ the exact-cosine baseline + recall join; also time the
// exact baseline alone for the attribution
for (r <- 1 to 2) {
  val q = e0.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("n2").as("qn2"))
  val c = e0.select(col("vec_id"), col("embedding").as("ce"), col("n2").as("cn2"))
  timed(s"r$r exact_baseline")(c.join(broadcast(q), col("vec_id") =!= col("query_id")).withColumn("cos", Vectors.cosineFrom(Vectors.dotExact(col("qe"), col("ce")), col("qn2"), col("cn2"))).withColumn("rnk", row_number().over(org.apache.spark.sql.expressions.Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))).cast("long")).filter(col("rnk") <= 3).select("query_id", "rnk", "vec_id", "cos"))
}
System.exit(0)
