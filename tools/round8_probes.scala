// Round-8 100x-factor probes for the new operators: bpeMerges,
// containmentPairs, topGramShare, psi. Synthetic deterministic corpora
// (hash-derived, no rand()) shaped like the registry's tables. Run:
//   /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 48g \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=64 \
//     --jars target/scala-2.13/bbdc20submissionspark_2.13-0.1.0.jar \
//     -I tools/round8_probes.scala
import org.apache.spark.sql.functions._

spark.conf.set("spark.sql.session.timeZone", "UTC")

def timed[T](tag: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f; println(f"PROBE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.1f s"); r }
def force(df: org.apache.spark.sql.DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

// 7-letter base-5 words over a..e (real character structure for BPE);
// VAR is substituted with the word-index expression
val wordExpr = "concat(char(97 + VAR % 5), char(97 + (VAR DIV 5) % 5), char(97 + (VAR DIV 25) % 5), char(97 + (VAR DIV 125) % 5), char(97 + (VAR DIV 625) % 5), char(97 + (VAR DIV 3125) % 5), char(97 + (VAR DIV 15625) % 5))"

// 300k docs x 30 tokens from a 50k-type vocab
val docs = spark.range(300000L).select(col("id").as("doc_id"), expr("concat_ws(' ', transform(sequence(1, 30), i -> " + wordExpr.replace("VAR", "(pmod(xxhash64(id * 31 + i), 50000))") + "))").as("text")).persist()
println("docs=" + docs.count() + " sample=" + docs.select("text").first().getString(0).take(60))

// 1. BPE merge learning: corpus scanned once into the word-type histogram,
//    6 rounds over the sub-linear vocab
timed("bpeMerges(6 rounds)") { graft.ops.Text.bpeMerges(docs, "text", 6).collect().foreach(r => println("  rule " + r)) }
graft.ops.Caches.releaseAll()

// 2. containmentPairs at the jaccardPairs probe shape: 3k planted contained
//    docs (every shingle occurs in a host doc) + a df-60k hot shingle
val hot = spark.range(60000L).select((col("id") + 2000000L).as("doc_id"), expr("concat('HOTA HOTB HOTC pad', id)").as("text"))
val contained = spark.range(3000L).select((col("id") + 1000000L).as("doc_id"), expr("concat_ws(' ', transform(sequence(1, 5), i -> " + wordExpr.replace("VAR", "(pmod(xxhash64(id * 7 + i), 50000))") + "))").as("text"))
val hosts = contained.select((col("doc_id") + 1000000L).as("doc_id"), concat(lit("zza zzb zzc "), col("text"), lit(" zzd zze zzf")).as("text"))
val corpus2 = docs.unionByName(hot).unionByName(contained).unionByName(hosts).persist()
println("corpus2=" + corpus2.count())
timed("containmentPairs(df<=50)") { force(graft.ops.Dedup.containmentPairs(corpus2, "doc_id", "text", 3, 0.8, 50)) }
val nPairs = graft.ops.Dedup.containmentPairs(corpus2, "doc_id", "text", 3, 0.8, 50).count()
println("containment pairs=" + nPairs)
graft.ops.Caches.releaseAll()

// 3. topGramShare over the 300k-doc corpus (8.7M bigram occurrences)
timed("topGramShare(k=2)") { force(graft.ops.Text.topGramShare(docs, "doc_id", "text", 2)) }
graft.ops.Caches.releaseAll()

// 3b. bpeEncode: fit 6 rules then encode all 300k docs (pure projection)
timed("bpeEncode(6 rules)") { force(graft.ops.Text.bpeEncode(docs, "doc_id", "text", 6)) }
graft.ops.Caches.releaseAll()

// 4. PSI: 10M-row event-shaped frame, 5 keys, 20 bins; base/cur by id
//    parity with a planted +40 shift so the drift is visible
val ev = spark.range(10000000L).select(expr("concat('t', id % 5)").as("event_type"), expr("CAST(pmod(xxhash64(id), 600) AS DOUBLE) + CASE WHEN id % 2 = 0 THEN CAST(0.0 AS DOUBLE) ELSE CAST(40.0 AS DOUBLE) END").as("value"), col("id")).persist()
println("ev=" + ev.count())
timed("psi(10M rows, 20 bins)") { graft.ops.Stats.psi(ev.filter(col("id") % 2 === 0), ev.filter(col("id") % 2 =!= 0), Seq("event_type"), "value", 0.0, 30.0, 20).orderBy("event_type").collect().foreach(r => println("  " + r)) }
graft.ops.Caches.releaseAll()

// 5. Quality.validate regime probe, 200M-row parquet child (2.8 GB, 5
//    cols incl. a 64-byte payload) / 1M-key parent, warmed + 2 timed
//    rounds (cold-session single-shot numbers on this op were pure
//    ordering noise — a 3x "cliff" that vanished warm): the SPLIT suite
//    (keyless row-local fold + pruned distinct + RI anti-join) vs the
//    naive one-scan-per-constraint suite vs the fused-distinct single
//    aggregate. All three produce the identical all-integer report;
//    expect them within ~15% warm — columnar pruning means per-constraint
//    scans re-read only their own columns, so the fold's wins are job
//    scheduling and non-pruning sources, not parquet bytes.
val dqPath = "/tmp/dq_child_parquet"
spark.range(200000000L).select(
  col("id"),
  expr("CASE WHEN id % 1000000 = 7 THEN NULL ELSE pmod(xxhash64(id), 1100000) END").as("fk"),
  expr("CAST(pmod(xxhash64(id * 7), 500000) AS DOUBLE) / CAST(100.0 AS DOUBLE)").as("price"),
  expr("CASE pmod(xxhash64(id * 13), 3) WHEN 0 THEN 'O' WHEN 1 THEN 'F' ELSE 'P' END").as("status"),
  expr("repeat('x', 64)").as("payload")).write.mode("overwrite").parquet(dqPath)
val child = spark.read.parquet(dqPath)
val parentKeys = spark.range(1000000L).toDF("pk")
val dqChecks = Seq(
  graft.ops.Quality.Check("complete_fk", graft.ops.Quality.failing(col("fk").isNotNull)),
  graft.ops.Quality.Check("range_price", graft.ops.Quality.failing(col("price") > 0 && col("price") <= 2500.0)),
  graft.ops.Quality.Check("domain_status", graft.ops.Quality.failing(col("status").isin("O", "F", "P"))))
child.agg(count(lit(1))).collect() // warm page cache + JIT before timing
var dqSplit: Array[org.apache.spark.sql.Row] = null
for (round <- 1 to 2) {
  println(s"  dq round $round")
  dqSplit = timed(s"dq split (3 jobs) r$round") {
    graft.ops.Quality.validate(child, dqChecks, Some(("unique_id", "id")),
      "fk", parentKeys, "pk", "ri_fk").collect().sortBy(_.getString(0)) }
  timed(s"dq naive (per-constraint) r$round") {
    dqChecks.foreach(c => child.agg(count(lit(1)).as("total"), c.violations.cast("long").as("v")).collect())
    child.select(col("id")).agg((count(lit(1)) - countDistinct(col("id"))).cast("long")).collect()
    child.join(broadcast(parentKeys.select(col("pk").as("fk"))), Seq("fk"), "left_anti").agg(count(lit(1))).collect() }
  timed(s"dq fused-distinct r$round") {
    child.agg(
      count(lit(1)).as("total"),
      (count(lit(1)) - countDistinct(col("id"))).as("vu"),
      graft.ops.Quality.failing(col("fk").isNotNull).as("v0"),
      graft.ops.Quality.failing(col("price") > 0 && col("price") <= 2500.0).as("v1"),
      graft.ops.Quality.failing(col("status").isin("O", "F", "P")).as("v2")).collect() }
}
dqSplit.foreach(r => println("  " + r))

System.exit(0)
