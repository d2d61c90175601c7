// round-8 probe: Linkage.blockedPairs block purging under boilerplate-hot
// blocks. Corpus: 1M docs forming 100k COLD blocks of 10 members each
// (every in-block pair within maxDist -> 4.5M genuinely scored+emitted
// pairs), plus a 200k-member hot block ("untitled document" boilerplate)
// and a 6k-member "planted pair key" block — both beyond maxBlock=100, so
// capped runs purge them for the cost of one census row each. The
// uncapped reference regime runs on a SMALLER variant (5k hot + 6k
// planted = 30.5M in-block pairs) because the 200k block alone is 2e10
// levenshtein pairs — the cliff itself. Warmed, 2 timed rounds capped.
import org.apache.spark.sql.functions._
val base = spark.range(1000000L).select(col("id").as("doc_id"), concat(lit("doc "), (col("id") % 100000).cast("string"), lit(" body text segment "), col("id").cast("string"), lit(" tail tail tail tail")).as("text"))
val hot = spark.range(1000000L, 1200000L).select(col("id").as("doc_id"), concat(lit("untitled document "), col("id").cast("string"), lit(" lorem ipsum dolor sit amet")).as("text"))
val planted = spark.range(3000L).select((col("id") + 2000000L).as("doc_id"), concat(lit("planted pair key "), col("id").cast("string"), lit(" alpha beta gamma")).as("text"))
val planted2 = spark.range(3000L).select((col("id") + 3000000L).as("doc_id"), concat(lit("planted pair key "), col("id").cast("string"), lit(" alpha beta gamme")).as("text"))
val df = base.unionByName(hot).unionByName(planted).unionByName(planted2).localCheckpoint(true)
def run(in: org.apache.spark.sql.DataFrame, cap: Int): (Long, Long) = { val t0 = System.nanoTime; val n = graft.ops.Linkage.blockedPairs(in, "doc_id", "text", blockLen = 16, titleLen = 40, maxDist = 12, maxBlock = cap).count(); ((System.nanoTime - t0) / 1000000, n) }
run(df, 100)
val c1 = run(df, 100); val c2 = run(df, 100)
println("CAPPED(1.206M docs, 200k-hot block purged) ms: " + Seq(c1._1, c2._1).mkString(", ") + " pairs: " + c1._2)
val small = base.unionByName(hot.limit(5000)).unionByName(planted).unionByName(planted2).localCheckpoint(true)
run(small, 100)
val s1 = run(small, 100)
println("CAPPED(5k hot) ms: " + s1._1 + " pairs: " + s1._2)
val u1 = run(small, Int.MaxValue)
println("UNCAPPED(5k hot = 12.5M pairs in one block) ms: " + u1._1 + " pairs: " + u1._2)
System.exit(0)
