// State-store backend probe for Streaming.nearDupDedupStream (BASELINE.md
// row "nearDupDedupStream end-to-end"): same 300k-doc / 2,999-planted-dup /
// 3×100k-micro-batch shape as the round-7 probe, run back to back under the
// HDFS-backed (default) and RocksDB state-store providers. Records
// per-batch ingest seconds + the final window-close cost for each.
//
// Run (after `sbt package`):
//   /opt/spark/bin/spark-shell --master "local[32]" \
//     --conf spark.ui.enabled=false --driver-memory 16g \
//     --jars target/scala-2.13/bbdc20submissionspark_2.13-0.1.0.jar \
//     -I tools/rocksdb_probe.scala
//
// NOTE (CLAUDE.md): keep chained expressions on ONE line — spark-shell -I
// treats a line-leading .method as a new statement.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.session.timeZone", "UTC")
spark.sparkContext.setLogLevel("WARN")
implicit val sqlCtx = spark.sqlContext
import spark.implicits._

// 300k docs, ids 0..299999; ids >= 297001 duplicate the text of id-297000
// (1..2999) — same 10-min window, dups arrive two batches after originals.
// 30 deterministic 8-hex tokens per doc (shingleK=3 → 28 shingles/doc).
val base = Timestamp.valueOf("2024-01-01 00:03:00")
def mkBatch(lo: Long, hi: Long): Seq[(Timestamp, Long, String)] = spark.range(lo, hi).select(col("id"), when(col("id") >= 297001L, col("id") - 297000L).otherwise(col("id")).as("tid")).select(col("id"), concat_ws(" ", transform(sequence(lit(0), lit(29)), j => substring(md5(format_string("%d_%d", col("tid"), j)), 1, 8))).as("text")).as[(Long, String)].collect().toSeq.map { case (id, t) => (base, id, t) }

println("materializing corpus batches on the driver...")
val batches = Seq(mkBatch(0L, 100000L), mkBatch(100000L, 200000L), mkBatch(200000L, 300000L))
val closer = Seq((Timestamp.valueOf("2024-01-01 00:20:00"), 999999L, "totally unrelated watermark pusher text with extra words"))

def run(tag: String, provider: String): Unit = {
  spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
  val input = MemoryStream[(Timestamp, Long, String)]
  val df = input.toDF().toDF("ts", "doc_id", "text")
  val out = graft.streaming.Streaming.nearDupDedupStream(df, "ts", "doc_id", "text", shingleK = 3, nHashes = 8, nBands = 4, watermarkDelay = "10 seconds", windowLength = "10 minutes")
  val ckpt = java.nio.file.Files.createTempDirectory(s"probe_ckpt_$tag").toString
  val q = out.writeStream.format("memory").queryName(s"probe_$tag").outputMode("append").option("checkpointLocation", ckpt).start()
  try {
    batches.zipWithIndex.foreach { case (b, i) =>
      val t0 = System.nanoTime()
      input.addData(b: _*)
      q.processAllAvailable()
      println(f"$tag batch${i + 1}: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val t0 = System.nanoTime()
    input.addData(closer: _*)
    q.processAllAvailable()
    println(f"$tag close: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val kept = spark.table(s"probe_$tag").count()
    println(s"$tag kept=$kept (expect 297001)")
  } finally q.stop()
}

run("hdfs", "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
run("rocksdb", "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
System.exit(0)
