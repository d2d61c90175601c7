package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._


/** Bucketing = the pre-shuffled join layout for repeated big-big joins at
  * scale: both sides bucketed on the join key join WITHOUT a shuffle
  * exchange on either side. This spec pins the property Catalyst must
  * exhibit for the layout to pay off at 100 TB.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with no shuffle exchange") {
    // warehouse.dir is static — tables land in ./spark-warehouse (gitignored)
    // and are dropped below
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    val orders = (1L to 200L).map(k => (k, s"o$k")).toDF("okey", "opayload")
    val lineitem = (1L to 600L).map(i => (i % 200 + 1, i, i * 1.5)).toDF("okey", "lnum", "price")

    orders.write.bucketBy(8, "okey").sortBy("okey").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "okey").sortBy("okey").saveAsTable("b_lineitem")

    // disable broadcast so the join strategy question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), "okey")
        .groupBy("okey")
        .agg(count(lit(1)).as("n"), sum(col("price")).as("total"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // neither join input re-shuffles: the only allowed Exchange is the
      // final groupBy's (and even that collapses because grouping = bucket key)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 0, s"expected shuffle-free bucketed join, plan:\n$plan")
      assert(joined.count() == 200)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("writeSortedRanges produces disjoint per-file key ranges and a pruning scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ranges").toString
    val df = (0L until 4000L).map(i => ((i * 2654435761L) % 4000, i)).toDF("ts", "payload")
    Sources.writeSortedRanges(df, dir, 8, Seq("ts"))
    // per-file min/max must be disjoint: that is what makes parquet
    // row-group stats prune selective scans
    val spans = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
      .map { f =>
        val one = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col("ts")), max(col("ts"))).collect()(0)
        (one.getLong(0), one.getLong(1))
      }
      .sortBy(_._1)
    assert(spans.length > 1)
    spans.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi < lo2, s"overlapping file ranges: ${spans.mkString(", ")}")
    }
    // a selective read touches a subset of files via pushed filters
    val sel = spark.read.parquet(dir).filter(col("ts") < 100)
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), LessThan(ts,100)]"),
      s"filter not pushed:\n$plan")
    assert(sel.count() == 100)
  }

  test("writePartitioned prunes at the catalog level: PartitionFilters, subset dirs read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hivepart").toString
    val langs = Seq("en", "fr", "de", "es")
    val df = (0L until 400L).map(i => (i, langs((i % 4).toInt), i * 3))
      .toDF("doc_id", "lang", "payload")
    Sources.writePartitioned(df, dir, Seq("lang"))
    // hive layout: one lang=<value>/ directory per partition value
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == langs.map(l => s"lang=$l").sorted)
    val sel = spark.read.parquet(dir).filter(col("lang") === "fr")
    val plan = sel.queryExecution.executedPlan.toString
    // the predicate must land in PartitionFilters (catalog-level pruning,
    // before any file opens) — NOT in PushedFilters (row-group stats)
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), s"not partition-pruned:\n$plan")
    assert(sel.count() == 100)
    // round trip preserves content (partition col rematerializes from the path)
    assert(spark.read.parquet(dir).count() == 400)
  }

  test("retentionSweep drops exactly the below-cutoff partitions, guards the empty sweep") {
    val dir = java.nio.file.Files.createTempDirectory("graft_retention").toString
    val days = Seq("2024-01-05", "2024-01-06", "2024-01-07", "2024-01-08")
    val df = (0L until 400L).map(i => (i, days((i % 4).toInt), i * 3))
      .toDF("doc_id", "dt", "payload")
    Sources.writePartitioned(df, dir, Seq("dt"))
    // drop everything before the 7th: two partitions go, two stay
    val dropped = Sources.retentionSweep(spark, dir, "dt", keepFrom = "2024-01-07")
    assert(dropped == Seq("2024-01-05", "2024-01-06"))
    val left = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(left.toSeq == Seq("dt=2024-01-07", "dt=2024-01-08"))
    assert(spark.read.parquet(dir).count() == 200)
    // idempotent: nothing below the cutoff remains
    assert(Sources.retentionSweep(spark, dir, "dt", "2024-01-07").isEmpty)
    // a cutoff past every partition refuses without allowEmpty...
    intercept[IllegalArgumentException] {
      Sources.retentionSweep(spark, dir, "dt", "2025-01-01")
    }
    assert(spark.read.parquet(dir).count() == 200) // ...and deleted nothing
    // ...and empties the table when explicitly allowed
    val all = Sources.retentionSweep(spark, dir, "dt", "2025-01-01", allowEmpty = true)
    assert(all == Seq("2024-01-07", "2024-01-08"))
  }

  test("zValue interleaves bits (Morton order)") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L))
      .toDF("x", "y")
      .select(Sources.zValue(col("x"), col("y"), 8).as("z"))
      .as[Long].collect().toSeq
    def morton(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1) << (2 * i + 1)) | (((y >> i) & 1) << (2 * i))).sum
    assert(rows == Seq(morton(0, 0), morton(1, 0), morton(0, 1), morton(3, 5), morton(255, 255)))
    assert(morton(1, 0) == 2L && morton(0, 1) == 1L)
  }

  test("writeZOrdered gives every file a small bounding box in BOTH dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // 64x64 uniform grid, shuffled ingest order
    val df = (0L until 4096L).map { i =>
      val p = (i * 2654435761L) % 4096
      (p % 64, p / 64, i)
    }.toDF("x", "y", "payload")
    Sources.writeZOrdered(df, dir, 16, "x", "y", bits = 6)
    val boxes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col("x")), max(col("x")), min(col("y")), max(col("y"))).collect()(0)
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
    assert(boxes.length == 16)
    // 16 files over a 64x64 z-curve = a 4x4 grid of 16x16 boxes: a scan
    // filtered on EITHER dimension's first quarter overlaps only ~1/4 of
    // the files — the property a single-key sort cannot give both keys
    val hitX = boxes.count { case (x0, _, _, _) => x0 < 16 }
    val hitY = boxes.count { case (_, _, y0, _) => y0 < 16 }
    assert(hitX <= 6, s"x-filter overlaps $hitX/16 files: ${boxes.mkString(", ")}")
    assert(hitY <= 6, s"y-filter overlaps $hitY/16 files: ${boxes.mkString(", ")}")
    // layout change must not lose rows
    assert(spark.read.parquet(dir).count() == 4096)
    assert(spark.read.parquet(dir).agg(sum(col("payload"))).as[Long].head()
      == (0L until 4096L).sum)
  }

  test("writeZOrdered on empty input writes an empty table (no NPE on NULL bounds)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zempty").toString + "/t"
    val df = Seq.empty[(Long, Long, Long)].toDF("x", "y", "payload")
    Sources.writeZOrdered(df, dir, 4, "x", "y", bits = 6)
    val back = spark.read.parquet(dir)
    assert(back.count() == 0 && back.columns.toSeq == Seq("x", "y", "payload"))
  }

  test("compactParquet fails loudly when the input has no parquet files") {
    // a partitioned tree / wrong path must not silently size to 0 bytes
    // and coalesce the table to ONE file — the opposite of the op's purpose
    val in = java.nio.file.Files.createTempDirectory("graft_noparquet").toString
    val out = in + "_out"
    val e = intercept[IllegalArgumentException] {
      Sources.compactParquet(spark, in, out)
    }
    assert(e.getMessage.contains("no .parquet files"))
  }

  test("compactParquet sizes a PARTITIONED tree via recursive listing") {
    val in = java.nio.file.Files.createTempDirectory("graft_part").toString + "/t"
    val out = java.nio.file.Files.createTempDirectory("graft_partout").toString + "/t"
    (0L until 2000L).map(i => (i % 2, i)).toDF("p", "payload")
      .repartition(10)
      .write.partitionBy("p").parquet(in)
    // files live under p=0/ and p=1/ — a flat local listing sees 0 bytes
    val nOut = Sources.compactParquet(spark, in, out, targetBytes = 4096L)
    assert(nOut > 1, s"partitioned input sized to <= one file: nOut=$nOut")
    assert(spark.read.parquet(out).agg(sum(col("payload"))).as[Long].head()
      == (0L until 2000L).sum)
  }

  test("compactParquet collapses a many-file table, preserves data, restores pruning") {
    val in = java.nio.file.Files.createTempDirectory("graft_frag").toString + "/t"
    val out = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    // simulate micro-batch fragmentation: 40 tiny files
    (0L until 4000L).map(i => ((i * 2654435761L) % 4000, i)).toDF("ts", "payload")
      .repartition(40)
      .write.parquet(in)
    val inFiles = new java.io.File(in).listFiles().count(_.getName.endsWith(".parquet"))
    assert(inFiles == 40)
    val bytes = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val nOut = Sources.compactParquet(spark, in, out,
      targetBytes = bytes / 4, sortCol = Some("ts"))
    val outFiles = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(nOut >= 4 && nOut <= 5 && outFiles == nOut, s"nOut=$nOut outFiles=$outFiles")
    // content identical
    assert(spark.read.parquet(out).agg(sum(col("payload"))).as[Long].head()
      == (0L until 4000L).sum)
    // sorted rewrite restores disjoint per-file ranges (pruning)
    val spans = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col("ts")), max(col("ts"))).collect()(0)
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2)
      case _ => ()
    }
  }
}
