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
}
