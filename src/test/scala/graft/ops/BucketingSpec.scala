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
}
