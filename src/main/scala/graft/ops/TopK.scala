package graft.ops

import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, AttributeReference, Descending, Expression, SortOrder
}
import org.apache.spark.sql.types.LongType

import graft.plans.{TopKPerKeyNode, TopKPerKeyStrategy}

/** Top-k rows per key via the custom heap operator
  * ([[graft.plans.TopKPerKeyExec]]) — same output as
  * `row_number().over(partitionBy(keys).orderBy(order)) <= k`, without
  * sorting whole partitions. Registers the planner strategy on the
  * session on first use (also injectable cluster-wide via
  * `spark.sql.extensions=graft.GraftExtensions`).
  *
  * `orderBy` entries are (columnName, descending) — attributes are
  * resolved against the frame directly (catalyst SortOrder, ASC↔nulls
  * first / DESC↔nulls last, Spark's window defaults).
  */
object TopK {

  def perKey(
      df: DataFrame,
      groupCols: Seq[String],
      orderBy: Seq[(String, Boolean)],
      k: Int,
      rankCol: String = "rnk"): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val child = df.queryExecution.analyzed
    val resolver = spark.sessionState.analyzer.resolver
    def attr(n: String) = child.output.find(a => resolver(a.name, n)).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not found among ${child.output.map(_.name).mkString(", ")}"))
    // float/double group keys must be normalized (0.0 == -0.0, one NaN):
    // the optimizer rule that does this for Window/Aggregate partition keys
    // (NormalizeFloatingNumbers) never visits a custom logical node, and
    // the exec compares keys as raw UnsafeRow bytes
    val group: Seq[Expression] = groupCols.map(attr).map { a =>
      a.dataType match {
        case org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType =>
          org.apache.spark.sql.catalyst.optimizer.NormalizeNaNAndZero(a)
        case _ => a
      }
    }
    val order = orderBy.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    val rankAttr = AttributeReference(rankCol, LongType, nullable = false)()
    GraftColumnBridge.dataset(spark, TopKPerKeyNode(group, order, k, rankAttr, child))
  }
}
