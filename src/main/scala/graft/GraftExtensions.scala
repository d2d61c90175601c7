package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.ExactDot

/** Session extension registering the engine's native SQL functions —
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) makes them available to
  * pure-SQL users:
  *
  *   SELECT exact_dot(a.embedding, b.embedding) FROM ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.exactDotDescriptor)
    // whole-operator extension: heap-based top-k per key
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}

/** Registration helpers usable on an already-built session too. */
object GraftFunctions {
  private def builder(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => ExactDot(a, b, 9)
    case Seq(a, b, s) =>
      val scale = s.eval().asInstanceOf[Number].intValue()
      ExactDot(a, b, scale)
    case other =>
      throw new IllegalArgumentException(s"exact_dot expects 2 or 3 arguments, got ${other.size}")
  }

  val exactDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("exact_dot"),
    new ExpressionInfo(
      classOf[ExactDot].getName,
      null,
      "exact_dot",
      "exact_dot(a, b[, scale]) - order-independent exact decimal dot product of two float arrays",
      ""),
    builder)

  /** Register on a live session (tests, notebooks). */
  def register(spark: SparkSession): Unit = {
    val (ident, info, fb) = exactDotDescriptor
    spark.sessionState.functionRegistry.registerFunction(ident, info, fb)
  }
}
