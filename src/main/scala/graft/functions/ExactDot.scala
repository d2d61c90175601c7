package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Exact decimal-quantized dot product of two float or double arrays as a
  * native Catalyst expression with codegen (float elements widen exactly to
  * double, so both element types share one quantize-and-sum path).
  *
  * Semantics are IDENTICAL to the composed form
  * `aggregate(zip_with(a, b, (x,y) -> cast(x*y as DECIMAL(30,scale))), 0, +)
  * .cast(double)`: each double product is quantized at `scale` via the same
  * shortest-repr HALF_UP rounding Spark's Cast applies
  * (`BigDecimal.valueOf(double)` = `new BigDecimal(Double.toString(d))`),
  * the quantized unscaled values accumulate in an exact long, and the final
  * decimal→double conversion uses the same BigDecimal.doubleValue path as
  * `Decimal.toDouble` — so results stay bit-identical to the DuckDB oracle.
  *
  * Why it exists: Spark's higher-order-function lambdas (`zip_with`,
  * `aggregate`) are interpreted per element and allocate per step — the
  * measured hot path of every similarity query. This expression is one
  * tight loop per row, inlined into whole-stage codegen.
  *
  * Domain bound (documented, not checked per element): |xᵢ·yᵢ|·10^scale·n
  * must stay below 2^63; at scale 9 that is |x·y| sums up to ~9e9 — far
  * above unit-norm embedding magnitudes.
  */
case class ExactDot(left: Expression, right: Expression, scale: Int)
    extends BinaryExpression {

  // inputs are ArrayType(FloatType | DoubleType) — float elements widen
  // exactly to double, so both element types share one quantize-and-sum path
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    }
    if (!ok(left) || !ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"exact_dot expects array<float> or array<double> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    else if (scale < 0 || scale > 18)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"exact_dot scale must be in [0, 18], got $scale")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  private def elemIsDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExactDot.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], scale,
      elemIsDouble(left), elemIsDouble(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""
         |java.lang.Double $tmp = graft.functions.ExactDot.compute(
         |  $a, $b, $scale, ${elemIsDouble(left)}, ${elemIsDouble(right)});
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ExactDot {
  private val Pow10 = Array.tabulate(19)(i => math.pow(10, i))

  /** Quantize `p` at `scale` exactly as Cast(double→decimal) does (shortest
    * decimal repr, HALF_UP). Fast path: plain double arithmetic decides
    * whenever the scaled value sits further than 1e-6 from a .5 boundary —
    * there the double-multiply error and the repr-vs-binary difference
    * cannot flip the rounding. That soundness argument needs the relative
    * double error (~2e-16·|scaled|) to stay below the 1e-6 margin, i.e.
    * |scaled| < ~4e9 (at scale 9: |product| ≲ 4 — above unit-norm embedding
    * dot products but reachable via the public exact_dot SQL function), so
    * the guard is 4e9, NOT the 2^52 integer-exactness bound; anything larger
    * takes the BigDecimal slow path, which is exact at every magnitude.
    * Within the margin (~2e-6 of random inputs) the slow path reproduces the
    * reference semantics including repr-tail ties.
    */
  def quantize(p: Double, scale: Int): Long = {
    val scaled = p * Pow10(scale)
    val fl = math.floor(scaled)
    val frac = scaled - fl
    if (math.abs(scaled) < 4e9 && math.abs(frac - 0.5) > 1e-6) {
      if (frac > 0.5) fl.toLong + 1L else fl.toLong
    } else {
      java.math.BigDecimal.valueOf(p)
        .setScale(scale, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    }
  }

  /** Shared by interpreted eval and generated code. Returns null on length
    * mismatch, null elements, or non-finite products (mirroring zip_with
    * null propagation and the non-ANSI NaN→decimal cast). `aDouble`/
    * `bDouble` select the element accessor per side.
    */
  def compute(
      a: ArrayData,
      b: ArrayData,
      scale: Int,
      aDouble: Boolean,
      bDouble: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sum = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      val p = x * y
      if (!java.lang.Double.isFinite(p)) return null
      sum += quantize(p, scale)
      i += 1
    }
    // same conversion as Decimal.toDouble
    java.lang.Double.valueOf(
      new java.math.BigDecimal(java.math.BigInteger.valueOf(sum), scale).doubleValue())
  }

  /** Plain-JVM-array twin of [[compute]] — IDENTICAL quantize-and-sum
    * arithmetic (same [[quantize]], same unscaled-long accumulator, same
    * BigDecimal.doubleValue conversion), for call sites that score against
    * a broadcast model driver/executor-side in a closure (e.g.
    * [[graft.streaming.Streaming.semanticDedupStream]]'s centroid routing)
    * rather than through the Catalyst expression. Inputs are already-
    * widened doubles (float→double widening is exact, so an upstream
    * `cast(array<double>)` preserves bit parity with the float element
    * path of [[compute]]). Returns null on length mismatch or non-finite
    * products, mirroring [[compute]].
    */
  def computeArrays(a: Array[Double], b: Array[Double], scale: Int): java.lang.Double = {
    val n = a.length
    if (n != b.length) return null
    var sum = 0L
    var i = 0
    while (i < n) {
      val p = a(i) * b(i)
      if (!java.lang.Double.isFinite(p)) return null
      sum += quantize(p, scale)
      i += 1
    }
    java.lang.Double.valueOf(
      new java.math.BigDecimal(java.math.BigInteger.valueOf(sum), scale).doubleValue())
  }

  /** Column-level entry point (scale 9 — see [[graft.ops.Vectors]]). */
  def apply(a: Column, b: Column): Column = ofScale(a, b, 9)

  /** Column-level entry point with explicit quantization scale. */
  def ofScale(a: Column, b: Column, scale: Int): Column =
    GraftColumnBridge.column(
      ExactDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), scale))
}
