package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a native expression: ONE md5 digest per shingle,
  * split into two 64-bit halves (h1, h2), with permutation j derived
  * arithmetically as h1 + j·h2 (mod 2⁶⁴) — the standard Kirsch–Mitzenmacher
  * double-hashing construction. All `nHashes` minima are tracked in one pass
  * over the array, per row, inside whole-stage codegen. No explode, no
  * groupBy: signature computation is embarrassingly parallel map work, and
  * only the (tiny) banded candidate join shuffles. Versus seeded re-digesting
  * ("j:shingle" × nHashes) this does 1/nHashes of the digest work.
  *
  * Cross-engine determinism: the halves replicate DuckDB 1.0's
  * `md5_number_lower` (little-endian uint64 of digest bytes 8..15) and
  * `md5_number_upper` (little-endian of bytes 0..7); Java's wrapping Long
  * add/multiply IS arithmetic mod 2⁶⁴; minima compare unsigned; the output
  * renders each minimum as a zero-padded 20-digit unsigned decimal string so
  * string equality/concat downstream (band hashing) agree byte-for-byte with
  * the oracle's `lpad(CAST(v AS VARCHAR), 20, '0')`.
  */
case class MinHashSig(child: Expression, nHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], nHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.MinHashSig.compute($a, $nHashes);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {

  /** Little-endian uint64 of 8 digest bytes starting at `off` — the byte
    * order DuckDB's md5_number_lower/upper use.
    */
  private def le64(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) {
      v = (v << 8) | (d(off + i) & 0xffL)
      i -= 1
    }
    v
  }

  /** Zero-padded 20-digit unsigned decimal rendering of a 64-bit value —
    * byte-identical to DuckDB `lpad(CAST(v AS VARCHAR), 20, '0')`.
    */
  private def pad20(v: Long): UTF8String = {
    val s = java.lang.Long.toUnsignedString(v)
    val out = new Array[Byte](20)
    java.util.Arrays.fill(out, '0'.toByte)
    var i = 0
    while (i < s.length) {
      out(20 - s.length + i) = s.charAt(i).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Null for empty/null arrays (no shingles → no signature, matching the
    * exploded formulation where the doc simply has no rows).
    */
  def compute(arr: ArrayData, nHashes: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val minima = new Array[Long](nHashes)
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        md.update(arr.getUTF8String(i).getBytes)
        val d = md.digest()
        val h2 = le64(d, 0) // md5_number_upper
        var v = le64(d, 8)  // md5_number_lower = h1; then v = h1 + j*h2 incrementally
        var j = 0
        while (j < nHashes) {
          if (!seen || java.lang.Long.compareUnsigned(v, minima(j)) < 0) minima(j) = v
          j += 1
          v += h2
        }
        seen = true
      }
      i += 1
    }
    if (!seen) return null // all elements were null
    new GenericArrayData(minima.map(m => pad20(m).asInstanceOf[Any]))
  }

  def apply(shingles: Column, nHashes: Int): Column =
    GraftColumnBridge.column(MinHashSig(GraftColumnBridge.expression(shingles), nHashes))
}
