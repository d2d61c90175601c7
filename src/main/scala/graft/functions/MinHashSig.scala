package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a native expression: for each of `nHashes` seeded
  * permutations, the minimum md5 hex of "seed:shingle" over the input
  * shingle array — all minima in ONE pass over the array, per row, inside
  * whole-stage codegen. No explode, no groupBy: signature computation
  * becomes embarrassingly parallel map work, and only the (tiny) banded
  * candidate join shuffles.
  *
  * Hash semantics mirror the composed form exactly (`min(md5('j:' ||
  * shingle))` — the DuckDB oracle's formulation): md5 of the UTF-8 bytes,
  * minima compared as lowercase hex (equivalent to unsigned byte order).
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
  private val HexChars = "0123456789abcdef".toCharArray

  private def toHex(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      out(2 * i) = HexChars(v >>> 4).toByte
      out(2 * i + 1) = HexChars(v & 0x0f).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned lexicographic compare of two digests — identical ordering to
    * comparing their lowercase hex strings.
    */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Null for empty/null arrays (no shingles → no signature, matching the
    * exploded formulation where the doc simply has no rows).
    */
  def compute(arr: ArrayData, nHashes: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val minima = new Array[Array[Byte]](nHashes)
    val prefixes = Array.tabulate(nHashes)(j => s"$j:".getBytes("UTF-8"))
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val shingle = arr.getUTF8String(i).getBytes
        var j = 0
        while (j < nHashes) {
          md.reset()
          md.update(prefixes(j))
          md.update(shingle)
          val d = md.digest()
          if (minima(j) == null || less(d, minima(j))) minima(j) = d
          j += 1
        }
      }
      i += 1
    }
    if (minima(0) == null) return null // all elements were null
    new GenericArrayData(minima.map(m => toHex(m).asInstanceOf[Any]))
  }

  def apply(shingles: Column, nHashes: Int): Column =
    GraftColumnBridge.column(MinHashSig(GraftColumnBridge.expression(shingles), nHashes))
}
