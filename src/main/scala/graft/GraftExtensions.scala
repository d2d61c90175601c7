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
    ext.injectFunction(GraftFunctions.mathLnDescriptor)
    ext.injectFunction(GraftFunctions.shingleKeysDescriptor)
    ext.injectFunction(GraftFunctions.minHashSigDescriptor)
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

  type Descriptor = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val exactDotDescriptor: Descriptor = (
    FunctionIdentifier("exact_dot"),
    new ExpressionInfo(
      classOf[ExactDot].getName,
      null,
      "exact_dot",
      "exact_dot(a, b[, scale]) - order-independent exact decimal dot product of two float arrays",
      ""),
    builder)

  private def intArg(e: Expression, fn: String): Int = {
    // eval() on a non-foldable (column) arg throws an opaque Catalyst
    // UnsupportedOperationException — keep the friendly diagnostic
    if (!e.foldable)
      throw new IllegalArgumentException(s"$fn expects a literal int, got non-literal $e")
    e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(s"$fn expects a literal int, got $other")
    }
  }

  val mathLnDescriptor: Descriptor = (
    FunctionIdentifier("math_ln"),
    new ExpressionInfo(
      classOf[graft.functions.MathLn].getName,
      null,
      "math_ln",
      "math_ln(x) - correctly-rounded natural log (Math.log, matches glibc/DuckDB; " +
        "Spark's builtin ln is StrictMath, 1 ulp off)",
      ""),
    args => args match {
      // SQL numeric literals arrive as DECIMAL — coerce here so pure-SQL
      // callers can write math_ln(2.0); the expression itself stays strict
      case Seq(x) => graft.functions.MathLn(
        org.apache.spark.sql.catalyst.expressions.Cast(
          x, org.apache.spark.sql.types.DoubleType))
      case other => throw new IllegalArgumentException(s"math_ln expects 1 argument, got ${other.size}")
    })

  val shingleKeysDescriptor: Descriptor = (
    FunctionIdentifier("shingle_keys"),
    new ExpressionInfo(
      classOf[graft.functions.ShingleKeys].getName,
      null,
      "shingle_keys",
      "shingle_keys(tokens, k) - all k-token shingle keys of a string array as 64-bit hashes, " +
        "computed in place (no shingle-string allocation)",
      ""),
    args => args match {
      case Seq(toks, k) => graft.functions.ShingleKeys(toks, intArg(k, "shingle_keys"))
      case other =>
        throw new IllegalArgumentException(s"shingle_keys expects 2 arguments, got ${other.size}")
    })

  val minHashSigDescriptor: Descriptor = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(
      classOf[graft.functions.MinHashSig].getName,
      null,
      "minhash_sig",
      "minhash_sig(shingles, n) - n-hash MinHash signature (one md5 per shingle, " +
        "Kirsch-Mitzenmacher double hashing) as zero-padded unsigned decimals",
      ""),
    args => args match {
      case Seq(sh, n) => graft.functions.MinHashSig(sh, intArg(n, "minhash_sig"))
      case other =>
        throw new IllegalArgumentException(s"minhash_sig expects 2 arguments, got ${other.size}")
    })

  val normalizeNfcDescriptor: Descriptor = (
    FunctionIdentifier("normalize_nfc"),
    new ExpressionInfo(
      classOf[graft.functions.NormalizeNFC].getName,
      null,
      "normalize_nfc",
      "normalize_nfc(str) - Unicode NFC canonicalization (DuckDB twin: nfc_normalize); " +
        "run it before byte-level dedup/fingerprinting so decomposed and composed " +
        "representations of the same text compare equal",
      ""),
    args => args match {
      case Seq(s) => graft.functions.NormalizeNFC(s)
      case other =>
        throw new IllegalArgumentException(s"normalize_nfc expects 1 argument, got ${other.size}")
    })

  private val all: Seq[Descriptor] =
    Seq(exactDotDescriptor, mathLnDescriptor, shingleKeysDescriptor, minHashSigDescriptor,
      normalizeNfcDescriptor)

  /** Register on a live session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (ident, info, fb) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, fb)
    }
}
