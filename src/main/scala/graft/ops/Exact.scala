package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic floating-point aggregation helpers.
  *
  * Summing doubles is order-dependent in the last ulp, and Spark's partial
  * aggregation order differs run-to-run and engine-to-engine (the DuckDB
  * oracle). Casting each double to a fixed-scale DECIMAL first makes the sum
  * exact and associative, so Spark and DuckDB produce bit-identical results
  * regardless of partitioning — no rounding tolerance needed. A double→decimal
  * cast itself is deterministic across engines because no IEEE double lies
  * exactly on a half-ulp decimal tie at these scales.
  *
  * This is also the right call at 100 TB: decimal partial aggregation is
  * still map-side combined and whole-stage-codegen'd; the cost over a double
  * sum is a few percent, and results stop depending on partition count.
  */
object Exact {
  /** Scale 4, NOT 8: the decimal→double cast back out is only guaranteed
    * identical across engines while |sum|·10^scale < 2^53 (beyond ~17
    * significant digits the engines' conversions can disagree by an ulp —
    * observed on sf0.1 full-table money sums at scale 8). Scale 4 keeps
    * sums up to 9e11 exactly castable (sf10 TPC-H money magnitudes) and
    * still represents 2-decimal source data exactly.
    */
  val SumType: DecimalType = DecimalType(30, 4)

  /** Exact, order-independent sum of a double column; returned as double. */
  def dsum(c: Column): Column = sum(c.cast(SumType)).cast("double")

  /** Exact mean: decimal sum / count, divided in double space. */
  def dmean(c: Column): Column =
    (sum(c.cast(SumType)).cast("double") / count(c)).cast("double")

  /** Decimal type for sums of squares. Scale 4, NOT 10: a double→decimal
    * cast is only cross-engine-deterministic while the quantization point
    * sits inside the double's ~17 significant decimal digits (Spark rounds
    * the shortest-repr string, DuckDB the exact binary value — verified to
    * diverge at 18 digits). x² magnitudes reach 1e8-1e11, so scale 4 keeps
    * int_digits + scale ≤ 15. The decimal→double cast back out is correctly
    * rounded in BOTH engines at any magnitude (verified) — only the inbound
    * cast needs this guard.
    */
  val SqType: DecimalType = DecimalType(38, 4)

  /** Exact sample stddev via decimal sums of x and x². The per-row square is
    * a single IEEE op (deterministic), sums are exact, and the final
    * combination is identical double arithmetic on both engines.
    */
  def dstddev(c: Column): Column = {
    val n = count(c).cast("double")
    val s = sum(c.cast(SumType)).cast("double")
    val s2 = sum((c * c).cast(SqType)).cast("double")
    when(n > 1, sqrt(greatest((s2 - s * s / n) / (n - lit(1.0)), lit(0.0))))
  }

  /** Tie-free exact sum for double PRODUCTS (x², x·y): truncated scale-4
    * fixed point `sign·⌊|v|·10⁴⌋` summed as DECIMAL(38,0), divided back
    * out in double space.
    *
    * Why not a rounding cast like [[SqType]]: a product of money-scale
    * doubles reaches 1e10, where one double ulp (~2e-6) is within reach
    * of the decimal tie grid (odd/2^{s+1} — dyadic values ARE exact
    * scale-s ties), and Java HALF_UP vs DuckDB half-even then diverge by
    * one unit per tie row — observed on lineitem price×price sums at
    * sf0.01 (a17_corr, ~0.01% of rows). floor() has no tie: both engines
    * floor the identical correctly-rounded double `|v|·10⁴`, and the
    * per-row magnitude (≤1e14) fits the LONG floor() returns.
    */
  def dsumTrunc4(c: Column): Column = {
    val m = floor(abs(c) * lit(10000.0d))
    sum(when(c < 0, -m).otherwise(m).cast(DecimalType(38, 0)))
      .cast("double") / lit(10000.0d)
  }

  /** DuckDB SQL fragment mirroring [[dsumTrunc4]]. */
  def sqlDsumTrunc4(x: String): String = {
    val m = s"floor(abs($x) * CAST(10000 AS DOUBLE))"
    s"(CAST(sum(CAST(CASE WHEN ($x) < 0 THEN -$m ELSE $m END AS BIGINT)) AS DOUBLE)" +
      s" / CAST(10000 AS DOUBLE))"
  }

  /** Scale-9 sibling of [[dsumTrunc4]] for SMALL-magnitude per-row values
    * (log-probabilities, normalized scores: |v| ≲ 1e3, where scale-4
    * truncation noise would rival the quantity itself). Same tie-free
    * contract — both engines floor the identical correctly-rounded double
    * `|v|·10⁹`; per-row |v| must stay ≤ ~9e9 for the LONG floor. The sum
    * accumulates in DECIMAL(38,0) (exact, order-independent) and the
    * decimal→double cast back out is correctly rounded in both engines.
    */
  def dsumTrunc9(c: Column): Column = {
    val m = floor(abs(c) * lit(1.0e9d))
    sum(when(c < 0, -m).otherwise(m).cast(DecimalType(38, 0)))
      .cast("double") / lit(1.0e9d)
  }

  /** DuckDB SQL fragment mirroring [[dsumTrunc9]]. */
  def sqlDsumTrunc9(x: String): String = {
    val m = s"floor(abs($x) * CAST(1000000000 AS DOUBLE))"
    s"(CAST(sum(CAST(CASE WHEN ($x) < 0 THEN -$m ELSE $m END AS BIGINT)) AS DOUBLE)" +
      s" / CAST(1000000000 AS DOUBLE))"
  }

  /** DuckDB SQL fragment mirroring [[dsum]]. */
  def sqlDsum(x: String): String =
    s"CAST(sum(CAST(($x) AS DECIMAL(30,4))) AS DOUBLE)"

  /** DuckDB SQL fragment mirroring [[dmean]]. */
  def sqlDmean(x: String): String =
    s"(CAST(sum(CAST(($x) AS DECIMAL(30,4))) AS DOUBLE) / count($x))"

  /** DuckDB SQL fragment mirroring [[dstddev]] (NULL when n<=1). */
  def sqlDstddev(x: String): String = {
    val n = s"CAST(count($x) AS DOUBLE)"
    val s = s"CAST(sum(CAST(($x) AS DECIMAL(30,4))) AS DOUBLE)"
    val s2 = s"CAST(sum(CAST((($x)*($x)) AS DECIMAL(38,4))) AS DOUBLE)"
    s"CASE WHEN $n > 1 THEN sqrt(greatest(($s2 - $s*$s/$n) / ($n - 1.0), 0.0)) END"
  }
}
