package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, sum, xxhash64}
import org.apache.spark.sql.types.DecimalType

/** The central DETERMINISM.md claim, tested registry-wide: every
  * ORACLE-CHECKED query's output is BIT-identical under a different
  * physical execution — different reduce fan-out (shuffle partitions) and
  * different scan splits (maxPartitionBytes), i.e. different per-partition
  * accumulation order. This is the divergence class the whole `Exact`
  * decimal-sum discipline exists to kill (raw float sums reassociate; the
  * gate would hash-diverge depending on cluster width). Cross-ENGINE
  * equality is the DuckDB gate's job; this spec covers the orthogonal
  * cross-RUN axis the gate can't see (it always runs one fixed config).
  *
  * The fingerprint is an order-independent exact reduction: count plus a
  * DECIMAL(38,0) sum of per-row xxhash64 over all columns (sorted by name,
  * the driver's hashing convention) — commutative/associative with no
  * float in the loop, so any true reordering-sensitivity in the QUERY
  * shows and the fingerprint itself adds none.
  *
  * Exempt: exactly the five rows-only registry entries, which are
  * rows-only BECAUSE they are partitioning-dependent (MLlib's seeded
  * sampling changes with data layout for m5/m6/m6b; DataSketches HLL
  * union order wobbles the estimate for the two sketch entries) — their
  * weaker contracts are bounded in `MlBoundsSpec`/`SketchBoundsSpec`.
  */
class PartitioningInvarianceSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private val exempt = Set(
    "m5_impute_linreg", "m6_ensemble_vote", "m6b_ensemble_boosted",
    "sketch_approx", "ivm_hll_merge")

  private def fingerprint(fn: (SparkSession, String) => DataFrame): (Long, String) = {
    val out = fn(spark, sfDir)
    val row = out
      .select(
        count(lit(1)).as("n"),
        sum(xxhash64(out.columns.sorted.toIndexedSeq.map(col): _*)
          .cast(DecimalType(38, 0))).as("h"))
      .first()
    graft.ops.Caches.releaseAll()
    (row.getLong(0), String.valueOf(row.getDecimal(1)))
  }

  test("every oracle-checked query is bit-identical under different partitioning") {
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1).filterNot(q => exempt(q._1))
    def sweep(parts: String, maxBytes: String): Map[String, (Long, String)] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      spark.conf.set("spark.sql.files.maxPartitionBytes", maxBytes)
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      try qs.map { case (n, f) => n -> fingerprint(f) }.toMap
      finally {
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
        spark.conf.set("spark.sql.files.openCostInBytes", "4194304")
      }
    }
    val base = sweep("4", "134217728")
    val alt = sweep("7", "65536") // different reduce fan-out AND scan splits
    val diverged = qs.map(_._1).filter(n => base(n) != alt(n))
      .map(n => s"$n: 4-part ${base(n)} vs 7-part ${alt(n)}")
    assert(diverged.isEmpty,
      "PARTITION-ORDER-DEPENDENT output (would hash-diverge with cluster " +
        s"width; route float math through Exact.*):\n${diverged.mkString("\n")}")
    // exempt list stays honest: it must exactly equal the rows-only set
    val rowsOnly = graft.SparkEntry.queries.keySet -- graft.SparkEntry.oracleSql.keySet
    assert(rowsOnly == exempt,
      s"exempt list drifted from the rows-only registry set: ${rowsOnly.mkString(", ")}")
  }
}
