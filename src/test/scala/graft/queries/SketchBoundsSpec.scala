package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Quantitative error bounds for the two rows-only sketch registry entries.
  *
  * `sketch_approx` and `ivm_hll_merge` carry no DuckDB oracle by documented
  * contract (sketch internals are engine-specific and, for DataSketches HLL,
  * partition-dependent — [[graft.ops.Incremental.hllPartials]] scaladoc).
  * This spec converts "unchecked" into "bounded": every estimate the two
  * registered queries emit at sf0.01 must land within the sketch's own
  * published error bound of the exact answer computed over the same data.
  *
  * Bounds used (3-sigma, so a pass is meaningful and a fail is a real
  * defect, not sampling noise):
  *   - `hll_sketch_agg` default lgConfigK=12: RSE = 1.04/sqrt(2^12) ~ 1.63%,
  *     bound = 3 x RSE ~ 4.9% relative (plus a +-1 absolute floor for tiny
  *     groups, where the sparse-mode sketch is exact anyway);
  *   - `approx_count_distinct` default rsd = 5%: bound = 15% relative;
  *   - `percentile_approx(..., accuracy=1000)`: rank error eps = 1/1000 —
  *     bounded generously by the exact p48..p52 envelope per group.
  */
class SketchBoundsSpec extends graft.SparkSpec {
  private val sfDir = "/root/testdata/sf0.01"

  test("ivm_hll_merge estimates land within the DataSketches 3-sigma bound of exact") {
    val est = SparkEntry.queries("ivm_hll_merge")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val exact = Q.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet, s"group sets differ: $est vs $exact")
    for ((k, e) <- exact) {
      val a = est(k)
      val bound = math.max(3 * 0.01625 * e, 1.0)
      assert(math.abs(a - e) <= bound,
        s"event_type=$k: HLL estimate $a vs exact $e exceeds 3-sigma bound $bound")
    }
  }

  test("sketch_approx estimates land within HLL++ and KLL rank-error bounds of exact") {
    val est = SparkEntry.queries("sketch_approx")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val exact = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        expr("percentile(l_extendedprice, 0.48)").as("p48"),
        expr("percentile(l_extendedprice, 0.52)").as("p52"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(est.keySet == exact.keySet, s"group sets differ: $est vs $exact")
    for ((k, (nExact, p48, p52)) <- exact) {
      val (nApprox, medApprox) = est(k)
      assert(math.abs(nApprox - nExact).toDouble <= 3 * 0.05 * nExact,
        s"flag=$k: approx distinct $nApprox vs exact $nExact exceeds 3x rsd=5% bound")
      assert(medApprox >= p48 && medApprox <= p52,
        s"flag=$k: approx median $medApprox outside exact p48..p52 envelope [$p48, $p52]")
    }
  }
}
