package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Quantitative bounds for the three MLlib rows-only registry entries —
  * the ML counterpart of `SketchBoundsSpec`: `m5_impute_linreg`,
  * `m6_ensemble_vote` and `m6b_ensemble_boosted` carry no DuckDB oracle by
  * documented contract (MLlib internals), so this spec bounds each against
  * ground truth the contract CAN promise.
  *
  *   - m5: MLlib's normal-equation LinearRegression (solver="normal",
  *     regParam 0) IS ordinary least squares — every repaired value must
  *     match the closed-form normal-equation solution, solved here
  *     directly from the same train rows, to solver precision.
  *   - m6/m6b: the embeddings task is UNLEARNABLE by testdata design
  *     (labels independent of the vector dims — holdout accuracy sits at
  *     chance: probed 0.096 vs 0.1 and 0.226 vs 0.25), so a holdout floor
  *     would be vacuous and an above-chance assertion false. What a seeded
  *     ensemble CAN promise is that it actually fit: TRAIN-set vote
  *     accuracy far above chance (memorization — probed 0.61 for the RF
  *     vote and 0.93 for the boosted pair at sf0.01). The floors sit at
  *     half the probed values and 4x/2.8x chance, so a regression to a
  *     constant or chance predictor fails loudly while seed-stable
  *     fit noise cannot.
  */
class MlBoundsSpec extends graft.SparkSpec {
  private val sfDir = "/root/testdata/sf0.01"

  test("m5 repaired values equal the closed-form normal-equation OLS solution") {
    val out = SparkEntry.queries("m5_impute_linreg")(spark, sfDir)
      .filter(col("vec_id") % 5 === 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // rebuild the identical design matrix the query fits on
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").select(
      col("vec_id") +:
        (1 to 8).map(i => element_at(col("embedding"), i).cast("double").as(s"e_$i")): _*)
    val train = e.filter(col("vec_id") % 5 =!= 0)
      .select((1 to 8).map(i => col(s"e_$i")): _*).collect()
      .map(r => (1 to 8).map(i => r.getDouble(i - 1)).toArray)
    // normal equations over [1, x2..x8] -> y = e_1 (intercept first)
    val p = 8 // 7 features + intercept
    val xtx = Array.ofDim[Double](p, p)
    val xty = Array.ofDim[Double](p)
    train.foreach { row =>
      val x = 1.0 +: row.drop(1) // e_2..e_8
      val y = row(0)
      for (i <- 0 until p) {
        xty(i) += x(i) * y
        for (j <- 0 until p) xtx(i)(j) += x(i) * x(j)
      }
    }
    // solve (X'X) beta = X'y with breeze's LAPACK-backed solver (ships in
    // Spark's mllib classpath) — pivoting/conditioning audited upstream,
    // nothing hand-rolled to re-verify against the 1e-5 tolerance
    val beta = (breeze.linalg.DenseMatrix(xtx: _*) \ breeze.linalg.DenseVector(xty)).toArray
    val fixed = e.filter(col("vec_id") % 5 === 0).collect()
    assert(fixed.nonEmpty && out.size == fixed.length)
    fixed.foreach { r =>
      val id = r.getLong(0)
      // row layout: index 0 = vec_id, index i = e_i
      val pred = beta(0) + (2 to 8).map(i => beta(i - 1) * r.getDouble(i)).sum
      val got = out(id)
      assert(math.abs(got - pred) <= 1e-5,
        s"vec_id=$id: MLlib repair $got vs closed-form OLS $pred diverges past solver precision")
    }
  }

  test("ensemble votes memorize the training set far above chance (m6/m6b)") {
    def trainAcc(q: String): Double =
      SparkEntry.queries(q)(spark, sfDir)
        .filter(col("vec_id") % 4 =!= 0)
        .select(avg((col("label") === col("pred_vote")).cast("double")))
        .first().getDouble(0)
    val m6 = trainAcc("m6_ensemble_vote")
    assert(m6 >= 0.4, s"m6 train-set vote accuracy $m6 < 0.4 (chance 0.1, probed 0.61) — " +
      "the RF ensemble no longer fits; check seeds/params")
    val m6b = trainAcc("m6b_ensemble_boosted")
    assert(m6b >= 0.7, s"m6b train-set vote accuracy $m6b < 0.7 (chance 0.25, probed 0.93) — " +
      "the boosted ensemble no longer fits; check seeds/params")
  }
}
