package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Exact

/** Top-principal-direction PCA for embedding columns, engine-exact — the
  * embedding-space curation fit SemDeDup-class pipelines run before
  * dedup/outlier pruning (a dominant direction in a learned embedding
  * space is usually an artifact — length, frequency, boilerplate — and
  * projections onto it rank outliers and drive whitening decisions).
  *
  * Shape (the fit/route split, as `IvfQuantizer` / the DSIR table / the
  * language profiles): the covariance FIT scans only the systematic
  * `id % sampleEvery == 0` sample — per-dimension means and the dims²
  * covariance cells are decimal-truncated sums (`Exact.dsumTrunc9`), so
  * the collected matrix is bit-identical across engines; the power
  * ITERATION runs on the driver over the collected dims² cells in pure
  * integer fixed-point algebra (every dot product is a sum of
  * `⌊|x|·10⁹⌋` signed longs — associative, order-free, replicated
  * verbatim by the oracle's unrolled CTE rounds); SCORING projects the
  * full corpus through one broadcast (dim, mu, v) table with the same
  * decimal dot — the corpus never shuffles for the fit.
  *
  * Scale contract: the fit is sample-sized by design (dims²-cell
  * aggregation over n/sampleEvery rows; trunc-9 sums stay
  * exact-conversion-safe to ~9·10⁶ sample rows — size `sampleEvery` so
  * the sample lands under that, the `IvfQuantizer` pattern); scoring is
  * one stateless projection + per-id aggregation, linear and
  * shuffle-light at any corpus size.
  *
  * Determinism: fixed v₀ = e₁, a FIXED iteration count (no convergence
  * test — the mix_epochs/kcore fixed-rounds contract), one IEEE sqrt and
  * one IEEE division per component per round, and a closing sign
  * canonicalization (first nonzero component positive). Ties/degeneracy:
  * a zero matrix→zero iterate is rejected loudly (`require`) rather than
  * silently diverging from the SQL twin.
  */
object Pca {

  /** Signed trunc-9 fixed point of a double — the driver-side twin of the
    * per-term quantization inside [[graft.ops.Exact.dsumTrunc9]].
    */
  private def t9(x: Double): Long = {
    val m = math.floor(math.abs(x) * 1e9).toLong
    if (x < 0) -m else m
  }

  /** Per-dimension trunc-9 means of the systematic sample: (d, mu) with
    * d 1-based, one row per dimension.
    */
  def sampleMeans(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      sampleEvery: Int): DataFrame =
    df.filter(pmod(col(idCol), lit(sampleEvery)) === 0)
      .select(posexplode(col(vecCol)).as(Seq("d", "xf")))
      .select((col("d") + 1).as("d"), col("xf").cast("double").as("x"))
      .groupBy("d")
      .agg((Exact.dsumTrunc9(col("x")) / count(lit(1)).cast("double")).as("mu"))

  /** Centered covariance cells of the systematic sample: (i, j, c) with
    * all dims² cells present (every sampled vector carries every
    * dimension), c = Σ trunc9((xᵢ−muᵢ)(xⱼ−muⱼ)) / 10⁹. The self-join
    * fans each sampled vector to dims² product rows, then map-side
    * partial aggregation collapses them to dims² cells per task — the
    * exchange is matrix-sized, not sample-sized.
    */
  def sampleCov(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      sampleEvery: Int): DataFrame = {
    val comp = df.filter(pmod(col(idCol), lit(sampleEvery)) === 0)
      .select(col(idCol).as("__id"), posexplode(col(vecCol)).as(Seq("d", "xf")))
      .select(col("__id"), (col("d") + 1).as("d"), col("xf").cast("double").as("x"))
      .join(broadcast(sampleMeans(df, idCol, vecCol, sampleEvery)), "d")
      .select(col("__id"), col("d"), (col("x") - col("mu")).as("xc"))
    comp.select(col("__id"), col("d").as("i"), col("xc").as("xa"))
      .join(comp.select(col("__id"), col("d").as("j"), col("xc").as("xb")), "__id")
      .groupBy("i", "j")
      .agg(Exact.dsumTrunc9(col("xa") * col("xb")).as("c"))
  }

  /** Driver-side power iteration over collected (i, j, c) cells: `iters`
    * rounds of w = C·v (trunc-9 integer dots), normalize by the IEEE
    * sqrt of the trunc-9 norm², then flip so the first nonzero component
    * is positive. Every arithmetic step is replicated by the oracle's
    * unrolled CTE rounds, so the returned vector is bit-identical to the
    * SQL twin's.
    */
  def powerIteration(cells: Seq[(Int, Int, Double)], dims: Int, iters: Int): Array[Double] = {
    require(dims > 0 && iters > 0, "need positive dims and iteration count")
    val cov = Array.ofDim[Double](dims, dims)
    cells.foreach { case (i, j, c) => cov(i - 1)(j - 1) = c }
    var v = Array.tabulate(dims)(i => if (i == 0) 1.0 else 0.0)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dims) { i =>
        var s = 0L
        var j = 0
        while (j < dims) { s += t9(cov(i)(j) * v(j)); j += 1 }
        s / 1e9
      }
      var n2i = 0L
      var i = 0
      while (i < dims) { n2i += t9(w(i) * w(i)); i += 1 }
      val nrm = math.sqrt(n2i / 1e9)
      require(nrm > 0, "power iteration hit a zero iterate (degenerate covariance)")
      v = w.map(_ / nrm)
    }
    val k = v.indexWhere(_ != 0.0)
    if (k >= 0 && v(k) < 0) v.map(x => -x) else v
  }

  /** The collected fit: per-dimension means, the top direction, and the
    * covariance cells (1-based (i,j) → value) — the batch half of the
    * fit/route split ([[pc1Scores]] and the streaming
    * `pcaScoreStream` both route against it).
    */
  final case class Fit(mu: Array[Double], v: Array[Double], cov: Map[(Int, Int), Double])

  /** Fit the sample: means + covariance + `iters`-round top direction. */
  def fit(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      iters: Int,
      sampleEvery: Int): Fit = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val cells = sampleCov(df, idCol, vecCol, sampleEvery)
      .as[(Int, Int, Double)].collect().toSeq
    val mu = sampleMeans(df, idCol, vecCol, sampleEvery)
      .as[(Int, Double)].collect().toMap
    Fit(
      Array.tabulate(dims)(d => mu.getOrElse(d + 1, 0.0)),
      powerIteration(cells, dims, iters),
      cells.map { case (i, j, c) => (i, j) -> c }.toMap)
  }

  /** Fit on the sample, score the FULL frame: (idCol, pc1_score) where
    * pc1_score = Σ trunc9((x_d − mu_d)·v_d) / 10⁹ — the signed projection
    * of the centered vector onto the fitted top principal direction.
    * Large |pc1_score| marks vectors extreme along the corpus's dominant
    * axis (the outlier/whitening signal).
    */
  def pc1Scores(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      iters: Int,
      sampleEvery: Int): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val f = fit(df, idCol, vecCol, dims, iters, sampleEvery)
    val mv = (1 to dims).map(d => (d, f.mu(d - 1), f.v(d - 1))).toDF("d", "mu", "v")
    df.select(col(idCol), posexplode(col(vecCol)).as(Seq("d", "xf")))
      .select(col(idCol), (col("d") + 1).as("d"), col("xf").cast("double").as("x"))
      .join(broadcast(mv), "d")
      .groupBy(col(idCol))
      .agg(Exact.dsumTrunc9((col("x") - col("mu")) * col("v")).as("pc1_score"))
  }

  /** One-row variance summary of the fitted direction: lambda1 = the
    * Rayleigh quotient vᵀCv (v is unit, so no denominator), trace = Σ Cᵢᵢ
    * (the total variance), var_share = lambda1/trace — "how dominant is
    * the dominant axis", the number that decides whether whitening or
    * axis-pruning is worth running at all. All three ride the same
    * trunc-9 integer algebra as the fit, so the row hashes cross-engine.
    */
  def pc1Variance(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      iters: Int,
      sampleEvery: Int): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val f = fit(df, idCol, vecCol, dims, iters, sampleEvery)
    val w = Array.tabulate(dims) { i =>
      var s = 0L
      var j = 0
      while (j < dims) { s += t9(f.cov.getOrElse((i + 1, j + 1), 0.0) * f.v(j)); j += 1 }
      s / 1e9
    }
    var lamI = 0L
    var trI = 0L
    var i = 0
    while (i < dims) {
      lamI += t9(f.v(i) * w(i))
      trI += t9(f.cov.getOrElse((i + 1, i + 1), 0.0))
      i += 1
    }
    val lambda1 = lamI / 1e9
    val trace = trI / 1e9
    Seq((lambda1, trace, lambda1 / trace)).toDF("lambda1", "trace", "var_share")
  }

  /** Oracle CTE chain for the FIT — sample means, covariance cells,
    * `iters` unrolled power rounds, sign canonicalization. Ends in
    * `vf(d, x)` (plus `mu` and `cov` available to appended stages).
    */
  private def fitSql(table: String, dims: Int, iters: Int, sampleEvery: Int): String = {
    val rounds = (1 to iters).map { r =>
      s"""w$r AS (SELECT cov.i AS d, ${Exact.sqlDsumTrunc9(s"cov.c * v.x")} AS w
            FROM cov JOIN v${r - 1} v ON v.d = cov.j GROUP BY 1),
          n$r AS (SELECT sqrt(${Exact.sqlDsumTrunc9("w.w * w.w")}) AS nrm FROM w$r w),
          v$r AS (SELECT w.d, w.w / n.nrm AS x FROM w$r w, n$r n)"""
    }.mkString(",\n")
    s"""samp AS (SELECT * FROM $table WHERE vec_id % $sampleEvery = 0),
        comp AS (SELECT vec_id, i.i AS d, CAST(embedding[i.i] AS DOUBLE) AS x
                 FROM samp, unnest(generate_series(1, $dims)) AS i(i)),
        mu AS (SELECT d, ${Exact.sqlDsumTrunc9("x")} / CAST(count(*) AS DOUBLE) AS mu
               FROM comp GROUP BY 1),
        cc AS (SELECT c.vec_id, c.d, c.x - mu.mu AS xc
               FROM comp c JOIN mu ON mu.d = c.d),
        cov AS (SELECT a.d AS i, b.d AS j, ${Exact.sqlDsumTrunc9("a.xc * b.xc")} AS c
                FROM cc a JOIN cc b ON b.vec_id = a.vec_id GROUP BY 1, 2),
        v0 AS (SELECT i.i AS d, CASE WHEN i.i = 1 THEN CAST(1.0 AS DOUBLE)
                 ELSE CAST(0.0 AS DOUBLE) END AS x
               FROM unnest(generate_series(1, $dims)) AS i(i)),
        $rounds,
        sgn AS (SELECT CASE WHEN x < 0 THEN CAST(-1.0 AS DOUBLE)
                  ELSE CAST(1.0 AS DOUBLE) END AS s
                FROM v$iters WHERE x <> 0 ORDER BY d LIMIT 1),
        vf AS (SELECT d, x * sgn.s AS x FROM v$iters, sgn)"""
  }

  /** Oracle CTE chain mirroring the whole scoring pipeline for a DuckDB
    * `embeddings`-shaped table — the fit plus the full-corpus
    * projection. Ends in `pcascore(vec_id, pc1_score)`.
    */
  def sql(table: String, dims: Int, iters: Int, sampleEvery: Int): String =
    s"""${fitSql(table, dims, iters, sampleEvery)},
        compall AS (SELECT vec_id, i.i AS d, CAST(embedding[i.i] AS DOUBLE) AS x
                    FROM $table, unnest(generate_series(1, $dims)) AS i(i)),
        pcascore AS (SELECT c.vec_id,
                       ${Exact.sqlDsumTrunc9("(c.x - mu.mu) * vf.x")} AS pc1_score
                     FROM compall c JOIN mu ON mu.d = c.d JOIN vf ON vf.d = c.d
                     GROUP BY 1)"""

  /** Oracle twin of [[pc1Variance]] — the fit plus the Rayleigh quotient
    * and trace. Ends in `vstats(lambda1, trace, var_share)`.
    */
  def varianceSql(table: String, dims: Int, iters: Int, sampleEvery: Int): String =
    s"""${fitSql(table, dims, iters, sampleEvery)},
        wf AS (SELECT cov.i AS d, ${Exact.sqlDsumTrunc9("cov.c * vf.x")} AS w
               FROM cov JOIN vf ON vf.d = cov.j GROUP BY 1),
        vstats AS (SELECT l.lambda1, t.trace, l.lambda1 / t.trace AS var_share FROM
          (SELECT ${Exact.sqlDsumTrunc9("vf.x * wf.w")} AS lambda1
           FROM vf JOIN wf ON wf.d = vf.d) l,
          (SELECT ${Exact.sqlDsumTrunc9("c")} AS trace FROM cov WHERE i = j) t)"""
}
