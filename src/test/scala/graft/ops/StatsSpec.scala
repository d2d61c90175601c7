package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("diffMean telescopes to mean of first differences") {
    // diffs of (1, 4, 9, 16) = (3, 5, 7) → mean 5 = (16-1)/3
    val df = Seq(("k", 1L, 1.0), ("k", 2L, 4.0), ("k", 3L, 9.0), ("k", 4L, 16.0))
      .toDF("k", "ts", "v")
    val out = df.groupBy("k").agg(Stats.diffMean(col("ts"), col("v")).as("d"))
      .select("d").as[Double].head()
    assert(out == 5.0)
  }

  test("diffMean is NULL for singleton groups") {
    val df = Seq(("k", 1L, 1.0)).toDF("k", "ts", "v")
    assert(df.groupBy("k").agg(Stats.diffMean(col("ts"), col("v")).as("d"))
      .filter(col("d").isNull).count() == 1)
  }

  test("boundarySumDiff: sum(last w) - sum(first w)") {
    val df = (1 to 6).map(i => ("k", i.toLong, i.toDouble)).toDF("k", "ts", "v")
    val ranked = Stats.withEndRanks(df, Seq("k"), Seq(col("ts")))
    val out = ranked.groupBy("k")
      .agg(Stats.boundarySumDiff(col("v"), col("rn_asc"), col("rn_desc"), 2).as("d"))
      .select("d").as[Double].head()
    assert(out == (5.0 + 6.0) - (1.0 + 2.0))
  }

  test("modeDeterministic breaks ties with the smallest value") {
    val df = Seq(("k", "b"), ("k", "b"), ("k", "a"), ("k", "a"), ("k", "c"))
      .toDF("k", "v")
    val out = Stats.modeDeterministic(df, Seq("k"), "v", "m").select("m").as[String].head()
    assert(out == "a")
  }

  test("exactQuantiles: median and quartiles with linear interpolation") {
    val df = (1 to 4).map(i => ("k", i.toDouble)).toDF("k", "v")
    val out = Stats.exactQuantiles(df, Seq("k"), "v", Seq(0.25, 0.5, 0.75))
      .select("q", "q_value").as[(Double, Double)].collect().toMap
    // numpy linear: q25 = 1.75, q50 = 2.5, q75 = 3.25
    assert(out(0.25) == 1.75 && out(0.5) == 2.5 && out(0.75) == 3.25)
  }

  test("argmaxArray: first occurrence wins on ties (numpy argmax)") {
    val df = Seq(Tuple1(Seq(1.0, 5.0, 5.0, 2.0))).toDF("a")
    assert(df.select(Stats.argmaxArray(col("a")).as("i")).as[Int].head() == 1)
  }

  test("corrCovar matches the closed-form moments on a known set") {
    // x = 1..4, y = 2x → r = 1 exactly; covar_samp = 2·var_samp(x) = 10/3
    val df = (1 to 4).map(i => ("k", i.toDouble, 2.0 * i)).toDF("k", "x", "y")
    val row = Stats.corrCovar(df, Seq("k"), "x", "y")
      .select("n_rows", "covar_samp", "pearson_r")
      .as[(Long, Double, Double)].head()
    assert(row._1 == 4L)
    assert(math.abs(row._2 - 10.0 / 3.0) < 1e-12)
    assert(math.abs(row._3 - 1.0) < 1e-12)
  }

  test("corrCovar: constant column yields NULL corr, n=1 yields NULL covar") {
    val df = Seq(("a", 1.0, 5.0), ("a", 2.0, 5.0), ("b", 3.0, 7.0))
      .toDF("k", "x", "y")
    val out = Stats.corrCovar(df, Seq("k"), "x", "y")
      .select("k", "covar_samp", "pearson_r")
      .collect().map(r => r.getString(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(out("a") == ((false, true))) // y constant → corr NULL, covar fine
    assert(out("b") == ((true, true)))  // single row → both NULL
  }

  test("corrCovar is partition-count independent (exact sums)") {
    val df = (1 to 1000).map(i => ("k", i * 0.37, 1e5 - i * 13.1)).toDF("k", "x", "y")
    val a = Stats.corrCovar(df.repartition(1), Seq("k"), "x", "y")
      .select("pearson_r").as[Double].head()
    val b = Stats.corrCovar(df.repartition(7), Seq("k"), "x", "y")
      .select("pearson_r").as[Double].head()
    assert(a == b) // bit-equal, not approximately
  }

  test("classificationMetrics: abstentions are FNs only; zero denominators give 0, not NaN") {
    val df = Seq(
      ("aa", Some("aa")), ("aa", Some("aa")), ("aa", Some("bb")), // 2 tp, 1 miscast to bb
      ("bb", Some("bb")),                                         // 1 tp
      ("cc", None)                                                // abstention: FN for cc
    ).toDF("actual", "pred")
    val out = Stats.classificationMetrics(df, "actual", "pred")
      .select("class", "n_true", "n_pred", "tp", "precision", "recall", "f1")
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("aa") == (("aa", 3L, 2L, 2L, 1.0, 2.0 / 3.0, 2.0 * 1.0 * (2.0 / 3.0) / (1.0 + 2.0 / 3.0))))
    assert(out("bb") == (("bb", 1L, 2L, 1L, 0.5, 1.0, 2.0 * 0.5 * 1.0 / 1.5)))
    assert(out("cc") == (("cc", 1L, 0L, 0L, 0.0, 0.0, 0.0))) // no NaN from 0/0
    assert(out.size == 3)
  }

  test("binaryAuc: closed-form cases incl. ties; degenerate inputs give NULL") {
    // perfect separation → 1.0; perfect inversion → 0.0
    val sep = Seq((1L, 10L), (1L, 9L), (0L, 2L), (0L, 1L)).toDF("y", "s")
    assert(Stats.binaryAuc(sep, "y", "s").select("auc").as[Double].head() == 1.0)
    val inv = Seq((0L, 10L), (0L, 9L), (1L, 2L), (1L, 1L)).toDF("y", "s")
    assert(Stats.binaryAuc(inv, "y", "s").select("auc").as[Double].head() == 0.0)
    // all scores tied → 0.5 exactly (average ranks)
    val tied = Seq((1L, 5L), (1L, 5L), (0L, 5L), (0L, 5L)).toDF("y", "s")
    assert(Stats.binaryAuc(tied, "y", "s").select("auc").as[Double].head() == 0.5)
    // hand case: pos scores (3, 1), neg (2, 1) → pairs: (3>2)+(3>1)+(1>2=0)+(1=1→½) = 2.5/4
    val hand = Seq((1L, 3L), (1L, 1L), (0L, 2L), (0L, 1L)).toDF("y", "s")
    assert(Stats.binaryAuc(hand, "y", "s").select("auc").as[Double].head() == 2.5 / 4.0)
    // single-class input → NULL, not a division blow-up
    val one = Seq((1L, 3L), (1L, 1L)).toDF("y", "s")
    assert(Stats.binaryAuc(one, "y", "s").select("auc").as[Option[Double]].head().isEmpty)
  }

  test("macroAuc: per-class AUCs + '*' mean over defined classes only") {
    val df = Seq(
      // class a: pos scores (3, 1), neg (2, 1) → 2.5/4 = 0.625
      ("a", 1L, 3L), ("a", 1L, 1L), ("a", 0L, 2L), ("a", 0L, 1L),
      // class b: perfect separation → 1.0
      ("b", 1L, 9L), ("b", 1L, 8L), ("b", 0L, 2L),
      // class c: all positive → degenerate, NULL auc, skipped by the macro
      ("c", 1L, 5L), ("c", 1L, 4L)
    ).toDF("class", "y", "s")
    val out = Stats.macroAuc(df, "class", "y", "s")
      .select("class", "n_pos", "n_neg", "auc")
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a") == (("a", 2L, 2L, Some(0.625))))
    assert(out("b") == (("b", 2L, 1L, Some(1.0))))
    assert(out("c") == (("c", 2L, 0L, None)))
    // macro: (⌊0.625e9⌋ + ⌊1.0e9⌋) / 2e9 = 0.8125; totals carry through
    assert(out("*") == (("*", 6L, 3L, Some(0.8125))))
    assert(out.size == 4)
  }

  test("spearman: monotone → ~1, reversed → ~-1, ties averaged, constant → NULL") {
    val up = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0), (4.0, 35.0)).toDF("x", "y")
    val r1 = Stats.spearman(up, "x", "y").select("rho").as[Double].head()
    assert(math.abs(r1 - 1.0) < 1e-12) // exact ranks; only the closing sqrt dag rounds
    val down = Seq((1.0, 30.0), (2.0, 20.0), (3.0, 10.0)).toDF("x", "y")
    val r2 = Stats.spearman(down, "x", "y").select("rho").as[Double].head()
    assert(math.abs(r2 + 1.0) < 1e-12)
    // tie handling: x ties share an average rank; hand-checked closed form
    // x = (1,1,2), avg ranks (1.5,1.5,3); y = (10,20,30), ranks (1,2,3)
    // → ρ = cov/σxσy = 0.75/(√1.5·√2)·... = √3/2
    val tied = Seq((1.0, 10.0), (1.0, 20.0), (2.0, 30.0)).toDF("x", "y")
    val r3 = Stats.spearman(tied, "x", "y").select("rho").as[Double].head()
    assert(math.abs(r3 - math.sqrt(3.0) / 2.0) < 1e-12)
    // constant signal → zero variance → NULL, never NaN
    val const = Seq((5.0, 1.0), (5.0, 2.0), (5.0, 3.0)).toDF("x", "y")
    assert(Stats.spearman(const, "x", "y").select("rho").as[Option[Double]].head().isEmpty)
  }

  test("binaryAuc rejects continuous double scores at plan time; scoreScale quantizes") {
    val cont = Seq((1L, 0.91), (0L, 0.10), (1L, 0.85), (0L, 0.35)).toDF("y", "s")
    val e = intercept[IllegalArgumentException](Stats.binaryAuc(cont, "y", "s"))
    assert(e.getMessage.contains("scoreScale"))
    // quantized via scoreScale: floor(s·10) → 9, 1, 8, 3 — perfect
    // separation of the positives → AUC 1.0
    val row = Stats.binaryAuc(cont, "y", "s", scoreScale = Some(1))
      .select("n_pos", "n_neg", "auc").as[(Long, Long, Option[Double])].head()
    assert(row == ((2L, 2L, Some(1.0))))
    // the guard also covers the keyed/macro forms (shared code path)
    val keyed = Seq(("a", 1L, 0.9)).toDF("k", "y", "s")
    intercept[IllegalArgumentException](Stats.binaryAucBy(keyed, Seq("k"), "y", "s"))
  }

  test("spearman raises past the 4n^4 < 2^53 exactness bound instead of drifting") {
    val big = spark.range(Stats.SpearmanMaxExactN + 1)
      .selectExpr("CAST(id AS DOUBLE) AS x", "CAST(id * 2 AS DOUBLE) AS y")
    val e = intercept[Throwable](Stats.spearman(big, "x", "y").collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(t => Option(t.getMessage).toSeq ++ msgs(t.getCause))
    assert(msgs(e).exists(_.contains("spearman exactness bound")))
    // exactly AT the bound the guard stays quiet and the rank algebra holds
    val atBound = spark.range(Stats.SpearmanMaxExactN)
      .selectExpr("CAST(id AS DOUBLE) AS x", "CAST(id * 2 AS DOUBLE) AS y")
    val rho = Stats.spearman(atBound, "x", "y").select("rho").as[Double].head()
    assert(math.abs(rho - 1.0) < 1e-12)
  }

  test("calibrationBins: equal-width bins, top edge joins the last bin, empty bins absent") {
    val df = Seq(
      (0.05, 1L), (0.05, 0L), // bin 0
      (0.95, 1L), (1.0, 1L) // bin 9 (s = 1.0 clamps into the top bin)
    ).toDF("s", "y")
    val out = Stats.calibrationBins(df, "s", "y", 10)
      .select("bin", "n", "mean_score", "pos", "frac_pos")
      .as[(Long, Long, Double, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set(0L, 9L)) // empty bins emit no row
    assert(out(0L)._2 == 2L && out(0L)._4 == 1L && out(0L)._5 == 0.5)
    assert(math.abs(out(0L)._3 - 0.05) < 1e-9)
    assert(out(9L)._2 == 2L && out(9L)._4 == 2L && out(9L)._5 == 1.0)
    assert(math.abs(out(9L)._3 - 0.975) < 1e-9)
  }

  test("calibrationBins: NULL scores are excluded, not resurrected into the top bin") {
    // least(NULL, 9) returns 9 (least skips null args) — without the
    // isNotNull filter the null-scored row would land in bin 9
    val df = Seq((Some(0.95), 1L), (None, 0L), (None, 1L))
      .toDF("s", "y")
    val out = Stats.calibrationBins(df, "s", "y", 10)
      .select("bin", "n", "pos").as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((9L, 1L, 1L)))
  }

  test("regressionMetrics: constant actual (SST=0) gives NULL r2, not NaN/Inf") {
    val const = Seq(("g", 5.0, 5.5), ("g", 5.0, 4.5), ("g", 5.0, 5.0)).toDF("k", "y", "yp")
    val row = Stats.regressionMetrics(const, Seq("k"), "y", "yp")
      .select("n", "mae", "rmse", "r2")
      .as[(Long, Double, Double, Option[Double])].head()
    assert(row._1 == 3L && row._4.isEmpty)
    assert(!row._2.isNaN && !row._3.isNaN)
    // non-degenerate group still closes the usual 1 - SSE/SST
    val ok = Seq(("g", 1.0, 1.0), ("g", 2.0, 2.0), ("g", 3.0, 3.0)).toDF("k", "y", "yp")
    val r2 = Stats.regressionMetrics(ok, Seq("k"), "y", "yp")
      .select("r2").as[Option[Double]].head()
    assert(r2.contains(1.0))
  }

  test("madOutliers flags by median/MAD; MAD=0 groups are excluded before dividing") {
    val df = (Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0)) ++
      Seq.fill(5)(("b", 7.0))) // constant group: MAD = 0
      .toDF("k", "v")
    val out = Stats.madOutliers(df, Seq("k"), "v", 3.5)
      .select("k", "v", "med", "mad", "rz")
      .as[(String, Double, Double, Double, Double)].collect().toSeq
    // group a: med 3, devs (2,1,0,1,97), MAD 1 — only the 100 crosses 3.5
    assert(out == Seq(("a", 100.0, 3.0, 1.0, 97.0)))
    // the contaminated mean/sd screen (a16's) would NOT flag cleanly here:
    // the outlier drags mu to 22 and sd to ~43.6, z(100) ≈ 1.8 < 2.5
    val z = Stats.zOutliers(df.filter(col("k") === "a"), Seq("k"), "v", 2.5)
    assert(z.isEmpty)
  }

  test("psi: zero on identical distributions, positive on a shift, closed form") {
    val base = Seq(("a", 0.5), ("a", 1.5), ("a", 1.5), ("a", 2.5)).toDF("k", "v")
    val same = Stats.psi(base, base, Seq("k"), "v", 0.0, 1.0, 4)
      .select("k", "n_base", "n_cur", "psi").as[(String, Long, Long, Double)].head()
    assert(same == (("a", 4L, 4L, 0.0))) // p_i == q_i exactly -> every term 0
    // shift everything up one bin; PSI is symmetric-positive
    val cur = Seq(("a", 1.5), ("a", 2.5), ("a", 2.5), ("a", 3.5)).toDF("k", "v")
    val shifted = Stats.psi(base, cur, Seq("k"), "v", 0.0, 1.0, 4)
      .select("psi").as[Double].head()
    // closed form with Laplace smoothing, n=4, nBins=4: shares are
    // (c+1)/8 with base counts (1,2,1,0) and cur counts (0,1,2,1)
    def t9(x: Double) = math.signum(x) * math.floor(math.abs(x) * 1e9) / 1e9
    val terms = Seq((1, 0), (2, 1), (1, 2), (0, 1)).map { case (cb, cc) =>
      val (p, q) = ((cb + 1) / 8.0, (cc + 1) / 8.0)
      t9((p - q) * math.log(p / q))
    }
    assert(math.abs(shifted - terms.sum) < 1e-12)
    assert(shifted > 0.0)
  }

  test("weightedQuantiles matches the brute-force weighted reference, per group, with repeats") {
    val rng = new scala.util.Random(23)
    val rows = (0 until 400).map { i =>
      ("g" + (i % 3), (rng.nextInt(25) + 1).toLong, (rng.nextInt(9) + 1).toLong)
    }
    val df = rows.toDF("g", "v", "w")
    val qs = Seq(("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4))
    val got = Stats.weightedQuantiles(df, Seq("g"), "v", "w", qs)
      .select("g", "w_total", "p25", "p50", "p75")
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // reference: smallest v whose cumulative weight reaches ceil(q*W),
    // over the (v, id)-sorted expansion
    for ((g, rs) <- rows.groupBy(_._1)) {
      val sorted = rs.sortBy(_._2)
      val tot = rs.map(_._3).sum
      def pick(num: Long, den: Long): Long = {
        val thr = (tot * num + den - 1) / den
        var cum = 0L
        sorted.find { r => cum += r._3; cum >= thr }.get._2
      }
      assert(got(g)._2 == tot)
      assert(got(g)._3 == pick(1, 4), s"$g p25")
      assert(got(g)._4 == pick(1, 2), s"$g p50")
      assert(got(g)._5 == pick(3, 4), s"$g p75")
    }
    // NULL values/weights are excluded, not resurrected
    val withNull: Seq[(String, java.lang.Long, java.lang.Long)] = Seq(
      ("g", java.lang.Long.valueOf(5L), java.lang.Long.valueOf(1L)),
      ("g", null: java.lang.Long, java.lang.Long.valueOf(9L)),
      ("g", java.lang.Long.valueOf(7L), null: java.lang.Long))
    val one = Stats.weightedQuantiles(
        withNull.toDF("g", "v", "w"), Seq("g"), "v", "w", Seq(("p50", 1, 2)))
      .select("w_total", "p50").as[(Long, Long)].head()
    assert(one == ((1L, 5L)))
  }
}
