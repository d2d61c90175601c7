package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Pins the round-8 curation operators: the distributed 2-D skyline
  * ([[Pareto.skyline2d]]), blocked fuzzy record linkage
  * ([[Linkage.blockedPairs]]), and the CUSUM changepoint localizer
  * ([[Stats.cusumChangepoint]]).
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- skyline ----

  private def bruteSkyline(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filterNot { case (_, x, y) =>
      pts.exists { case (_, x2, y2) => x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.toSet

  test("skyline2d matches brute-force dominance on random points") {
    val rng = new Random(42)
    val pts = (0L until 300L).map(i => (i, rng.nextInt(40).toLong, rng.nextInt(40).toLong))
    val df = pts.toDF("id", "x", "y")
    val got = Pareto.skyline2d(df, "x", "y", pmod(col("id"), lit(7)))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == bruteSkyline(pts))
  }

  test("skyline2d is bucketing-invariant (incl. the single-bucket oracle form)") {
    val rng = new Random(7)
    val pts = (0L until 200L).map(i => (i, rng.nextInt(25).toLong, rng.nextInt(25).toLong))
    val df = pts.toDF("id", "x", "y")
    val direct = Pareto.skyline2d(df, "x", "y", lit(0)).as[(Long, Long, Long)].collect().toSet
    for (b <- Seq(2, 5, 32)) {
      val got = Pareto.skyline2d(df, "x", "y", pmod(col("id"), lit(b)))
        .as[(Long, Long, Long)].collect().toSet
      assert(got == direct, s"buckets=$b")
    }
  }

  test("skyline2d keeps exact-tie points, drops singly-dominated ones") {
    val df = Seq(
      (1L, 5L, 5L), (2L, 5L, 5L), // exact ties: both survive
      (3L, 5L, 4L), // same x, worse y: dominated
      (4L, 4L, 5L), // same y, worse x: dominated
      (5L, 6L, 1L) // incomparable corner: survives
    ).toDF("id", "x", "y")
    val got = Pareto.skyline2d(df, "x", "y", pmod(col("id"), lit(2)))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 5L, 5L), (2L, 5L, 5L), (5L, 6L, 1L)))
  }

  // ---- blocked linkage ----

  test("blockedPairs finds in-block near matches, misses cross-block ones by design") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"), // block "alpha beta gamma"
      (2L, "alpha beta gamma delXa epsilon"), // 1 substitution from doc 1 in the title
      (3L, "alpha beta gamma zzzzzzzzzzzzzzzzzzzzzzzzzz"), // same block, far title
      (4L, "omega beta gamma delta epsilon") // near doc 1 but different block
    ).toDF("doc_id", "text")
    val got = Linkage.blockedPairs(docs, "doc_id", "text", blockLen = 16, titleLen = 30, maxDist = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.map(p => (p._1, p._2)) == Set((1L, 2L)))
    assert(got.head._3 == 1L)
  }

  test("blockedPairs purges oversized blocks entirely") {
    val hot = (0L until 12L).map(i => (i, s"same same same same padded $i"))
    val cold = Seq((100L, "cold block text aaa"), (101L, "cold block text aab"))
    val docs = (hot ++ cold).toDF("doc_id", "text")
    val got = Linkage.blockedPairs(docs, "doc_id", "text",
      blockLen = 16, titleLen = 30, maxDist = 10, maxBlock = 10)
      .as[(Long, Long, Long)].collect().toSet
    // the 12-member hot block is purged; only the cold pair survives
    assert(got.map(p => (p._1, p._2)) == Set((100L, 101L)))
  }

  // ---- CUSUM changepoint ----

  private def series(vals: Seq[Double], key: String = "k") =
    vals.zipWithIndex.map { case (v, i) => (key, i.toLong, v) }.toDF("k", "i", "v")

  test("cusumChangepoint localizes a planted mean shift") {
    val df = series(Seq.fill(20)(0.0) ++ Seq.fill(20)(10.0))
    val got = Stats.cusumChangepoint(df, Seq("k"), Seq(col("i")), "v", carry = Seq("i"))
      .as[(String, Long, Long, Long, Double)].collect()
    // columns: k, i(carry), n, cp_idx, cusum_stat
    assert(got.length == 1)
    val (_, iAt, n, cpIdx, stat) = got.head
    assert(n == 40L && cpIdx == 20L && iAt == 19L)
    // centered CUSUM at the shift: |0 - (20/40)*200| = 100
    assert(stat == 100.0)
  }

  test("cusumChangepoint: constant series ties break to the earliest index") {
    val got = Stats.cusumChangepoint(series(Seq.fill(10)(3.5)), Seq("k"), Seq(col("i")), "v")
      .as[(String, Long, Long, Double)].collect()
    assert(got.head == (("k", 10L, 1L, 0.0)))
  }

  test("cusumChangepoint: chunked two-phase scan equals the direct single-window form") {
    val rng = new Random(23)
    val rows = (0 until 400).flatMap { i =>
      Seq(("a", i.toLong, rng.nextGaussian() * 3 + (if (i > 250) 1.5 else 0.0)),
        ("b", i.toLong, rng.nextGaussian()))
    }
    val df = rows.toDF("k", "i", "v")
    def run(chunk: org.apache.spark.sql.Column) =
      Stats.cusumChangepoint(df, Seq("k"), Seq(col("i")), "v", chunk = chunk, carry = Seq("i"))
        .as[(String, Long, Long, Long, Double)].collect().toSet
    val direct = run(lit(0L))
    // chunk widths incl. one that doesn't divide the length evenly
    for (w <- Seq(16L, 50L, 170L)) assert(run(expr(s"i DIV $w")) == direct, s"chunk width $w")
  }

  test("kcore equals the brute-force peel on random graphs (fixed-round contract)") {
    val rng = new Random(91)
    val edges = (for {
      a <- 0L until 60L; b <- (a + 1) until 60L if rng.nextDouble() < 0.05
    } yield (a, b)).toList
    // the exact fixed-round semantics of Graph.kcore — which coincides
    // with the converged core whenever 12 rounds suffice (it does here;
    // the op's contract is the fixed-round peel either way)
    def brute(k: Int): Map[Long, Long] = {
      var es = edges
      for (_ <- 1 to 12) {
        val deg = es.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (v, l) => v -> l.size }
        val keep = deg.filter(_._2 >= k).keySet
        es = es.filter(e => keep(e._1) && keep(e._2))
      }
      es.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (v, l) => v -> l.size.toLong }
        .filter(_._2 >= k)
    }
    val df = edges.toDF("a", "b")
    for (k <- Seq(2, 3)) {
      val got = Graph.kcore(df, "a", "b", k, rounds = 12)
        .as[(Long, Long)].collect().toMap
      Caches.releaseAll()
      assert(got == brute(k), s"k=$k")
    }
  }

  test("labelPropagation equals the brute-force synchronous iterate; a bridge never fuses cliques") {
    def brute(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
      val adj = (edges ++ edges.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var lbl = adj.keySet.map(v => v -> v).toMap
      for (_ <- 1 to rounds) {
        lbl = adj.map { case (v, ns) =>
          v -> ns.groupBy(lbl).toSeq.map { case (l, m) => (l, m.size) }
            .sortBy { case (l, c) => (-c, l) }.head._1
        }
      }
      lbl
    }
    // planted: two 4-cliques joined by ONE bridge edge — the shape where
    // connected components fuse and community detection must not
    val clique = for {
      base <- Seq(0L, 10L); i <- 0 to 3; j <- (i + 1) to 3
    } yield (base + i, base + j)
    val planted = clique :+ (3L -> 10L)
    val gotP = Graph.labelPropagation(planted.toDF("a", "b"), "a", "b", rounds = 3)
      .as[(Long, Long)].collect().toMap
    Caches.releaseAll()
    assert(gotP == brute(planted, 3))
    assert(
      Set(0L, 1L, 2L, 3L).map(gotP).size == 1 &&
        Set(10L, 11L, 12L, 13L).map(gotP).size == 1 &&
        gotP(0L) != gotP(10L),
      s"bridged cliques not split into two communities: $gotP")
    // random graphs: the fixed-round iterate, whatever it is, must match
    val rng = new Random(17)
    val edges = (for {
      a <- 0L until 40L; b <- (a + 1) until 40L if rng.nextDouble() < 0.08
    } yield (a, b)).toList
    for (rounds <- Seq(1, 3)) {
      val got = Graph.labelPropagation(edges.toDF("a", "b"), "a", "b", rounds)
        .as[(Long, Long)].collect().toMap
      Caches.releaseAll()
      assert(got == brute(edges, rounds), s"rounds=$rounds")
    }
  }

  test("peakConcurrency equals brute force on random intervals, any chunk width") {
    val rng = new Random(67)
    val iv = (0 until 300).map { i =>
      val s = rng.nextInt(500).toLong
      ("k" + (i % 2), i.toLong, s, s + rng.nextInt(80).toLong)
    }
    val df = iv.toDF("k", "id", "start", "end")
    def brute(k: String): (Long, Long) = {
      val ivs = iv.filter(_._1 == k)
      val alive = ivs.map(_._3).distinct.sorted
        .map(t => (t, ivs.count(v => v._3 <= t && t <= v._4).toLong))
      val peak = alive.map(_._2).max
      (peak, alive.filter(_._2 == peak).map(_._1).min)
    }
    for (w <- Seq(1L, 37L, 1000L)) {
      val got = Segments.peakConcurrency(df, Seq("k"), "start", "end",
        chunkWidth = w, tiebreak = Seq(col("id")))
        .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got("k0") == brute("k0") && got("k1") == brute("k1"), s"chunkWidth=$w")
    }
  }

  test("applyCdc: latest D deletes, later U resurrects, base and I rows survive") {
    val base = Seq((1L, 10L, "a"), (2L, 10L, "b"), (3L, 10L, "c")).toDF("k", "ts", "v")
    val ops = Seq(
      (1L, 20L, "a2", "U"), (1L, 30L, "a2", "D"), // U then D -> deleted
      (2L, 20L, "b2", "D"), (2L, 30L, "b3", "U"), // D then U -> resurrected
      (4L, 20L, "d", "I") // fresh insert
    ).toDF("k", "ts", "v", "op")
    val got = Cdc.applyCdc(base, ops, Seq("k"), Seq(col("ts")))
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((2L, 30L, "b3"), (3L, 10L, "c"), (4L, 20L, "d")))
  }

  test("abWelchZ closed form and degenerate-arm NULL guard") {
    val df = Seq(
      ("t", 0L, 1.0), ("t", 2L, 2.0), ("t", 4L, 3.0), // arm A: mean 2, var 1
      ("t", 1L, 2.0), ("t", 3L, 4.0), // arm B: mean 3, var 2
      ("u", 0L, 5.0), ("u", 1L, 1.0), ("u", 3L, 2.0) // arm A has n=1 -> z NULL
    ).toDF("k", "uid", "v")
    val got = Stats.abWelchZ(df, Seq("k"), pmod(col("uid"), lit(2L)) === 0, "v")
      .select("k", "n_a", "n_b", "mean_a", "mean_b", "z")
      .as[(String, Long, Long, Double, Double, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    val t = got("t")
    assert((t._2, t._3, t._4, t._5) == ((3L, 2L, 2.0, 3.0)))
    assert(t._6.get == (2.0 - 3.0) / math.sqrt(1.0 / 3 + 2.0 / 2))
    assert(got("u")._6.isEmpty)
  }

  test("cuped: closed-form theta on perfect correlation; adjusted z gains power on noisy") {
    // y = 2x exactly -> theta = 2 and the adjusted metric is constant:
    // zero pooled variance, so z_cuped is the guarded NULL
    val perfect = (0 until 40).map(i => ("k", i.toLong, (i % 7 + 1).toDouble, 2.0 * (i % 7 + 1)))
      .toDF("k", "uid", "x", "y")
    val p = Stats.cuped(perfect, Seq("k"), "x", "y", pmod(col("uid"), lit(2L)) === 0)
      .select("theta", "z_cuped").as[(Double, Option[Double])].head()
    assert(p._1 == 2.0 && p._2.isEmpty)

    // y = x + deterministic noise + a lift on arm A: the covariate explains
    // most variance, so the adjusted z must strictly dominate the raw z
    val rng = new Random(5)
    val noisy = (0 until 400).map { i =>
      val x = rng.nextGaussian() * 10 + 50
      val lift = if (i % 2 == 0) 0.8 else 0.0
      ("k", i.toLong, x, x + rng.nextGaussian() * 1.5 + lift)
    }.toDF("k", "uid", "x", "y")
    val n = Stats.cuped(noisy, Seq("k"), "x", "y", pmod(col("uid"), lit(2L)) === 0)
      .select("z_raw", "z_cuped").as[(Double, Double)].head()
    assert(math.abs(n._2) > math.abs(n._1),
      s"CUPED did not reduce variance: z_raw=${n._1} z_cuped=${n._2}")
    assert(math.abs(n._2) > 2.0, s"planted lift not detected: z_cuped=${n._2}")
  }

  test("ohlc state is a monoid: merged batch partials equal the from-scratch aggregate") {
    val rng = new Random(31)
    val rows = (0 until 600).map { i =>
      (s"k${i % 3}", i.toLong * 10 + rng.nextInt(5), i.toLong, rng.nextGaussian() * 50)
    }
    val df = rows.toDF("k", "ts", "id", "v")
    val keys = Seq("k")
    def fin(parts: org.apache.spark.sql.DataFrame) =
      Incremental.ohlcFinalize(parts)
        .select("k", "n", "open", "high", "low", "close")
        .as[(String, Long, Double, Double, Double, Double)].collect().toSet
    val scratch = fin(Incremental.ohlcPartials(df, keys, "ts", "id", "v"))
    for (cuts <- Seq(Seq(200), Seq(17, 401))) {
      val bounds = (0 +: cuts) :+ 600
      val batches = bounds.sliding(2).map { case Seq(a, b) =>
        Incremental.ohlcPartials(rows.slice(a, b).toDF("k", "ts", "id", "v"), keys, "ts", "id", "v")
      }.toSeq
      val merged = batches.reduce(Incremental.ohlcMerge(_, _, keys))
      assert(fin(merged) == scratch, s"cuts=$cuts")
    }
  }

  test("cusumChangepoint: location invariant under integer shift and positive scale") {
    // integer inputs quantize exactly, so v -> m·v + c maps the deviation
    // D -> m·D (the shift telescopes out of n·S_i − i·S_n): the argmax
    // index cannot move and the stat scales by exactly m
    val rng = new Random(83)
    val vs0 = Seq.fill(60)(rng.nextInt(101) - 50)
    def run(f: Int => Double) = {
      val df = vs0.zipWithIndex.map { case (v, i) => ("k", i.toLong, f(v)) }.toDF("k", "i", "v")
      Stats.cusumChangepoint(df, Seq("k"), Seq(col("i")), "v",
        chunk = expr("i DIV 16"), carry = Seq("i"))
        .select("i", "cp_idx", "cusum_stat").as[(Long, Long, Double)].head()
    }
    val base = run(v => v.toDouble)
    for ((scale, shift) <- Seq((1, 13), (1, -20), (3, 0), (5, 7))) {
      val moved = run(v => (scale * v + shift).toDouble)
      assert(moved._1 == base._1 && moved._2 == base._2 && moved._3 == scale * base._3,
        s"scale=$scale shift=$shift base=$base moved=$moved")
    }
  }

  test("cusumChangepoint is partition-invariant and NULL-excluding") {
    val rng = new Random(11)
    val base = (0 until 500).map(i =>
      ("k", i.toLong, if (i % 17 == 0) null else java.lang.Double.valueOf(rng.nextGaussian() + (if (i > 300) 2.0 else 0.0))))
    val df = base.toDF("k", "i", "v")
    def run(parts: Int) =
      Stats.cusumChangepoint(df.repartition(parts), Seq("k"), Seq(col("i")), "v", carry = Seq("i"))
        .as[(String, Long, Long, Long, Double)].collect().toSet
    val r1 = run(1)
    assert(r1 == run(13))
    // NULL rows don't index: n counts only the non-null rows
    assert(r1.head._3 == base.count(_._3 != null))
  }
}
