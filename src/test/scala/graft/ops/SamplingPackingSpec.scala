package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingPackingSpec extends SparkSpec {
  import spark.implicits._

  test("assignSplit: covers every row, roughly proportional, stable under corpus growth") {
    val small = spark.range(1000).toDF("id")
    val big = spark.range(5000).toDF("id")
    val cuts = Seq(("train", 8), ("val", 9), ("test", 10))
    val s1 = Sampling.assignSplit(small, "id", 10, cuts)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(s1.values.sum == 1000 && s1.keySet == Set("train", "val", "test"))
    assert(s1("train") > 700 && s1("train") < 900) // hash-uniform ±
    // growth stability: the same id keeps its split when the corpus grows
    val a = Sampling.assignSplit(small, "id", 10, cuts).as[(Long, String)].collect().toMap
    val b = Sampling.assignSplit(big, "id", 10, cuts).as[(Long, String)].collect().toMap
    assert(a.forall { case (id, sp) => b(id) == sp })
  }

  test("sampleDeterministic: repeatable subset, sample(1/1) is everything, (0/n) empty") {
    val df = spark.range(2000).toDF("id")
    val s1 = Sampling.sampleDeterministic(df, "id", 1, 10).as[Long].collect().toSet
    val s2 = Sampling.sampleDeterministic(df, "id", 1, 10).as[Long].collect().toSet
    assert(s1 == s2 && s1.nonEmpty && s1.size < 2000)
    assert(Sampling.sampleDeterministic(df, "id", 10, 10).count() == 2000)
    assert(Sampling.sampleDeterministic(df, "id", 0, 10).count() == 0)
  }

  test("stratifiedSample caps each stratum, deterministically") {
    val df = (0L until 100L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val s1 = Sampling.stratifiedSample(df, "id", Seq("lang"), 7)
      .as[(Long, String)].collect().toSet
    val s2 = Sampling.stratifiedSample(df, "id", Seq("lang"), 7)
      .as[(Long, String)].collect().toSet
    assert(s1 == s2)
    assert(s1.count(_._2 == "en") == 7 && s1.count(_._2 == "de") == 7)
    // a stratum smaller than the cap is kept whole
    val tiny = Sampling.stratifiedSample(df.filter(col("id") < 3), "id", Seq("lang"), 7)
    assert(tiny.count() == 3)
  }

  test("tokenBudgetLedger keeps the maximal hash-order prefix, bit-equal to the direct window") {
    // skewed strata: 'en' holds 180 of 200 docs (the hot-key regime the
    // chunked scan exists for), token counts vary 1..40
    val df = (0L until 200L)
      .map(i => (i, if (i % 10 == 0) "de" else "en", 1L + i % 40L))
      .toDF("doc_id", "lang", "n_tokens")
    val out = Sampling.tokenBudgetLedger(df, "doc_id", "lang", "n_tokens", 150L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length == 200) // full ledger, rejected tail included
    // bit-equal to the direct per-stratum ordered window (integer sums are
    // associative, so the two-phase chunked scan must agree exactly)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(Sampling.hashU24(col("doc_id")), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val direct = df.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("keep", (col("cum_tokens") <= 150L).cast("long"))
      .select("doc_id", "lang", "n_tokens", "cum_tokens", "keep")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.sortBy(_._1).toSeq == direct.sortBy(_._1).toSeq)
    // the kept set is the MAXIMAL prefix: every stratum's kept total fits
    // the budget and its first rejected doc would overflow it
    for ((lang, rows) <- out.groupBy(_._2)) {
      val ordered = rows.sortBy(r => (r._4, r._1)) // cum_tokens is the order
      val (kept, dropped) = ordered.span(_._5 == 1L)
      assert(dropped.forall(_._5 == 0L), s"$lang keep set is not a prefix")
      assert(kept.nonEmpty && kept.last._4 <= 150L, s"$lang budget exceeded")
      dropped.headOption.foreach(d =>
        assert(d._4 > 150L, s"$lang first rejected doc still fits: $d"))
    }
    // determinism under repartitioning: same ledger from a shuffled input
    val re = Sampling.tokenBudgetLedger(df.repartition(13), "doc_id", "lang", "n_tokens", 150L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(re.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("contaminationCheck flags shared shingles against the benchmark, keeps clean docs") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // contains bench 5-gram
      (2L, "one two three four five six seven")    // clean
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val out = Dedup.contaminationCheck(train, bench, "doc_id", "text", 5)
      .select("doc_id", "n_shared_grams", "n_bench_docs", "contaminated")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (a, b, c, d) => a -> ((b, c, d)) }.toMap
    graft.ops.Caches.releaseAll()
    assert(out(1L) == ((1L, 1L, 1L)))
    assert(out(2L) == ((0L, 0L, 0L)))
  }

  test("mixtureSample: rate 1 keeps all, rate 0 drops all, rates are per-stratum and stable") {
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "keep" else "thin"))
      .toDF("id", "src")
    val out = Sampling.mixtureSample(df, "id", "src", Map("keep" -> 1.0, "thin" -> 0.2))
      .as[(Long, String)].collect()
    assert(out.count(_._2 == "keep") == 500) // rate 1.0: everything survives
    val thin = out.count(_._2 == "thin")
    assert(thin > 50 && thin < 150, s"thin kept $thin of 500 at rate 0.2")
    // default rate 0 drops unknown strata entirely
    val dropped = Sampling.mixtureSample(df, "id", "src", Map("keep" -> 1.0))
    assert(dropped.filter(col("src") === "thin").count() == 0)
    // stability: same rows on every evaluation
    val again = Sampling.mixtureSample(df, "id", "src", Map("keep" -> 1.0, "thin" -> 0.2))
      .as[(Long, String)].collect()
    assert(out.toSet == again.toSet)
  }

  test("saltedJoin equals the plain join exactly; rankNormalize ties share a quantile") {
    val big = (0L until 200L).map(i => (i % 5, i, i * 0.5)).toDF("k", "payload", "v")
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e")).toDF("k", "lbl")
    val salted = Skew.saltedJoin(big, small, "k", "payload", 4)
      .select("k", "payload", "v", "lbl").as[(Long, Long, Double, String)].collect().toSet
    val plain = big.join(small, "k")
      .select("k", "payload", "v", "lbl").as[(Long, Long, Double, String)].collect().toSet
    assert(salted == plain && plain.size == 200)

    val vals = Seq(("g", 1.0), ("g", 2.0), ("g", 2.0), ("g", 4.0)).toDF("grp", "v")
    val q = Scaling.rankNormalize(vals, Seq("grp"), "v", "q")
      .select("v", "q").as[(Double, Double)].collect().toSet
    // ranks: 1, 2, 2, 4 over n=4 → q = 0, 1/3, 1/3, 1
    assert(q == Set((1.0, 0.0), (2.0, 1.0 / 3.0), (4.0, 1.0)))
  }

  test("packSequences: offsets accumulate in id order, pack flips at capacity, spill keeps start pack") {
    // one shard; docs of 4 tokens each, capacity 10: starts at 0,4,8,12,…
    val docs = (0L to 4L).map(i => (i, "a b c d")).toDF("doc_id", "text")
    val out = Text.packSequences(docs, "doc_id", "text", 10, 1)
      .select("doc_id", "pack_id", "pack_offset")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // cum-before: 0,4,8,12,16 → packs 0,0,0,1,1; offsets 0,4,8,2,6
    assert(out == Seq((0L, 0L, 0L), (1L, 0L, 4L), (2L, 0L, 8L), (3L, 1L, 2L), (4L, 1L, 6L)))
  }

  test("packSequences shards independently") {
    val docs = (0L to 3L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val out = Text.packSequences(docs, "doc_id", "text", 4, 2)
      .select("doc_id", "shard", "pack_offset").as[(Long, Long, Long)].collect().toSet
    // shard 0: ids 0,2 → offsets 0,3; shard 1: ids 1,3 → offsets 0,3
    assert(out == Set((0L, 0L, 0L), (2L, 0L, 3L), (1L, 1L, 0L), (3L, 1L, 3L)))
  }

  test("budgetedPrefix keeps the greedy prefix per group, never splits a row") {
    val df = Seq(
      ("s0", 1L, 3L), ("s0", 2L, 4L), ("s0", 3L, 5L), // cums 3,7,12
      ("s1", 4L, 9L), ("s1", 5L, 1L)                  // cums 9,10
    ).toDF("src", "id", "w")
    val out = Sampling.budgetedPrefix(df, Seq("src"), Seq(col("id")), "w", 8L)
      .select("src", "id", "cum_weight").as[(String, Long, Long)].collect().toSet
    // s0: rows 1,2 fit (3,7), row 3 would hit 12 > 8 -> cut; s1: row 4 hits
    // 9 > 8 immediately -> NOTHING kept (an over-budget row is not split,
    // and positive weights make the cumsum monotone so nothing after it fits)
    assert(out == Set(("s0", 1L, 3L), ("s0", 2L, 7L)))
  }

  test("temperatureMixtureSqrt: sqrt-flattened shares, arg-min stratum keeps ~all") {
    // 9:1 two-stratum corpus: p = (.9, .1); w = (√.9, √.1); shares ≈
    // (.75, .25); scale s = min(.9/.75, .1/.25) = .4 → heavy keeps
    // .4·.75/.9 = 1/3 (3333 per 10k), light keeps ~all
    val df = ((1 to 90).map(i => (i.toLong, "en")) ++ (91 to 100).map(i => (i.toLong, "de")))
      .toDF("doc_id", "lang")
    val out = Sampling.temperatureMixtureSqrt(df, "lang")
      .select("lang", "n_docs", "p", "target_share", "keep_per_10k")
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("en")._2 == 90L && out("en")._3 == 0.9)
    assert(out("de")._2 == 10L && out("de")._3 == 0.1)
    // sqrt flattening: the heavy share drops below p, the light rises
    assert(out("en")._4 < 0.9 && out("en")._4 > 0.7)
    assert(out("de")._4 > 0.1 && out("de")._4 < 0.3)
    assert(math.abs(out("en")._4 + out("de")._4 - 1.0) < 1e-6)
    assert(out("en")._5 == 3333L)
    // the arg-min stratum's keep rate closes to ~1 (9999 or 10000 — the
    // (p/t)·(t/p) product is an IEEE dag, not algebra; both engines agree)
    assert(out("de")._5 >= 9999L && out("de")._5 <= 10000L)
    // every row emitted exactly once per stratum
    assert(out.size == 2)
  }

  test("weightedSample matches a local A-ES reference bit-for-bit and is repeatable") {
    val rows = (0L until 200L).map(i => (i, "g" + (i % 2), 1L + i % 17))
    val df = rows.toDF("id", "grp", "w")
    def localKey(id: Long, seed: String, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${id}_$seed".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      val u = (java.lang.Long.parseLong(hex, 16) + 1L).toDouble / 16777217.0
      math.log(u) / w.toDouble
    }
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(r => (-localKey(r._1, "tst", r._3), r._1)).take(10).map(r => (g, r._1))
    }.toSet
    val got = Sampling.weightedSample(df, Seq("grp"), "id", "w", 10, "tst")
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(got == expected)
    val again = Sampling.weightedSample(
        df.repartition(7), Seq("grp"), "id", "w", 10, "tst")
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(again == got) // partition-count-invariant
  }

  test("weightedSample and budgetedPrefix fail loudly on invalid weights") {
    val bad = Seq((1L, "g", 5L), (2L, "g", -3L)).toDF("id", "grp", "w")
    val e1 = intercept[Exception] {
      Sampling.weightedSample(bad, Seq("grp"), "id", "w", 2, "s").collect()
    }
    assert(e1.getMessage.contains("non-positive or NULL weight") ||
      Option(e1.getCause).exists(_.getMessage.contains("non-positive or NULL weight")))
    // NULL weights must ALSO fail loudly: NULL <= 0 is NULL, so an
    // error-side guard would let the row fall through with a NULL key
    // and silently enter any under-filled group
    val withNull: Seq[(Long, String, java.lang.Long)] =
      Seq((1L, "g", java.lang.Long.valueOf(5L)), (2L, "g", null: java.lang.Long))
    val e1b = intercept[Exception] {
      Sampling.weightedSample(withNull.toDF("id", "grp", "w"), Seq("grp"), "id", "w", 2, "s")
        .collect()
    }
    assert(e1b.getMessage.contains("non-positive or NULL weight") ||
      Option(e1b.getCause).exists(_.getMessage.contains("non-positive or NULL weight")))
    val e2 = intercept[Exception] {
      Sampling.budgetedPrefix(bad, Seq("grp"), Seq(col("id")), "w", 8L).collect()
    }
    assert(e2.getMessage.contains("negative weight") ||
      Option(e2.getCause).exists(_.getMessage.contains("negative weight")))
  }

  test("dsirLedger: target-like pool docs outrank off-target ones; ledger covers the pool; top-k selected") {
    // target = 'en' docs built from one vocabulary; the pool's planted doc
    // reuses that vocabulary verbatim, the rest of the pool uses disjoint
    // tokens. DSIR's importance weight must put the planted doc at
    // sel_rank 1 in its stratum: its buckets carry high target counts,
    // the off-target buckets only the Laplace prior.
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog sat on the rug"),
      (3L, "en", "a cat and a dog sat"),
      (10L, "xx", "the cat sat on the rug"), // planted: target vocabulary
      (11L, "xx", "zorp blif quux narg flib"),
      (12L, "xx", "vex jum wib lorp snek"),
      (13L, "yy", "the dog sat"), // planted for stratum yy
      (14L, "yy", "grum thok plin zzed worv")
    ).toDF("doc_id", "lang", "text")
    val led = Sampling.dsirLedger(docs, "doc_id", "text", "lang", "en",
      buckets = 64, kPerStratum = 1)
      .select("doc_id", "lang", "dsir_logweight", "sel_rank", "selected")
      .as[(Long, String, Double, Long, Long)].collect()
    // ledger = pool only, every pool doc present
    assert(led.map(_._1).sorted.toSeq == Seq(10L, 11L, 12L, 13L, 14L))
    val byId = led.map(r => r._1 -> r).toMap
    assert(byId(10L)._4 == 1L && byId(10L)._5 == 1L,
      s"planted xx doc not top-ranked: ${led.toSeq}")
    assert(byId(13L)._4 == 1L && byId(13L)._5 == 1L,
      s"planted yy doc not top-ranked: ${led.toSeq}")
    // the planted docs carry strictly higher weights than their stratum mates
    assert(byId(10L)._3 > byId(11L)._3 && byId(10L)._3 > byId(12L)._3)
    assert(byId(13L)._3 > byId(14L)._3)
    // with kPerStratum = 1, exactly one selected per stratum
    assert(led.count(_._5 == 1L) == 2)
    // run-twice determinism (the selection-set contract)
    val led2 = Sampling.dsirLedger(docs, "doc_id", "text", "lang", "en",
      buckets = 64, kPerStratum = 1)
      .select("doc_id", "lang", "dsir_logweight", "sel_rank", "selected")
      .as[(Long, String, Double, Long, Long)].collect()
    assert(led.sortBy(_._1).toSeq == led2.sortBy(_._1).toSeq)
  }

  test("epochPlan: tail strata repeat up to the cap, head downsamples, plan is the milli-epoch quantization") {
    // 90k/9k/1k token split: sqrt temperature lifts the tail hard enough
    // that the cap binds for the 1k stratum under a 100k budget
    val df = (
      (1 to 90).map(i => (i.toLong, "en", 1000L)) ++
        (91 to 99).map(i => (i.toLong, "de", 1000L)) ++
        Seq((100L, "fi", 1000L))
      ).toDF("doc_id", "lang", "n_tokens")
    val out = Sampling.epochPlan(df, "lang", "n_tokens", budgetTokens = 100000L,
        maxMilliEpochs = 4000L)
      .select("lang", "n_docs", "tokens_avail", "target_share", "tokens_target",
        "epochs_milli", "tokens_planned")
      .as[(String, Long, Long, Double, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size == 3)
    assert(out("en")._3 == 90000L && out("de")._3 == 9000L && out("fi")._3 == 1000L)
    // shares: √(.9/.09/.01) normalized ≈ .7034/.2224/.0742 — sum to ~1,
    // head flattened below p, tail lifted above
    assert(math.abs(out.values.map(_._4).sum - 1.0) < 1e-9)
    assert(out("en")._4 < 0.9 && out("fi")._4 > 0.01)
    // fi: target ≈ 7549 tokens over 1000 avail → cap 4000 binds
    assert(out("fi")._6 == 4000L && out("fi")._7 == 4000L)
    // de: target ≈ 22636 over 9000 avail → 2515 milli-epochs, repeats
    assert(out("de")._6 > 1000L && out("de")._6 < 4000L)
    // en: target ≈ 71610 over 90000 avail → downsamples below one epoch
    assert(out("en")._6 < 1000L)
    // the plan is exactly the milli-epoch quantization of the target
    for ((_, r) <- out) {
      assert(r._6 == math.min(4000L, 1000L * r._5 / r._3))
      assert(r._7 == r._3 * r._6 / 1000L)
      assert(r._7 <= r._5, s"planned exceeds target for ${r._1}")
    }
  }

  test("rankBuckets == the direct per-stratum window for any chunking; bucket sizes differ by <= 1") {
    // skewed strata + duplicate scores (tiebreak by id) + a coarse chunk
    // that lumps many scores per chunk — the scan must still agree
    val df = (0L until 300L)
      .map(i => (i, if (i % 5 == 0) "de" else "en", -((i % 37).toDouble) / 7.0))
      .toDF("doc_id", "lang", "score")
    val got = Sampling.rankBuckets(df, Seq("lang"),
        Seq(col("score").desc, col("doc_id")), nBuckets = 3,
        chunk = floor(-col("score") * lit(2.0d)).cast("long"),
        rankCol = "rk", bucketCol = "b")
      .select("doc_id", "lang", "rk", "b")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("score").desc, col("doc_id"))
    val direct = df
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("lang")))
      .select(col("doc_id"), col("lang"), col("rk"),
        expr("((rk - 1) * 3) DIV n").as("b"))
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == direct)
    // tertile sizes differ by at most one within each stratum
    for ((_, rows) <- got.groupBy(_._2)) {
      val sizes = rows.groupBy(_._4).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"uneven buckets: $sizes")
    }
    // determinism under repartitioning
    val re = Sampling.rankBuckets(df.repartition(11), Seq("lang"),
        Seq(col("score").desc, col("doc_id")), nBuckets = 3,
        chunk = floor(-col("score") * lit(2.0d)).cast("long"),
        rankCol = "rk", bucketCol = "b")
      .select("doc_id", "lang", "rk", "b")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(re == got)
  }

  test("shardAssign: round-robin deal — per-stratum shard sizes differ by <= 1, matches the direct window") {
    val df = (0L until 250L)
      .map(i => (i, if (i % 4 == 0) "de" else "en", 1L + i % 23L))
      .toDF("doc_id", "lang", "n_tokens")
    val got = Sampling.shardAssign(df, "doc_id", "lang", "n_tokens", nShards = 8)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(Sampling.hashU24(col("doc_id")), col("doc_id"))
    val direct = df
      .withColumn("shard", pmod(row_number().over(w).cast("long") - 1L, lit(8L)))
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == direct)
    for ((_, rows) <- got.groupBy(_._2)) {
      val sizes = (0L until 8L).map(s => rows.count(_._4 == s))
      assert(sizes.max - sizes.min <= 1, s"unbalanced shards: $sizes")
    }
    // stable under repartitioning (the reproducible-layout contract)
    val re = Sampling.shardAssign(df.repartition(9), "doc_id", "lang", "n_tokens", 8)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(re == got)
  }

  test("sourceCapLedger: per-source keeps = min(n, cap), ranks a bijection, matches the direct window, partition-stable") {
    // 3 sources: over-cap (40 docs), exactly-at-cap (15), under-cap (4)
    val df = ((0L until 40L).map(i => (i, "big")) ++
      (100L until 115L).map(i => (i, "mid")) ++
      (200L until 204L).map(i => (i, "tiny"))).toDF("doc_id", "source")
    val led = Sampling.sourceCapLedger(df, "doc_id", "source", maxDocs = 15)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(led.size == 59) // full ledger: every row present
    val bySrc = led.groupBy(_._2)
    assert(bySrc("big").count(_._4 == 1L) == 15 && bySrc("big").count(_._4 == 0L) == 25)
    assert(bySrc("mid").forall(_._4 == 1L) && bySrc("tiny").forall(_._4 == 1L))
    // ranks are a 1..n bijection per source, keep <=> rank <= cap
    bySrc.foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted == (1L to rows.size).toSeq, s"ranks not dense for $s")
      assert(rows.forall(r => (r._4 == 1L) == (r._3 <= 15L)), s"keep flag wrong for $s")
    }
    // bit-equality with the direct per-source window in (hash, id) order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(Sampling.hashU24(col("doc_id")), col("doc_id"))
    val direct = df
      .withColumn("src_rank", row_number().over(w).cast("long"))
      .withColumn("keep", (col("src_rank") <= 15L).cast("long"))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(led.toSet == direct)
    // repartitioning must not change the admitted set
    val re = Sampling.sourceCapLedger(df.repartition(7), "doc_id", "source", 15)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(re == led.toSet)
  }
}
