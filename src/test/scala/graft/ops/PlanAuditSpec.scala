package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan-shape assertions for the scale-critical operators: the 100 TB
  * posture claims (broadcast the small side, stream the corpus, no stray
  * exchange) pinned against the actual physical plans, so a refactor that
  * silently flips a join strategy fails CI instead of a cluster run.
  */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("contaminationCheck broadcasts the benchmark shingles, not the corpus") {
    val train = (0L until 50L).map(i => (i, s"alpha beta gamma tok$i delta epsilon zeta"))
      .toDF("doc_id", "text")
    val bench = Seq((900L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val p = plan(Dedup.contaminationCheck(train, bench, "doc_id", "text", 5))
    Caches.releaseAll()
    assert(p.contains("BroadcastHashJoin"), s"benchmark side not broadcast:\n$p")
  }

  test("randomProject broadcasts the sign matrix") {
    val df = (0L until 20L).map(i => (i, Array.fill(8)(0.1f))).toDF("vec_id", "embedding")
    val p = plan(Vectors.randomProject(df, "vec_id", "embedding", 8, 4))
    assert(p.contains("BroadcastHashJoin"), s"sign matrix not broadcast:\n$p")
  }

  test("stratifiedSample is one shuffle (single window, no join)") {
    val df = (0L until 100L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "g")
    val p = plan(Sampling.stratifiedSample(df, "id", Seq("g"), 3))
    assert(!p.contains("Join"), s"unexpected join:\n$p")
    // exactly one exchange: the strata partitioning for the window
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$p")
  }

  test("assignSplit and sampleDeterministic are pure projections/filters — zero exchanges") {
    val df = spark.range(100).toDF("id")
    val p1 = plan(Sampling.assignSplit(df, "id", 10, Seq(("train", 8), ("val", 9), ("test", 10))))
    val p2 = plan(Sampling.sampleDeterministic(df, "id", 1, 10))
    assert(!p1.contains("Exchange") && !p2.contains("Exchange"))
  }

  test("bigramLogProb: ONE broadcast join against the scored vocab, corpus bag never SMJs") {
    // the unigramLogProb lesson (fresh aggregates have no stats — without
    // the hint the planner SMJs the token bag on string keys, the
    // 40s→8.5s probe regression) plus the per-type scoring move: the
    // prefix counts come from a WINDOW over the fitted bigram vocab
    // (c(w1·) = Σ_w2 c(w1 w2)), so the corpus bag is joined exactly once,
    // against the broadcast scored table — one BroadcastHashJoin, zero
    // SortMergeJoins, and the MathLn sits on the vocab side of the join
    val df = (0L until 40L).map(i => (i, s"alpha beta gamma tok${i % 5} delta"))
      .toDF("doc_id", "text")
    val p = plan(Text.bigramLogProb(df, "doc_id", "text"))
    val bcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bcasts == 1, s"expected the one scored-vocab broadcast join, got $bcasts:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus bag SMJ'd on string keys:\n$p")
  }

  test("macroAuc grid: the class list broadcasts; corpus side streams") {
    val df = (0L until 60L).map(i => (i, Seq("en", "de", "fr")(i.toInt % 3), i % 7))
      .toDF("doc_id", "lang", "score")
    val classes = df.select(col("lang").as("class")).distinct()
    val grid = df.crossJoin(broadcast(classes))
    val p = plan(grid)
    assert(p.contains("BroadcastNestedLoopJoin"), s"class grid not broadcast:\n$p")
  }

  test("Cdc.upsert plans a WindowGroupLimit (rn=1 pruned during the sort, no full window)") {
    val base = (0L until 50L).map(i => (i % 10, i, s"b$i")).toDF("k", "ts", "v")
    val upd = (0L until 20L).map(i => (i % 10, i + 100, s"u$i")).toDF("k", "ts", "v")
    val p = plan(Cdc.upsert(base, upd, Seq("k"), Seq(col("ts"))))
    assert(p.contains("WindowGroupLimit"), s"row_number filter not pushed into the sort:\n$p")
  }

  test("ewmaDyadic is scatter-shaped: no sort-merge pair enumeration, bounded explode") {
    val df = (0L until 200L).map(i => (i % 4, i, (i % 90).toDouble)).toDF("k", "ts", "v")
    val p = plan(Windows.ewmaDyadic(df, Seq("k"), Seq(col("ts")), "v"))
    // the join back to real rows is equi-keyed on (k, rn): SMJ or
    // broadcast is fine — what must NOT appear is a join keyed on k alone
    // with the rank band as a post-join Filter (the quadratic shape)
    assert(p.contains("Generate explode"), s"missing in-stage scatter explode:\n$p")
    assert(!p.toLowerCase.contains("cartesian"), s"cartesian product:\n$p")
    val joinLines = p.linesIterator.filter(_.contains("Join")).mkString("\n")
    assert(joinLines.contains("__trn") || joinLines.contains("__rn"),
      s"join not keyed on the target row number:\n$joinLines")
  }

  test("intervalOverlap joins on (key, bucket) — containment is residual, not the key") {
    val intervals = (0L until 40L).map(i => (i % 4, i, i * 10, i * 10 + 25))
      .toDF("k", "iid", "start", "end")
    val points = (0L until 200L).map(i => (i % 4, i * 2)).toDF("k", "ts")
    val p = plan(Joins.intervalOverlap(intervals, points, Seq("k"), "start", "end", "ts", 16L))
    assert(!p.toLowerCase.contains("cartesian"), s"cartesian product:\n$p")
    // the equi-key must include the scattered bucket — a join keyed on k
    // alone with the range as a post-condition is the per-key-quadratic SMJ
    val joinLines = p.linesIterator.filter(_.contains("Join")).mkString("\n")
    assert(joinLines.contains("__b"), s"join not keyed on the time bucket:\n$joinLines")
  }

  test("countMinHeavyHitters broadcasts the sketch grid, never shuffles it") {
    val df = (0L until 500L).map(i => s"k${i % 37}").toDF("k")
    val p = plan(Sketch.countMinHeavyHitters(df, "k", 4, 64, 5L))
    Caches.releaseAll()
    assert(p.contains("BroadcastHashJoin"), s"sketch not broadcast:\n$p")
  }

  test("bloomContaminationCheck probes in-stage: filter sits under the verify join") {
    val train = (0L until 50L).map(i => (i, s"alpha beta gamma tok$i delta epsilon zeta"))
      .toDF("doc_id", "text")
    val bench = Seq((900L, "alpha beta gamma delta epsilon zeta eta")).toDF("doc_id", "text")
    val p = plan(Dedup.bloomContaminationCheck(train, bench, "doc_id", "text", 5,
      mBits = 1 << 12, kHash = 3))
    Caches.releaseAll()
    // the bloom row arrives via a 1-row broadcast nested loop whose JOIN
    // CONDITION is the fused bit test (Catalyst folds the crossJoin +
    // filter together), and the exact verify join on sk sits ABOVE it —
    // so only bloom survivors reach the verify hash join
    val lines = p.linesIterator.toVector
    val idxBloom = lines.indexWhere(l =>
      l.contains("BroadcastNestedLoopJoin") && l.contains("__bloom") && l.contains("element_at"))
    val idxVerify = lines.indexWhere(l => l.contains("BroadcastHashJoin [sk"))
    assert(idxBloom >= 0, s"no fused bloom bit-test nested-loop join:\n$p")
    assert(idxVerify >= 0 && idxVerify < idxBloom,
      s"verify join not ABOVE the bloom probe (probe must feed it):\n$p")
  }

  test("overlapFraction broadcasts the benchmark shingles, not the corpus") {
    val train = (0L until 50L).map(i => (i, s"alpha beta gamma tok$i delta epsilon zeta"))
      .toDF("doc_id", "text")
    val bench = Seq((900L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val p = plan(Dedup.overlapFraction(train, bench, "doc_id", "text", 5))
    Caches.releaseAll()
    assert(p.contains("BroadcastHashJoin"), s"benchmark side not broadcast:\n$p")
  }

  test("unigramLogProb: vocab and grand-total broadcast — the token bag never shuffles for the join") {
    val df = (0L until 50L).map(i => (i, s"alpha beta tok$i")).toDF("doc_id", "text")
    val p = plan(Text.unigramLogProb(df, "doc_id", "text"))
    assert(p.contains("BroadcastHashJoin"), s"vocab not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"token bag shuffled for the join:\n$p")
    assert(!p.contains("CartesianProduct"), s"shuffled cartesian in plan:\n$p")
  }

  test("native hopping window is one Expand + hash agg — no join, no explode") {
    val df = (0L until 1000L).map(i => (i * 60000000L, i % 3, i * 1.0))
      .toDF("ts_us", "event_type", "value")
      .withColumn("__tsx", timestamp_micros(col("ts_us")))
    val agg = df.groupBy(window(col("__tsx"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val p = plan(agg)
    assert(p.contains("Expand"), s"no Expand (window slots):\n$p")
    assert(!p.contains("Join"), s"unexpected join:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$p")
  }

  test("unpivot plans as an in-stage Expand: no exchange, no join") {
    val df = (0L until 50L).map(i => (i, i * 1.0, i * 2.0)).toDF("id", "a", "b")
    val p = plan(df.unpivot(
      Array(col("id")), Array(col("a"), col("b")), "metric", "value"))
    assert(p.contains("Expand"), s"no Expand:\n$p")
    assert(!p.contains("Exchange") && !p.contains("Join"), s"melt should be narrow:\n$p")
  }

  test("zipfFit: no unpartitioned window — the only global sort is over distinct counts") {
    val df = (0L until 60L).map(i => (i, s"tok${i % 7} tok${i % 3} filler$i"))
      .toDF("doc_id", "text")
    val p = plan(Text.zipfFit(df, "text"))
    // the tie-rank window must be partitioned by cnt (parallel); the
    // distinct-count offsets frame is the only place a global order exists
    // and it is vocabulary-distinct-count sized, not vocabulary sized
    assert(
      "windowspecdefinition\\(cnt#".r.findFirstIn(p).isDefined,
      s"tie-rank window lost its cnt partitioning:\n$p")
  }

  test("pmiCollocations: vocab/totals broadcast, top-k is TakeOrdered (no global sort)") {
    val df = (0L until 40L).map(i => (i, s"alpha beta tok${i % 4} gamma delta"))
      .toDF("doc_id", "text")
    val p = plan(Text.pmiCollocations(df, "text", 2, 10))
    val bcasts = "BroadcastHashJoin|BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bcasts >= 3, s"expected unigram x2 + totals broadcast, got $bcasts:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k fell back to a global sort:\n$p")
  }

  test("skyline2d stage 1 windows partition on the bucket — no full-input global window") {
    val df = (0L until 50L).map(i => (i, i % 11, i % 7)).toDF("id", "x", "y")
    val p = plan(graft.ops.Pareto.skyline2d(df, "x", "y", pmod(col("id"), lit(8))))
    // both stage-1 window specs carry the bucket; the only bucket-free
    // windows are stage 2, fed by the pruned local frontiers
    assert("windowspecdefinition\\([^)]*__bkt".r.findFirstIn(p).isDefined,
      s"stage-1 window not bucket-partitioned:\n$p")
  }

  test("cusumChangepoint windows partition on (keys, chunk); offsets ride the chunk table") {
    val df = (0L until 100L).map(i => ("k", i, i / 10.0)).toDF("k", "i", "v")
    val p = plan(graft.ops.Stats.cusumChangepoint(
      df, Seq("k"), Seq(col("i")), "v", chunk = expr("i DIV 10")))
    assert("windowspecdefinition\\([^)]*__chk".r.findFirstIn(p).isDefined,
      s"phase-1 window not chunk-partitioned:\n$p")
  }

  test("abWelchZ is one conditional-agg pass: single exchange, no join") {
    val df = (0L until 100L).map(i => ("k", i, i / 3.0)).toDF("k", "uid", "v")
    val p = plan(graft.ops.Stats.abWelchZ(df, Seq("k"), pmod(col("uid"), lit(2L)) === 0, "v"))
    assert(!p.contains("Join"), s"unexpected join:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$p")
  }

  test("Quality.validate: row-local checks fold into ONE pass; no Expand anywhere") {
    val df = (0L until 50L).map(i => (i, i % 10, i * 1.0)).toDF("id", "fk", "price")
    val parent = (0L until 10L).toDF("pk")
    val p = plan(Quality.validate(
      df,
      Seq(
        Quality.Check("c1", Quality.failing(col("price") > 0)),
        Quality.Check("c2", Quality.failing(col("id") >= 0)),
        Quality.Check("c3", Quality.failing(col("fk") < 100))),
      Some(("u", "id")),
      "fk", parent, "pk", "ri"))
    // the child appears exactly three times: the fused row-local aggregate,
    // the pruned uniqueness distinct, the RI anti-join probe — never once
    // per constraint
    val scans = "LocalTableScan|Scan ExistingRDD".r.findAllIn(p).size
    assert(scans <= 5, s"constraint suite re-scans the audited table:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"parent keys not broadcast:\n$p")
    // design pin: the distinct aggregate stays out of the shared metric
    // pass (fused, one-distinct planning would key the partials by the
    // distinct column and carry every CASE metric through the
    // full-cardinality grouping — regime notes in ops/Quality)
    val fusedDistinct = p.linesIterator.exists(l =>
      l.contains("distinct") && l.contains("CASE WHEN"))
    assert(!fusedDistinct, s"distinct fused into the shared metric pass:\n$p")
  }
}
