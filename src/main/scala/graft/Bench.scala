package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // plan-shape metrics per query (contention-IMMUNE, unlike seconds):
    // total shuffle bytes (read + write) and completed-stage count, via a
    // listener + per-query deltas. Stage-completed events are async, so
    // deltas are read only after the bus goes quiet (poll-until-stable —
    // the public API has no drain hook); the settle wait runs OUTSIDE the
    // timed window and never inflates secs.
    val shuffleBytesAcc = new java.util.concurrent.atomic.AtomicLong(0L)
    val stagesAcc = new java.util.concurrent.atomic.AtomicLong(0L)
    // executor CPU + GC per query (r10 verdict item): wall time on a shared
    // box conflates plan cost with neighbor load — flat cpuSecs + inflated
    // secs is the in-band proof of contention (nothing else produces it),
    // making a cross-round wall regression on bit-identical plans
    // mechanically adjudicable from the artifact alone. executorCpuTime is
    // nanoseconds, jvmGCTime milliseconds (Spark TaskMetrics units).
    val cpuNanosAcc = new java.util.concurrent.atomic.AtomicLong(0L)
    val gcMillisAcc = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          shuffleBytesAcc.addAndGet(
            m.shuffleReadMetrics.totalBytesRead + m.shuffleWriteMetrics.bytesWritten)
          cpuNanosAcc.addAndGet(m.executorCpuTime)
          gcMillisAcc.addAndGet(m.jvmGCTime)
        }
        stagesAcc.incrementAndGet()
      }
    })
    // Returns FALSE when the settle loop hit its cap without the bus going
    // quiet — on a loaded box late stage-completed events then bleed one
    // query's shuffleBytes/stages delta into the next query's numbers, so
    // the timeout is surfaced per-query in the JSON (drainTimedOut) instead
    // of silently misattributing the plan-shape telemetry.
    def drainListenerBus(): Boolean = {
      var last = (stagesAcc.get, shuffleBytesAcc.get)
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 3000) {
        Thread.sleep(25); waited += 25
        val now = (stagesAcc.get, shuffleBytesAcc.get)
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      stable >= 2
    }
    // absorb JVM/codegen/session warmup and first-touch parquet reader cost
    // so neither is charged to whichever query runs first; fixed name order
    // for stable attribution. The window pass matters: WindowExec + sort
    // codegen otherwise lands on the alphabetically-first window query.
    spark.range(2000000L).selectExpr("sum(id * 2)").collect()
    spark.range(200000L).selectExpr("id", "id % 97 AS k")
      .selectExpr(
        "k",
        "sum(id) OVER (PARTITION BY k ORDER BY id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS w",
        "row_number() OVER (PARTITION BY k ORDER BY id) AS rn")
      .selectExpr("max(w + rn)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    // force EVERY output column: a bare count() lets Catalyst prune unused
    // window/projection expressions and under-measures projection queries
    import org.apache.spark.sql.functions.{col, sum => fsum, xxhash64}
    // a thrown query must never record a plausible-looking fast timing:
    // round 7's events-schema drift produced fake ~0.06 s rows for 42
    // silently-failing queries. Carry the error string into queryStats so
    // the artifact itself shows red.
    case class PassRow(secs: Double, bytes: Long, stages: Long,
        cpuSecs: Double, gcSecs: Double,
        drainTimedOut: Boolean, err: Option[String])
    // SPARK_GRAFT_ONLY=q1,q2 restricts the run to named queries — a local
    // iteration knob (per-query cpuSecs without the full 20-minute sweep);
    // the driver never sets it, so driver rounds keep the full registry.
    // Unknown names fail LOUDLY (a typo would otherwise run an empty
    // bench that reads as a result), and a restricted run writes its
    // partial artifact to bench_stats_only.json so it can never clobber
    // the tracked full-registry bench_stats.json diff base
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in the registry: ${unknown.toSeq.sorted.mkString(",")}")
    }
    def runPass(): Seq[(String, PassRow)] =
      SparkEntry.queries.toSeq.filter(q => only.forall(_.contains(q._1)))
        .sortBy(_._1).map { case (name, fn) =>
        val preDrained = drainListenerBus()
        val s0 = stagesAcc.get
        val b0 = shuffleBytesAcc.get
        val c0 = cpuNanosAcc.get
        val g0 = gcMillisAcc.get
        val t0 = System.nanoTime()
        val err: Option[String] =
          try {
            val out = fn(spark, sfDir)
            // double sum: a long sum of hashes overflows under ANSI mode
            out.select(xxhash64(out.columns.toIndexedSeq.map(col): _*).cast("double").as("__h"))
              .agg(fsum("__h")).collect()
            None
          } catch { case e: Throwable =>
            Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
          }
        val secs = (System.nanoTime() - t0) / 1e9
        graft.ops.Caches.releaseAll()
        val postDrained = drainListenerBus()
        name -> PassRow(secs, shuffleBytesAcc.get - b0, stagesAcc.get - s0,
          (cpuNanosAcc.get - c0) / 1e9, (gcMillisAcc.get - g0) / 1e3,
          !(preDrained && postDrained), err)
      }
    // TWO timed passes, same order, min as the headline: seven consecutive
    // rounds of verdicts show the contended driver box inflating identical
    // plans (bit-equal shuffle bytes / stage counts) up to 13x wall-time —
    // the min of two passes is what a quiet box would measure, while both
    // raw passes stay in queryStats (secs_p1/secs_p2) for attribution.
    // Plan-shape telemetry (shuffleBytes/stages/drainTimedOut) comes from
    // pass 1, keeping cross-round comparability with the old single pass
    // (plans are deterministic, so pass 2's deltas are bit-equal anyway).
    val pass1 = runPass()
    val pass2 = runPass().toMap
    val results = pass1.map { case (name, p1) =>
      val p2 = pass2(name)
      // an errored run finishes fast and must never win the min — take the
      // min over non-errored passes only (both-errored keeps p1's timing,
      // which the carried err field marks as red anyway). The headline
      // cpuSecs/gcSecs come from the SAME pass that won the headline secs,
      // so wall and CPU stay coherent (comparing pass-1 wall against
      // pass-2 CPU would re-create the attribution ambiguity the fields
      // exist to remove); both passes' values ship beside them.
      val win = (p1.err, p2.err) match {
        case (None, None) => if (p1.secs <= p2.secs) p1 else p2
        case (None, _)    => p1
        case (_, None)    => p2
        case _            => p1
      }
      // drainTimedOut qualifies the pass-1 shuffleBytes/stages it sits next
      // to — OR-ing in pass 2's flag would mark clean pass-1 telemetry as
      // bleed-prone whenever only the second pass was contended. Pass 2's
      // flag ships separately (drainTimedOutP2); secs are unaffected either
      // way (drain waits run outside the timed window).
      (name, win.secs, (win.cpuSecs, win.gcSecs), p1, p2)
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, v, _, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a query is FAILED only when BOTH passes threw (the headline secs then
    // has no successful pass behind it); exactly one errored pass is FLAKY —
    // the min comes from the clean pass, so it must not paint the round red,
    // but the transient ships per-pass (err_p1/err_p2) for attribution
    val qstats = results
      .map { case (k, v, (cpu, gc), p1, p2) =>
        val (e1, e2) = (p1.err, p2.err)
        val errField =
          if (e1.nonEmpty && e2.nonEmpty) s""","err":${jstr(e1.get)}""" else ""
        val perPass = e1.map(m => s""","err_p1":${jstr(m)}""").getOrElse("") +
          e2.map(m => s""","err_p2":${jstr(m)}""").getOrElse("")
        val flakyField =
          if (e1.nonEmpty != e2.nonEmpty) s""","flaky":true""" else ""
        s"\"" + k +
          s"""\":{"secs":$v,"secs_p1":${p1.secs},"secs_p2":${p2.secs},""" +
          s""""cpuSecs":$cpu,"gcSecs":$gc,""" +
          s""""cpuSecs_p1":${p1.cpuSecs},"cpuSecs_p2":${p2.cpuSecs},""" +
          s""""gcSecs_p1":${p1.gcSecs},"gcSecs_p2":${p2.gcSecs},""" +
          s""""shuffleBytes":${p1.bytes},"stages":${p1.stages},""" +
          s""""drainTimedOut":${p1.drainTimedOut},""" +
          s""""drainTimedOutP2":${p2.drainTimedOut}$errField$perPass$flakyField}"""
      }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val totalCpu = results.map(_._3._1).sum
    val totalGc = results.map(_._3._2).sum
    val drainTimeouts = results.count(_._4.drainTimedOut)
    val errCount = results.count(r => r._4.err.nonEmpty && r._5.err.nonEmpty)
    val flakyCount = results.count(r => r._4.err.nonEmpty != r._5.err.nonEmpty)
    if (errCount > 0)
      System.err.println(s"[bench] $errCount queries FAILED (both passes): " +
        results.filter(r => r._4.err.nonEmpty && r._5.err.nonEmpty).map(_._1).mkString(", "))
    if (flakyCount > 0)
      System.err.println(s"[bench] $flakyCount queries flaky (one pass errored): " +
        results.filter(r => r._4.err.nonEmpty != r._5.err.nonEmpty).map(_._1).mkString(", "))
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""queryStats":$qstats,"cpuSecs":$totalCpu,"gcSecs":$totalGc,""" +
      s""""drainTimeouts":$drainTimeouts,""" +
      s""""errors":$errCount,"flaky":$flakyCount,"sf":"$sfDir"}"""
    // Write the file copies FIRST: a tail-limited stdout capture window has
    // twice clipped the full per-query line from the front (r2, r6 verdicts),
    // so the complete telemetry must exist on disk regardless of what
    // survives the capture. bench_stats.json is the tracked artifact name;
    // bench_result.json stays for compatibility with earlier tooling. A
    // file-write failure (read-only cwd) must not suppress the printed
    // result.
    val statsFiles =
      if (only.isDefined) Seq("bench_stats_only.json")
      else Seq("bench_stats.json", "bench_result.json")
    for (f <- statsFiles)
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(f), (json + "\n").getBytes("UTF-8"))
      catch { case e: Throwable => System.err.println(s"[bench] $f write failed: ${e.getMessage}") }
    // sbt wraps stdout in [info] prefixes, which broke the driver's JSON
    // parse in round 1 — print to stdout + a bare stderr line.
    println(json)
    System.err.println(json)
    // the full per-query line is large and a tail-limited capture window can
    // cut it from the FRONT (observed in round 2: the driver recorded
    // "parsed": null even though the line itself was valid). Emit a short
    // summary with no per-query dict as the very last line on both streams —
    // short enough that no tail window can truncate it. DO NOT append
    // anything after it: the driver parses the LAST stdout line.
    // a contended or broken run must be self-describing from the short line
    // alone: drainTimeouts flags bleed-prone telemetry, errors flags thrown
    // queries (fake-fast totals otherwise read as a speedup)
    val summary = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""cpuSecs":$totalCpu,"gcSecs":$totalGc,""" +
      s""""drainTimeouts":$drainTimeouts,"errors":$errCount,""" +
      s""""flaky":$flakyCount,"sf":"$sfDir"}"""
    println(summary)
    System.err.println(summary)
    spark.stop()
  }
}
