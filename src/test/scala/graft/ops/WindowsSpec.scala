package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  test("tumbleMs buckets: bucket <= ts < bucket + step, pure integer math") {
    val df = Seq(0L, 199L, 200L, 399L, 1000L).toDF("ts")
    val out = df.select(col("ts"), Windows.tumbleMs(col("ts"), 200L).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 0L, 199L -> 0L, 200L -> 200L, 399L -> 200L, 1000L -> 1000L))
  }

  test("stridedWindowId chunks rows in order, per key") {
    val df = (0 until 7).map(i => ("k", i.toLong)).toDF("k", "ts")
    val out = Windows.stridedWindowId(df, Seq("k"), Seq(col("ts")), 3)
      .orderBy("ts").select("win_id").as[Long].collect().toSeq
    assert(out == Seq(0L, 0L, 0L, 1L, 1L, 1L, 2L))
  }

  test("movingAvg trailing frame matches hand-rolled values") {
    val df = Seq(("k", 1L, 1.0), ("k", 2L, 2.0), ("k", 3L, 6.0)).toDF("k", "ts", "value")
    val out = Windows.movingAvg(df, Seq("k"), Seq(col("ts")), "value", 2)
      .orderBy("ts").select("moving_avg").as[Double].collect().toSeq
    assert(out == Seq(1.0, 1.5, 4.0))
  }

  test("downsample kernels: mean / abs_mean / abs_max / signed abs-max") {
    val df = Seq(("k", 0L, -3.0), ("k", 10L, 2.0)).toDF("k", "ts", "v")
    def ds(m: String) =
      Windows.downsample(df, Seq("k"), "ts", "v", 1000L, m).select("ds_value").as[Double].head()
    assert(ds("mean") == -0.5)
    assert(ds("abs_mean") == 2.5)
    assert(ds("abs_max") == 3.0)
    assert(ds("abs_max_orig") == -3.0) // sign preserved, ref utils.py:38-45
  }

  test("signed abs-max tie takes the positive (where(-min > max) is strict)") {
    val df = Seq(("k", -2.0), ("k", 2.0)).toDF("k", "v")
    val out = df.groupBy("k").agg(Stats.signedAbsMax(col("v")).as("s"))
      .select("s").as[Double].head()
    assert(out == 2.0)
  }

  test("upsampleRepeat emits factor rows with 0-based index") {
    val out = Windows.upsampleRepeat(Seq(("x")).toDF("c"), 3)
      .select("rep_idx").as[Int].collect().sorted.toSeq
    assert(out == Seq(0, 1, 2))
  }

  test("stridedWindows reproduces reference get_windows for overlap/gap/cut configs") {
    // direct replication of ref utils.py:10-16: windows [start, start+win)
    // for start in range(0, len, shift), minus the last `cut` windows
    def refWindows(len: Int, win: Int, shift: Int, cut: Int): Seq[(Long, Long, Long)] = {
      val all = (0 until len by shift).map(st => (st until math.min(st + win, len)))
      val kept = if (cut == 0) all else all.dropRight(cut)
      for ((rng, w) <- kept.zipWithIndex; r <- rng)
        yield (w.toLong, r.toLong, (r - w * shift).toLong)
    }
    for ((len, win, shift, cut) <- Seq((23, 20, 10, 1), (23, 20, 10, 0), (10, 3, 5, 0),
        (7, 3, 3, 1), (5, 20, 10, 1), (1, 2, 1, 2))) {
      val df = (0 until len).map(i => ("k", i.toLong)).toDF("k", "ts")
      val got = Windows.stridedWindows(df, Seq("k"), Seq(col("ts")), win, shift, cut)
        .select(col("win_id"), col("ts"), col("win_pos"))
        .as[(Long, Long, Long)].collect().toSeq.sorted
      assert(got == refWindows(len, win, shift, cut).sorted,
        s"config len=$len win=$win shift=$shift cut=$cut")
    }
  }

  test("adaptiveSignBits: smallest bits with occupancy <= target, clamped") {
    import graft.ops.Vectors.adaptiveSignBits
    assert(adaptiveSignBits(500, 32) == 4)   // ceil(500/32)=16 -> 4 bits
    assert(adaptiveSignBits(500, 2) == 8)    // 250 -> 8 bits
    assert(adaptiveSignBits(2000, 32) == 6)  // 63 -> 6 bits
    assert(adaptiveSignBits(200000, 32) == 13)
    assert(adaptiveSignBits(1, 32) == 1)     // clamp low
    assert(adaptiveSignBits(Int.MaxValue.toLong * 64, 2) == 16) // clamp high
    // defining property on a sweep: occupancy bound holds and bits is minimal
    for (n <- 1L to 3000L by 7; occ <- Seq(2L, 8L, 32L)) {
      val b = adaptiveSignBits(n, occ)
      val m = (n + occ - 1) / occ
      if (b < 16) assert((1L << b) >= m, s"n=$n occ=$occ")
      if (b > 1) assert((1L << (b - 1)) < m, s"n=$n occ=$occ not minimal")
    }
  }

  test("movingAvg full=true drops the first n-1 rows per key (ref ret[n-1:])") {
    val df = Seq(("k", 1L, 1.0), ("k", 2L, 2.0), ("k", 3L, 6.0), ("j", 1L, 4.0))
      .toDF("k", "ts", "value")
    val out = Windows.movingAvg(df, Seq("k"), Seq(col("ts")), "value", 2, full = true)
      .orderBy("k", "ts").select("k", "moving_avg").as[(String, Double)].collect().toSeq
    assert(out == Seq(("k", 1.5), ("k", 4.0))) // "j" has < n rows -> gone entirely
  }

  test("rollingMedian ignores a spike the moving average inherits; odd-n only") {
    val df = Seq.tabulate(7)(i => ("k", i.toLong, if (i == 3) 1000.0 else i.toDouble))
      .toDF("k", "ts", "value")
    val med = Windows.rollingMedian(df, Seq("k"), Seq(col("ts")), "value", 3)
      .orderBy("ts").select("rolling_median").as[Double].collect().toSeq
    // frames [0,1,2] [1,2,1000] [2,1000,4] [1000,4,5] [4,5,6]: the spike is
    // never the sorted middle, so no output ever sees it
    assert(med == Seq(1.0, 2.0, 4.0, 5.0, 5.0))
    assert(med.forall(_ < 1000.0))
    intercept[IllegalArgumentException] {
      Windows.rollingMedian(df, Seq("k"), Seq(col("ts")), "value", 4)
    }
  }

  test("rollingZScore: spike scores high, constant frame yields NULL z") {
    val vals = Seq(1.0, 1.0, 1.0, 1.0, 10.0, 1.0, 2.0, 2.0, 2.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("k", "ts", "value")
    val out = Windows.rollingZScore(df, Seq("k"), Seq(col("ts")), "value", 4)
      .orderBy("ts").select("ts", "z").as[(Long, Option[Double])].collect().toSeq
    // ts=3: frame all 1.0 -> sd 0 -> z NULL; ts=4: spike in a flat frame ->
    // large positive z; complete windows start at ts=3 (n=4)
    assert(out.head == ((3L, None)))
    val spike = out.find(_._1 == 4L).get._2.get
    assert(spike > 1.4, s"spike z=$spike")
    assert(out.map(_._1) == (3L to 8L))
  }
}
