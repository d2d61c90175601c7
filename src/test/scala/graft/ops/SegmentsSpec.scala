package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class SegmentsSpec extends SparkSpec {
  import spark.implicits._

  test("RLE collapses runs with end-exclusive bounds and final flush") {
    // ref semantics: seg_end = ts of the first row AFTER the run; the last
    // run closes at the partition's last ts (generate_submission.py:539-540)
    val df = Seq(
      ("k", 0L, "a"), ("k", 200L, "a"), ("k", 400L, "b"),
      ("k", 600L, "b"), ("k", 800L, "a"))
      .toDF("k", "ts", "lbl")
    val out = Segments.runLengthEncode(df, Seq("k"), "ts", "lbl")
      .orderBy("seg_start")
      .select("lbl", "seg_start", "seg_end", "seg_len")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("a", 0L, 400L, 2L), ("b", 400L, 800L, 2L), ("a", 800L, 800L, 1L)))
  }

  test("single-row partition RLE") {
    val df = Seq(("k", 100L, "x")).toDF("k", "ts", "lbl")
    val out = Segments.runLengthEncode(df, Seq("k"), "ts", "lbl")
      .select("lbl", "seg_start", "seg_end", "seg_len")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("x", 100L, 100L, 1L)))
  }

  test("intervalToGrid emits nothing for an interval shorter than one step") {
    val df = Seq((10L, 20L)).toDF("s", "e")
    assert(Segments.intervalToGrid(df, "s", "e", 200L, "g").count() == 0)
  }

  test("intervalToGrid hits exactly the in-range grid points") {
    val df = Seq((150L, 810L)).toDF("s", "e")
    val g = Segments.intervalToGrid(df, "s", "e", 200L, "g")
      .select("g").as[Long].collect().sorted.toSeq
    assert(g == Seq(200L, 400L, 600L, 800L))
  }

  test("property: RLE segments are contiguous, cover the series, and never repeat labels adjacently") {
    val rng = new Random(1337)
    for (_ <- 1 to 10) {
      val ls = Seq.fill(1 + rng.nextInt(40))(Seq("a", "b", "c")(rng.nextInt(3)))
      val df = ls.zipWithIndex.map { case (l, i) => ("k", i.toLong * 10, l) }.toDF("k", "ts", "lbl")
      val segs = Segments.runLengthEncode(df, Seq("k"), "ts", "lbl")
        .orderBy("seg_start")
        .select("lbl", "seg_start", "seg_end", "seg_len")
        .as[(String, Long, Long, Long)].collect().toSeq
      // coverage and contiguity
      assert(segs.head._2 == 0L)
      assert(segs.last._3 == (ls.size - 1) * 10L)
      segs.sliding(2).foreach {
        case Seq((l1, _, e1, _), (l2, s2, _, _)) =>
          assert(e1 == s2); assert(l1 != l2)
        case _ => ()
      }
      // decode(encode) == original: expanding runs by seg_len rebuilds the sequence
      val rebuilt = segs.flatMap { case (l, _, _, n) => Seq.fill(n.toInt)(l) }
      assert(rebuilt == ls)
    }
  }

  test("bucketGrid generates the dense lattice per key") {
    val bounds = Seq(("k", 150L, 610L)).toDF("k", "mn", "mx")
    val g = Segments.bucketGrid(bounds, Seq("k"), "mn", "mx", 200L)
      .select("bucket").as[Long].collect().sorted.toSeq
    assert(g == Seq(0L, 200L, 400L, 600L))
  }
}
