package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private def run(vs: Seq[Option[Double]]): Seq[Double] = {
    val df = vs.zipWithIndex
      .map { case (v, i) => ("k", i.toLong, v) }
      .toDF("k", "x", "v")
    Cleaning.interpolateThenZero(df, Seq("k"), "x", Seq("v"))
      .orderBy("x").select("v").as[Double].collect().toSeq
  }

  test("interior NULL run is linearly interpolated (pandas semantics)") {
    assert(run(Seq(Some(1.0), None, None, Some(4.0))) == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("time-weighted: interpolation uses the abscissa, not row position") {
    val df = Seq(("k", 0L, Some(0.0)), ("k", 10L, None), ("k", 40L, Some(4.0)))
      .toDF("k", "x", "v")
    val out = Cleaning.interpolateLinear(df, Seq("k"), "x", Seq("v"))
      .orderBy("x").select("v").as[Double].collect()
    assert(out.toSeq == Seq(0.0, 1.0, 4.0))
  }

  test("leading NULLs become 0 only after the fill step") {
    assert(run(Seq(None, None, Some(2.0))) == Seq(0.0, 0.0, 2.0))
  }

  test("trailing NULLs forward-fill the last known value") {
    assert(run(Seq(Some(3.0), None, None)) == Seq(3.0, 3.0, 3.0))
  }

  test("all-NULL group fills 0") {
    assert(run(Seq(None, None)) == Seq(0.0, 0.0))
  }

  test("idempotent on complete data") {
    assert(run(Seq(Some(5.0), Some(6.0))) == Seq(5.0, 6.0))
  }

  test("partitions do not leak across keys") {
    val df = Seq(("a", 0L, Some(1.0)), ("a", 1L, None), ("b", 2L, Some(9.0)))
      .toDF("k", "x", "v")
    val out = Cleaning.interpolateThenZero(df, Seq("k"), "x", Seq("v"))
      .orderBy("k", "x").select("v").as[Double].collect()
    // a's trailing NULL forward-fills 1.0 (never sees b's 9.0)
    assert(out.toSeq == Seq(1.0, 1.0, 9.0))
  }

  test("winsorize clamps into the per-group quantile band; interior and NULL untouched") {
    // group g: 1..10 → p25 = 3.25, p75 = 7.75 (linear interpolation)
    val df = ((1 to 10).map(i => ("g", Some(i.toDouble))) :+ (("g", None)))
      .toDF("k", "v")
    val out = Cleaning.winsorize(df, Seq("k"), "v", 0.25, 0.75, "w")
      .select("v", "w").as[(Option[Double], Option[Double])].collect().toMap
    assert(out(Some(1.0)).contains(3.25))   // clamped up
    assert(out(Some(10.0)).contains(7.75))  // clamped down
    assert(out(Some(5.0)).contains(5.0))    // interior untouched
    assert(out(None).isEmpty)               // NULL stays NULL
  }
}
