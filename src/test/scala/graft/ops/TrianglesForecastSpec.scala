package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 additions: exact triangle census (Graph.triangles) and
  * seasonal-naive forecast skill (Stats.seasonalSkill).
  */
class TrianglesForecastSpec extends SparkSpec {
  import spark.implicits._

  private def census(edges: Seq[(Long, Long)]) =
    Graph.triangles(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Option[Double])].head()

  test("triangles: K4 — every wedge closes, clustering 1.0") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(census(k4) == ((6L, 12L, 4L, Some(1.0))))
  }

  test("triangles: path graph has wedges but no triangle") {
    assert(census(Seq((1L, 2L), (2L, 3L))) == ((2L, 1L, 0L, Some(0.0))))
  }

  test("triangles: triangle + pendant — 1 triangle over 5 wedges") {
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    assert(census(g) == ((4L, 5L, 1L, Some(3.0 / 5.0))))
  }

  test("triangles: hub star — many wedges, zero triangles (orientation bounds the fan-out)") {
    val star = (2L to 20L).map(i => (1L, i))
    val (e, w, t, c) = census(star)
    assert(e == 19L && t == 0L && c == Some(0.0))
    assert(w == 19L * 18L / 2)
  }

  test("triangles: single edge — no wedge, clustering NULL") {
    assert(census(Seq((1L, 2L))) == ((1L, 0L, 0L, None)))
  }

  test("triangles: partition invariance") {
    val g = (1L to 30L).flatMap(i => Seq((i, i % 30 + 1), (i, (i + 1) % 30 + 1)))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      .filter { case (a, b) => a != b }
    val df = g.toDF("a", "b")
    val r1 = Graph.triangles(df, "a", "b").head()
    val r2 = Graph.triangles(df.repartition(7), "a", "b").head()
    assert(r1 == r2)
  }

  private val skillCols = Seq("k", "n_test", "mae_seasonal", "mae_climatology", "skill")

  test("seasonalSkill: perfect seasonal fit on a varying signal → skill 1") {
    // train/test identical per cell: cell means predict exactly; climatology
    // (global mean 20) misses by 10 per row
    val rows = Seq(
      ("t", 0L, 10.0, true), ("t", 1L, 30.0, true),
      ("t", 0L, 10.0, false), ("t", 1L, 30.0, false))
    val out = Stats.seasonalSkill(rows.toDF("k", "cell", "v", "train"), "k", "cell", "v", "train")
    assert(out.columns.toSeq == skillCols)
    val r = out.as[(String, Long, Double, Double, Option[Double])].head()
    assert(r == (("t", 2L, 0.0, 10.0, Some(1.0))))
  }

  test("seasonalSkill: constant test signal equal to climatology → NULL skill, not 0/0") {
    val rows = Seq(
      ("t", 0L, 5.0, true), ("t", 1L, 5.0, true),
      ("t", 0L, 5.0, false), ("t", 1L, 5.0, false))
    val r = Stats.seasonalSkill(rows.toDF("k", "cell", "v", "train"), "k", "cell", "v", "train")
      .as[(String, Long, Double, Double, Option[Double])].head()
    assert(r._3 == 0.0 && r._4 == 0.0 && r._5.isEmpty)
  }

  test("seasonalSkill: test rows in cells never trained are absent by contract") {
    val rows = Seq(
      ("t", 0L, 5.0, true),
      ("t", 0L, 6.0, false), ("t", 99L, 1000.0, false))
    val r = Stats.seasonalSkill(rows.toDF("k", "cell", "v", "train"), "k", "cell", "v", "train")
      .as[(String, Long, Double, Double, Option[Double])].head()
    assert(r._2 == 1L) // the cell-99 row never joins a fitted cell
  }

  test("seasonalSkill: partition invariance (exact means + trunc-9 sums)") {
    val rows = (0 until 400).map { i =>
      ("t" + (i % 2), (i % 24).toLong, (i % 7) * 3.25 + (i % 24) * 1.5, i % 3 != 0)
    }
    val df = rows.toDF("k", "cell", "v", "train")
    val a = Stats.seasonalSkill(df, "k", "cell", "v", "train").orderBy("k").collect().toSeq
    val b = Stats.seasonalSkill(df.repartition(11), "k", "cell", "v", "train").orderBy("k").collect().toSeq
    assert(a == b)
  }
}
