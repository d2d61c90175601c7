package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Boundary and reconstruction laws of [[Text.chunkOverlap]] — the DuckDB
  * oracle pins the arithmetic cross-engine; this spec pins the chunking
  * CONTRACT: chunk count, end clamping, no pure-suffix trailing chunk, and
  * the lossless-reassembly law RAG pipelines rely on.
  */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int): (Long, String) = (n.toLong, (1 to n).map(i => s"w$i").mkString(" "))

  private def chunks(ns: Seq[Int], chunk: Int, stride: Int): Map[Long, Seq[(Long, Long, Long, String)]] =
    Text.chunkOverlap(ns.map(doc).toDF("doc_id", "text"), "doc_id", "text", chunk, stride)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap

  test("chunk counts and end clamping at the boundaries") {
    // chunk=8, stride=6 over doc lengths around every boundary
    val out = chunks(Seq(1, 7, 8, 9, 14, 15, 20, 21), 8, 6)
    def nChunks(n: Int) = out(n.toLong).size
    assert(nChunks(1) == 1 && nChunks(7) == 1 && nChunks(8) == 1) // n <= chunk: one chunk
    assert(nChunks(9) == 2) // one token past: second chunk adds exactly it
    assert(nChunks(14) == 2 && nChunks(15) == 3) // 14 = 8+6 exact; 15 spills
    assert(nChunks(20) == 3 && nChunks(21) == 4)
    // short doc is returned verbatim
    assert(out(7L) == Seq((0L, 0L, 7L, (1 to 7).map(i => s"w$i").mkString(" "))))
    // end-clamped tail: doc 9, chunk 1 starts at 6, holds tokens 7..9
    assert(out(9L)(1) == ((1L, 6L, 3L, "w7 w8 w9")))
  }

  test("every chunk past the first adds new tokens; stride-prefix reassembly is lossless") {
    for (n <- Seq(1, 5, 24, 25, 29, 30, 31, 53, 99, 100)) {
      val out = chunks(Seq(n), 32, 24)(n.toLong)
      // ends are strictly increasing (no pure-suffix trailing chunk) and
      // the last end is the doc end
      val ends = out.map { case (_, start, len, _) => start + len }
      assert(ends == ends.sorted && ends.distinct == ends, s"n=$n ends not strict: $ends")
      assert(ends.last == n, s"n=$n last end ${ends.last}")
      // taking the first `stride` tokens of every chunk but the last, plus
      // the whole last chunk, rebuilds the document exactly
      val rebuilt = (out.init.map(_._4.split(" ").take(24).mkString(" ")) :+ out.last._4)
        .mkString(" ")
      assert(rebuilt == doc(n)._2, s"n=$n reassembly mismatch")
    }
  }
}
