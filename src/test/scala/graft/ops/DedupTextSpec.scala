package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupTextSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different words appear in this one here"),
    (4L, "the quick brown fox jumps over the lazy dog") // exact dup of 1
  ).toDF("doc_id", "text")

  test("exactGroups collapses exact duplicates to the minimum id") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
      .filter(col("n_docs") > 1)
      .select("n_docs", "keeper_id").as[(Long, Long)].collect().toSeq
    assert(g == Seq((2L, 1L)))
  }

  test("jaccardPairs finds the near-dup pair and the exact pair, not the distinct doc") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // jaccard 1.0
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 4L))) // high overlap
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("array-local minhash signatures equal the exploded-groupBy formulation") {
    val sh = Text.shingleSet(docs, "doc_id", "text", 3)
    val viaRows = Dedup.minhashSignatures(sh, "doc_id", 8).orderBy("doc_id").collect().toSeq
    val viaLocal = Dedup.minhashSignaturesLocal(docs, "doc_id", "text", 3, 8)
      .orderBy("doc_id").collect().toSeq
    assert(viaRows == viaLocal)
  }

  test("minhash LSH surfaces the exact pair with all hashes agreeing") {
    val sig = Dedup.minhashSignaturesLocal(docs, "doc_id", "text", 3, 8)
    val cand = Dedup.lshCandidates(sig, "doc_id", 8, 4)
      .select("a_id", "b_id", "n_equal").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(cand((1L, 4L)) == 8L) // identical text → identical signature
    assert(!cand.contains((1L, 3L)))
  }

  test("simhash: equal text → equal fingerprint; disjoint text → different") {
    val fp = Dedup.simhash(docs, "doc_id", "text", 16)
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(4L))
    assert(fp(1L) != fp(3L))
    assert(fp.values.forall(v => v >= 0 && v < 65536))
  }

  test("languageId recovers the language of vocabulary-separated corpora") {
    val corpus = (Seq.tabulate(20)(i => (i.toLong, s"alpha beta gamma delta epsilon token$i", "aa")) ++
      Seq.tabulate(20)(i => (100L + i, s"uno dos tres cuatro cinco token$i", "bb")))
      .toDF("doc_id", "text", "lang")
    val pred = Text.languageId(corpus, "doc_id", "text", "lang", 5)
    val joined = corpus.join(pred, "doc_id")
    assert(joined.filter(col("lang") =!= col("pred_lang")).count() == 0)
  }

  test("fingerprint normalizes whitespace and case") {
    val df = Seq((1L, "A  b\tc"), (2L, "a b c")).toDF("id", "t")
    val fps = df.select(Text.fingerprint(col("t")).as("f")).as[String].collect()
    assert(fps(0) == fps(1))
  }
}
