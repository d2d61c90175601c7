package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage (entity resolution): candidate pairs from
  * cheap equality blocking, scored by edit distance — the classic
  * blocking + comparison ER shape (Fellegi-Sunter style pipelines,
  * dedupe.io, Splink all run it).
  *
  * Within a block the pair enumeration is quadratic BY DESIGN — blocking
  * exists to make every block small. Two guards keep that honest at
  * scale:
  *   - oversized blocks are dropped entirely before pairing ("block
  *     purging", standard ER practice: a block bigger than `maxBlock`
  *     means the blocking key carries no discriminating signal there, and
  *     its pairs would dominate the run while matching mostly junk);
  *   - the compared field is truncated to `titleLen` chars, bounding each
  *     levenshtein evaluation at O(titleLen²) regardless of document
  *     size.
  * The block-size census groups on the same key the self-join shuffles
  * on, so the purge rides the join's own exchange.
  *
  * Cross-engine determinism: all outputs are integers. Spark's
  * `levenshtein` and DuckDB's are both the standard
  * insert/delete/substitute unit-cost distance (probed: kitten→sitting =
  * 3 in both), and the compared strings are single-byte text, so no
  * codepoint-vs-byte divergence.
  */
object Linkage {
  /** Candidate near-match pairs (`a_id` < `b_id`, both from `df`) whose
    * `titleLen`-char prefixes are within `maxDist` edits, blocked on the
    * `blockLen`-char prefix of `textCol`.
    */
  def blockedPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockLen: Int = 16,
      titleLen: Int = 40,
      maxDist: Int = 12,
      maxBlock: Int = 100): DataFrame = {
    val keyed = df.select(
      col(idCol),
      substring(col(textCol), 1, blockLen).as("__blk"),
      substring(col(textCol), 1, titleLen).as("__title"))
    val keep = keyed.groupBy("__blk").agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBlock)
      .select("__blk")
    val k = keyed.join(keep, "__blk")
    val a = k.select(col("__blk"), col(idCol).as("a_id"), col("__title").as("__ta"))
    val b = k.select(col("__blk"), col(idCol).as("b_id"), col("__title").as("__tb"))
    a.join(b, Seq("__blk"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("dist", levenshtein(col("__ta"), col("__tb")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("a_id", "b_id", "dist")
  }
}
