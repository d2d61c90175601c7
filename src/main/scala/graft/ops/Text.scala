package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, shingling, quality metrics, corpus-trained language ID and
  * content fingerprinting over the `documents` table.
  *
  * All column-level and codegen-friendly (no UDFs); hash primitives are
  * md5/sha2 so the DuckDB oracle reproduces them byte-for-byte. At 100 TB the
  * token explode is a flatMap inside one stage (no shuffle); only the
  * per-doc / per-corpus aggregations shuffle.
  */
object Text {

  /** Whitespace tokenization of single-spaced text. */
  def tokens(c: Column): Column = split(trim(c), " ")

  /** k-word shingles (0-based get(); empty when fewer than k tokens). */
  def shingles(toks: Column, k: Int): Column =
    transform(
      sequence(lit(0), size(toks) - k),
      i => concat_ws(" ", (0 until k).map(j => get(toks, i + lit(j))): _*))

  /** Spread docs across all cores before CPU-bound per-doc work — see
    * [[Spread.byKey]] (no-op when the input is already well-partitioned).
    */
  private def spread(df: DataFrame, idCol: String): DataFrame =
    Spread.byKey(df, col(idCol))

  /** (id, shingle) rows, de-duplicated per doc — the unit of Jaccard math. */
  def shingleSet(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    spread(df, idCol)
      .filter(size(tokens(col(textCol))) >= k)
      .select(col(idCol), explode(array_distinct(shingles(tokens(col(textCol)), k))).as("shingle"))

  /** (id, token) rows, one per distinct token per doc. */
  def tokenSet(df: DataFrame, idCol: String, textCol: String): DataFrame =
    spread(df, idCol)
      .select(col(idCol), explode(array_distinct(tokens(col(textCol)))).as("token"))

  /** Content fingerprint: md5 of whitespace-normalized lowercase text. */
  def fingerprint(c: Column): Column =
    md5(lower(regexp_replace(trim(c), "\\s+", " ")))

  /** Corpus-trained language ID by integer voting: the top-`topK` most
    * frequent tokens per language form its profile (ties broken by token
    * string); a document's score per language is how many of its tokens,
    * with multiplicity, are in that profile; prediction is argmax with
    * min-language tie-break. Integer arithmetic end to end, so the DuckDB
    * oracle matches exactly. Profile and scoring are two shuffles; the
    * profile side is tiny and broadcasts.
    */
  def languageId(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      topK: Int): DataFrame = {
    val tok = spread(docs, idCol)
      .select(col(idCol), col(langCol), explode(tokens(col(textCol))).as("token"))
    val profile = tok
      .groupBy(col(langCol).as("profile_lang"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn(
        "rnk",
        row_number().over(
          Window.partitionBy(col("profile_lang")).orderBy(col("cnt").desc, col("token"))))
      .filter(col("rnk") <= topK)
      .select("profile_lang", "token")
    val scores = tok
      .join(broadcast(profile), Seq("token"))
      .groupBy(col(idCol), col("profile_lang"))
      .agg(count(lit(1)).as("score"))
    scores
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("profile_lang"))))
      .filter(col("rn") === 1)
      .select(col(idCol), col("profile_lang").as("pred_lang"), col("score"))
  }
}
