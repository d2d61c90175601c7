package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch: fixed-size frequency summaries for heavy-hitter
  * screening over a key space too large to groupBy exactly.
  *
  * The sketch is a depth × width grid of counters. Every row increments
  * one counter per depth level (`bucket_j = (h1 + j·h2) mod 2⁶⁴ mod
  * width`, double hashing from one md5 — the [[Dedup]] MinHash recipe);
  * a key's estimate is the MINIMUM of its depth cells, an upper bound on
  * the true count that overshoots only when every level collides with
  * other keys.
  *
  * Determinism: bucket indices are pure md5 arithmetic in DECIMAL(38,0)
  * (exact mod-2⁶⁴; DuckDB reproduces via `md5_number_lower/upper` in
  * HUGEINT), counts are exact BIGINTs, and min/count are
  * order-independent — no RNG, no floats anywhere.
  *
  * Scale shape (the reason this exists next to an exact groupBy): the
  * grid aggregation map-side-combines to ≤ depth·width cells per
  * partition, so the shuffle carries O(depth·width) rows per partition
  * REGARDLESS of input size or key cardinality — where an exact per-key
  * count shuffles one row per distinct key. The finished sketch
  * (depth·width rows) broadcasts to probe any candidate set without
  * rescanning the fact table.
  */
object Sketch {

  /** Little-endian uint64 halves of `md5(key)` as DECIMAL(38,0) columns —
    * byte order matches DuckDB's `md5_number_lower` (digest bytes 8..15)
    * and `md5_number_upper` (bytes 0..7).
    */
  private def le64hex(mdCol: String, off: Int): String = {
    val pairs = (7 to 0 by -1).map(i => s"substr($mdCol, ${off + 2 * i + 1}, 2)")
    s"CAST(conv(concat(${pairs.mkString(", ")}), 16, 10) AS DECIMAL(38,0))"
  }

  private val two64 = "CAST('18446744073709551616' AS DECIMAL(38,0))"

  /** (input columns) + (level, bucket) rows, `depth` per input row —
    * the one place the md5 double-hash bucket recipe lives.
    */
  private def hashedBuckets(
      df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad sketch shape $depth x $width")
    df.withColumn("__md", md5(col(keyCol).cast("string")))
      .withColumn("__h1", expr(le64hex("__md", 16)))
      .withColumn("__h2", expr(le64hex("__md", 0)))
      .withColumn("level", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn(
        "bucket",
        expr(s"CAST(((__h1 + level * __h2) % $two64) % $width AS BIGINT)"))
      .drop("__md", "__h1", "__h2")
  }

  /** The sketch grid: one row per (level, bucket) with its counter.
    * `keyCol` is hashed as a string (cross-engine canonical form).
    */
  def countMin(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame =
    hashedBuckets(df, keyCol, depth, width)
      .groupBy("level", "bucket").agg(count(lit(1)).as("cell_n"))

  /** Merge two count-min grids (associative/commutative — integer counters
    * over a data-independent (level, bucket) universe form the same
    * monoid as [[Incremental.histMerge]]'s bins, so per-batch sketches of
    * an ingest stream sum to exactly the from-scratch sketch; absent
    * cells are implicit zeros).
    */
  def countMinMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("level", "bucket").agg(sum(col("cell_n")).as("cell_n"))

  /** Heavy hitters: probe every distinct key of `df` against its own
    * count-min sketch, keep keys whose estimate reaches `minCount`, and
    * attach the exact count so the overestimate is visible. Estimates
    * never undershoot, so no truly-heavy key is lost (the sketch's
    * one-sided error contract).
    *
    * Because this variant materializes the exact per-key counts anyway
    * (for the probe side), the sketch is built FROM those counts —
    * `cell_n = Σ exact_n` over the keys hashing into the cell, identical
    * to counting raw rows — so each distinct key is md5'd ONCE and the
    * raw stream is never hashed (measured 3.9 s → sub-2 s on the 5M-token
    * sf0.1 corpus). A pure streaming build with no exact counts is
    * [[countMin]]. At scale the probe side would be an external candidate
    * dimension (broadcast against the sketch); here the corpus's own
    * distinct keys stand in so the result is self-contained and
    * oracle-checkable.
    */
  def countMinHeavyHitters(
      df: DataFrame,
      keyCol: String,
      depth: Int,
      width: Int,
      minCount: Long): DataFrame = {
    val hashed = Caches.trackPersist(
      hashedBuckets(
        df.groupBy(col(keyCol)).agg(count(lit(1)).as("exact_n")),
        keyCol, depth, width))
    val sketch = hashed.groupBy("level", "bucket").agg(sum(col("exact_n")).as("cell_n"))
    hashed
      .join(broadcast(sketch), Seq("level", "bucket"))
      .groupBy(col(keyCol), col("exact_n"))
      .agg(min(col("cell_n")).as("cm_est"))
      .filter(col("cm_est") >= minCount)
      .select(col(keyCol), col("cm_est"), col("exact_n"))
  }
}
