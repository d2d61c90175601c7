package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Coarse quantizer for IVF-style ANN: spherical k-means fitted with
  * deterministic Lloyd iterations expressed as DataFrame aggregations, so
  * the DuckDB oracle can replicate the fit bit-for-bit (no MLlib RNG, no
  * driver-side state).
  *
  * Determinism design (per the engine's cross-engine float rules):
  *   - A centroid is the per-dimension exact DECIMAL(38,9) SUM of its
  *     members' components, not their mean — cosine similarity is
  *     scale-invariant, so argmax-cos against the sum equals argmax-cos
  *     against the mean, and the sum never re-quantizes a derived quotient.
  *   - Products x·s are quantized at scale 9 (|x·s| ≲ 1e5: position 4+
  *     digits inside the double repr), centroid norm terms s² at scale 4
  *     (|s²| up to ~1e9 — same rule as the engine's other squared sums).
  *   - Assignment ties (equal cosine) break to the lowest cell id via
  *     row_number, a total order both engines share.
  *
  * Scale shape: the fit is O(n·k·d) with one shuffle per assignment and
  * per update — at 100 TB you fit on a sample (the assignment of the full
  * corpus is one broadcast join against k·d centroid rows, embarrassingly
  * parallel), which is exactly how IVF quantizers are trained in practice.
  * Seeding: the k lowest-id vectors are the initial centroids.
  */
object IvfQuantizer {

  /** Fit k cells with `iters` Lloyd updates and return the final
    * assignment (idCol, cell). `e` must carry the exact squared norm in
    * `n2Col` (see [[graft.ops.Vectors.norm2Exact]]).
    */
  def fitAssign(
      e: DataFrame,
      idCol: String,
      vecCol: String,
      n2Col: String,
      k: Int,
      iters: Int): DataFrame = {
    // exploded (id, dim, x) component view; x is the exactly-widened float.
    // Persisted: it feeds every assignment and every centroid update.
    val comp = graft.ops.Caches.trackPersist(
      e.select(col(idCol).cast("long").as("__id"), posexplode(col(vecCol)).as(Seq("__dim", "__xf")))
        .withColumn("__x", col("__xf").cast("double"))
        .drop("__xf"))
    val n2 = e.select(col(idCol).cast("long").as("__id"), col(n2Col).as("__n2"))

    // seed centroids: the k lowest-id vectors themselves (quantized at the
    // same scale the update sums use, so iteration 0 follows the same rules)
    val cent0 = comp.filter(col("__id") < k)
      .select(
        col("__id").as("cell"),
        col("__dim"),
        col("__x").cast(DecimalType(38, 9)).cast("double").as("__s"))

    def assign(cent: DataFrame): DataFrame = {
      val ns = cent.groupBy("cell")
        .agg(sum((col("__s") * col("__s")).cast(DecimalType(38, 4))).cast("double").as("__ns2"))
      val dots = comp.join(broadcast(cent), "__dim")
        .groupBy(col("__id"), col("cell"))
        .agg(sum((col("__x") * col("__s")).cast(DecimalType(38, 9))).cast("double").as("__dot"))
      dots.join(broadcast(ns), "cell")
        .join(n2, "__id")
        .withColumn("__cos", graft.ops.Vectors.cosineFrom(col("__dot"), col("__n2"), col("__ns2")))
        .withColumn(
          "__rn",
          row_number().over(Window.partitionBy(col("__id")).orderBy(col("__cos").desc, col("cell"))))
        .filter(col("__rn") === 1)
        .select(col("__id"), col("cell"))
    }

    def update(assigned: DataFrame): DataFrame =
      comp.join(assigned, "__id")
        .groupBy(col("cell"), col("__dim"))
        .agg(sum(col("__x").cast(DecimalType(38, 9))).cast("double").as("__s"))

    var a = assign(cent0)
    for (_ <- 1 to iters) a = assign(update(a))
    a.select(col("__id").as(idCol), col("cell"))
  }

  /** DuckDB CTE chain mirroring [[fitAssign]] exactly: comp → cent0 →
    * (ns_t, dots_t, a_t, cent_{t+1})* → `assigned(vec_id, cell)`. Expects a
    * CTE `n(vec_id, n2)` with the exact squared norms in scope, and the
    * table `embeddings(vec_id, embedding)` with `dims` components.
    */
  def lloydSql(k: Int, iters: Int, dims: Int): String = {
    val sb = new StringBuilder
    sb.append(s"""comp AS (SELECT vec_id, i.i AS dim, CAST(embedding[i.i] AS DOUBLE) AS x
           FROM embeddings, unnest(generate_series(1, $dims)) AS i(i)),
         cent0 AS (SELECT vec_id AS cell, dim, CAST(CAST(x AS DECIMAL(38,9)) AS DOUBLE) AS s
                   FROM comp WHERE vec_id < $k)""")
    for (t <- 0 to iters) {
      sb.append(s""",
         ns$t AS (SELECT cell, CAST(sum(CAST(s * s AS DECIMAL(38,4))) AS DOUBLE) AS ns2
                  FROM cent$t GROUP BY 1),
         dots$t AS (SELECT c.vec_id, ct.cell, CAST(sum(CAST(c.x * ct.s AS DECIMAL(38,9))) AS DOUBLE) AS dot
                    FROM comp c JOIN cent$t ct ON ct.dim = c.dim GROUP BY 1, 2),
         a$t AS (SELECT vec_id, cell FROM (
                  SELECT d.vec_id, d.cell, row_number() OVER (PARTITION BY d.vec_id ORDER BY
                    d.dot / nullif(sqrt(n.n2) * sqrt(ns.ns2), CAST(0.0 AS DOUBLE)) DESC, d.cell) AS rn
                  FROM dots$t d JOIN n ON n.vec_id = d.vec_id JOIN ns$t ns ON ns.cell = d.cell)
                 WHERE rn = 1)""")
      if (t < iters) sb.append(s""",
         cent${t + 1} AS (SELECT a.cell, c.dim, CAST(sum(CAST(c.x AS DECIMAL(38,9))) AS DOUBLE) AS s
                          FROM comp c JOIN a$t a ON a.vec_id = c.vec_id GROUP BY 1, 2)""")
    }
    sb.append(s""",
         assigned AS (SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM a$iters)""")
    sb.toString
  }
}
