package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops._

/** Similarity search over `embeddings` (64-dim float vectors):
  * brute-force exact cosine top-k (the baseline) and sign-bucket LSH
  * (the scale path — candidates only within a bucket, never all pairs).
  *
  * Spark side computes dot products array-locally (zip_with + aggregate in
  * one codegen'd expression, no explode); the oracle unnests — both sum in
  * DECIMAL(38,9), so results are bit-identical.
  */
object SimilarityQ {
  import Q._

  private def withNorm(df: org.apache.spark.sql.DataFrame) =
    df.select(col("vec_id"), col("embedding"))
      .withColumn("n2", Vectors.norm2Exact(col("embedding")))

  /** Oracle CTE: per-vector exact squared norm. */
  private val normSql =
    """n AS (SELECT vec_id,
         CAST(sum(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,9))) AS DOUBLE) AS n2
       FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) GROUP BY 1)"""

  val defs: Seq[QDef] = Seq(
    QDef(
      "sim_cosine_topk",
      (s, d) => {
        val e = withNorm(t(s, d, "embeddings"))
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("n2").as("qn2"))
        val c = e.select(col("vec_id"), col("embedding").as("ce"), col("n2").as("cn2"))
        // Broadcast the tiny query side and STREAM the corpus: at 100 TB the
        // corpus never fits in a broadcast, but the handful of query vectors
        // always does — every corpus partition scans locally against the
        // broadcast queries (BroadcastNestedLoopJoin, build side = q).
        c.join(broadcast(q), col("vec_id") =!= col("query_id"))
          .withColumn("cos", Vectors.cosineFrom(Vectors.dotExact(col("qe"), col("ce")), col("qn2"), col("cn2")))
          .withColumn(
            "rnk",
            row_number().over(Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id")))
              .cast("long"))
          .filter(col("rnk") <= 3)
          .select("query_id", "rnk", "vec_id", "cos")
      },
      Some(s"""WITH $normSql,
               q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
               d AS (SELECT q.query_id, c.vec_id,
                       ${Vectors.sqlDotExact("q.qe", "c.embedding", "i.i")} AS dot
                     FROM q CROSS JOIN embeddings c, unnest(generate_series(1, 64)) AS i(i)
                     WHERE c.vec_id <> q.query_id GROUP BY 1, 2),
               s AS (SELECT d.query_id, d.vec_id,
                       d.dot / nullif(sqrt(nq.n2) * sqrt(nc.n2), CAST(0.0 AS DOUBLE)) AS cos
                     FROM d JOIN n nq ON nq.vec_id = d.query_id JOIN n nc ON nc.vec_id = d.vec_id)
               SELECT query_id, rnk, vec_id, cos FROM
                 (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
                  FROM s) WHERE rnk <= 3""")),

    QDef(
      "sim_ivf_topk",
      // IVF-style ANN: a fixed coarse quantizer (vectors 0..7 stand in for
      // kmeans centroids — the fit would plug in here), every vector is
      // assigned to its max-cosine cell, and queries search ONLY their own
      // cell — the inverted-file structure that bounds candidate counts at
      // scale. All cosines exact-decimal, so the oracle replicates.
      (s, d) => {
        val e = withNorm(t(s, d, "embeddings"))
        val cent = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cent_id"), col("embedding").as("ce"), col("n2").as("cn2"))
        val scored = e.crossJoin(broadcast(cent))
          .withColumn("cos_c", Vectors.cosineFrom(Vectors.dotExact(col("embedding"), col("ce")), col("n2"), col("cn2")))
        val assigned = scored
          .withColumn(
            "rn",
            row_number().over(Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("cent_id"))))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("embedding"), col("n2"), col("cent_id").as("cell"))
        val q = assigned.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("n2").as("qn2"), col("cell"))
        val c = assigned
          .select(col("vec_id"), col("embedding").as("ce2"), col("n2").as("cn22"), col("cell"))
        q.join(c, Seq("cell"))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("cos", Vectors.cosineFrom(Vectors.dotExact(col("qe"), col("ce2")), col("qn2"), col("cn22")))
          .withColumn(
            "rnk",
            row_number().over(Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id")))
              .cast("long"))
          .filter(col("rnk") <= 3)
          .select("query_id", "cell", "rnk", "vec_id", "cos")
      },
      Some(s"""WITH $normSql,
               cent AS (SELECT vec_id AS cent_id, embedding AS ce FROM embeddings WHERE vec_id < 8),
               sc AS (SELECT e.vec_id, cent.cent_id,
                        ${Vectors.sqlDotExact("e.embedding", "cent.ce", "i.i")} AS dot
                      FROM embeddings e CROSS JOIN cent, unnest(generate_series(1, 64)) AS i(i)
                      GROUP BY 1, 2),
               cosc AS (SELECT sc.vec_id, sc.cent_id,
                          sc.dot / nullif(sqrt(nv.n2) * sqrt(nc.n2), CAST(0.0 AS DOUBLE)) AS cos_c
                        FROM sc JOIN n nv ON nv.vec_id = sc.vec_id
                                JOIN n nc ON nc.vec_id = sc.cent_id),
               assigned AS (SELECT vec_id, cent_id AS cell FROM
                             (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cent_id) AS rn
                              FROM cosc) WHERE rn = 1),
               q AS (SELECT a.vec_id AS query_id, a.cell, e.embedding AS qe
                     FROM assigned a JOIN embeddings e ON e.vec_id = a.vec_id WHERE a.vec_id < 5),
               c AS (SELECT a.vec_id, a.cell, e.embedding AS ce2
                     FROM assigned a JOIN embeddings e ON e.vec_id = a.vec_id),
               d AS (SELECT q.query_id, q.cell, c.vec_id,
                       ${Vectors.sqlDotExact("q.qe", "c.ce2", "i.i")} AS dot
                     FROM q JOIN c ON c.cell = q.cell AND c.vec_id <> q.query_id,
                          unnest(generate_series(1, 64)) AS i(i)
                     GROUP BY 1, 2, 3),
               s AS (SELECT d.query_id, d.cell, d.vec_id,
                       d.dot / nullif(sqrt(nq.n2) * sqrt(nc.n2), CAST(0.0 AS DOUBLE)) AS cos
                     FROM d JOIN n nq ON nq.vec_id = d.query_id JOIN n nc ON nc.vec_id = d.vec_id)
               SELECT query_id, cell, rnk, vec_id, cos FROM
                 (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
                  FROM s) WHERE rnk <= 3""")),

    QDef(
      "sim_lsh_bucket",
      (s, d) => {
        val e = withNorm(t(s, d, "embeddings"))
          .withColumn("bucket", Vectors.signBucket(col("embedding"), 8))
        val a = e.select(col("vec_id").as("a_id"), col("embedding").as("ae"),
          col("n2").as("an2"), col("bucket"))
        val b = e.select(col("vec_id").as("b_id"), col("embedding").as("be"),
          col("n2").as("bn2"), col("bucket"))
        a.join(b, Seq("bucket"))
          .filter(col("a_id") < col("b_id"))
          .withColumn("cos", Vectors.cosineFrom(Vectors.dotExact(col("ae"), col("be")), col("an2"), col("bn2")))
          .filter(col("cos") >= 0.0)
          .select("bucket", "a_id", "b_id", "cos")
      },
      Some(s"""WITH $normSql,
               e AS (SELECT vec_id, embedding,
                       ${Vectors.sqlSignBucket("embedding", 8)} AS bucket FROM embeddings),
               p AS (SELECT a.bucket, a.vec_id AS a_id, b.vec_id AS b_id,
                       ${Vectors.sqlDotExact("a.embedding", "b.embedding", "i.i")} AS dot
                     FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id,
                          unnest(generate_series(1, 64)) AS i(i)
                     GROUP BY 1, 2, 3)
               SELECT p.bucket, p.a_id, p.b_id,
                      p.dot / nullif(sqrt(na.n2) * sqrt(nb.n2), CAST(0.0 AS DOUBLE)) AS cos
               FROM p JOIN n na ON na.vec_id = p.a_id JOIN n nb ON nb.vec_id = p.b_id
               WHERE p.dot / nullif(sqrt(na.n2) * sqrt(nb.n2), CAST(0.0 AS DOUBLE))
                     >= CAST(0.0 AS DOUBLE)"""))
  )
}
