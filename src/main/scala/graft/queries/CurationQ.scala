package graft.queries

import org.apache.spark.sql.functions._
import graft.ops._

/** Corpus-curation queries over `documents` that pick or pair WHOLE rows
  * rather than scoring them: the Pareto frontier (multi-objective keep
  * set) and blocked fuzzy record linkage (entity resolution) — both
  * engine-exact (integer outputs only).
  */
object CurationQ {
  import Q._

  val defs: Seq[QDef] = Seq(
    QDef(
      "o6_skyline",
      // multi-objective curation: the documents on the lexical-density
      // Pareto frontier — MAXIMIZE distinct-token count, MINIMIZE length
      // (minimize enters skyline2d as the negated axis). No other doc is
      // at least as type-rich AND at least as short with one strict edge;
      // the anti-correlated axes give a real frontier (a same-direction
      // pair collapses to ~1 dominating doc). Runs the two-stage
      // distributed skyline (local prune per doc_id%32 bucket, global
      // prune over the survivors) so no stage funnels the corpus through
      // one task; the oracle runs the direct single-window form —
      // identical by dominance transitivity (Pareto.skyline2d scaladoc)
      // NULL-text guard (mmHistSql convention): under ANSI (this engine's
      // default) size(NULL)=NULL in BOTH engines, but skyline2d needs
      // non-null axes and a propagated NULL would hit each engine's own
      // null-ordering rules — coalesce to '' identically on both sides so
      // a driver testdata regen with NULL texts cannot diverge the hash
      (s, d) => {
        val docs = t(s, d, "documents").select(
          col("doc_id"),
          col("n_chars"),
          size(array_distinct(split(trim(coalesce(col("text"), lit(""))), " ")))
            .cast("long").as("n_types"),
          (-col("n_chars")).as("neg_chars"))
        Pareto.skyline2d(docs, "n_types", "neg_chars", pmod(col("doc_id"), lit(32)))
          .select("doc_id", "n_chars", "n_types")
      },
      Some("""WITH p AS (SELECT doc_id, n_chars,
                  CAST(length(list_distinct(string_split(trim(coalesce(text, '')), ' '))) AS BIGINT) AS n_types,
                  -n_chars AS neg_chars
                FROM documents),
              w AS (SELECT doc_id, n_chars, n_types, neg_chars,
                  max(neg_chars) OVER (ORDER BY n_types DESC
                    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS y_gt,
                  max(neg_chars) OVER (PARTITION BY n_types) AS y_eq
                FROM p)
              SELECT doc_id, n_chars, n_types FROM w
              WHERE (y_gt IS NULL OR y_gt < neg_chars) AND y_eq = neg_chars""")),

    QDef(
      "dq_kanon",
      // privacy-risk audit: k-anonymity over the (lang, source, 25-char
      // length bin) quasi-identifier — cells with fewer than k=5 members
      // are re-identification risks a release gate must report (the
      // governance sibling of dq_validate's integrity checks). One
      // map-side-combined groupBy; all-integer output
      (s, d) =>
        t(s, d, "documents")
          .groupBy(col("lang"), col("source"), expr("n_chars DIV 25").as("len_bin"))
          .agg(count(lit(1)).as("n"))
          .filter(col("n") < 5),
      Some("""SELECT lang, source, n_chars // 25 AS len_bin,
                CAST(count(*) AS BIGINT) AS n
              FROM documents GROUP BY 1, 2, 3 HAVING count(*) < 5""")),

    QDef(
      "m21_chi2",
      // categorical-association audit: Pearson chi-squared independence
      // test of lang × source (is the language mix uniform across
      // sources, or does some source skew?) plus Cramer's V — the effect
      // size that stays comparable across corpus sizes. Observed counts
      // are integers off one bounded groupBy (|lang|x|source| cells);
      // expected = row*col/n and each (o-e)^2/e term is a fixed IEEE dag;
      // the term sum goes through tie-free trunc-9 fixed point; sqrt is
      // correctly rounded in both engines
      (s, d) => {
        val cells = t(s, d, "documents")
          .groupBy("lang", "source").agg(count(lit(1)).as("o"))
        val rows = cells.groupBy("lang").agg(sum("o").as("r"))
        val cols = cells.groupBy("source").agg(sum("o").as("c"))
        val n = cells.agg(
          sum("o").as("n"),
          countDistinct("lang").as("nr"),
          countDistinct("source").as("nc"))
        val e = col("r").cast("double") * col("c").cast("double") / col("n").cast("double")
        val term = (col("o").cast("double") - e) * (col("o").cast("double") - e) / e
        cells
          .join(broadcast(rows), "lang")
          .join(broadcast(cols), "source")
          .crossJoin(broadcast(n))
          .withColumn("__term", term)
          .groupBy()
          .agg(
            max(col("n")).as("n"),
            ((max(col("nr")) - 1) * (max(col("nc")) - 1)).as("dof"),
            Exact.dsumTrunc9(col("__term")).as("chi2"),
            max(col("nr")).as("__nr"), max(col("nc")).as("__nc"))
          // degenerate-table guard (repo convention — abWelchZ/cuped/dstddev
          // yield NULL, never NaN, for undefined statistics): a single
          // distinct lang or source makes least(nr,nc)-1 = 0 and chi2 = 0,
          // i.e. sqrt(0/0) = NaN in both engines without the guard
          .withColumn("cramers_v",
            when(least(col("__nr"), col("__nc")) > 1,
              sqrt(col("chi2") / (col("n").cast("double") *
                (least(col("__nr"), col("__nc")) - 1).cast("double")))))
          .select("n", "dof", "chi2", "cramers_v")
      },
      Some {
        val e = "(CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
        val o = "CAST(o AS DOUBLE)"
        s"""WITH cells AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
                           FROM documents GROUP BY 1, 2),
            rows_ AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
            cols_ AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
            tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                      CAST(count(DISTINCT lang) AS BIGINT) AS nr,
                      CAST(count(DISTINCT source) AS BIGINT) AS nc
                    FROM cells),
            t AS (SELECT tot.n, tot.nr, tot.nc,
                    ($o - $e) * ($o - $e) / $e AS term
                  FROM cells JOIN rows_ USING (lang) JOIN cols_ USING (source), tot),
            g AS (SELECT max(n) AS n, (max(nr) - 1) * (max(nc) - 1) AS dof,
                    ${Exact.sqlDsumTrunc9("term")} AS chi2,
                    max(nr) AS nr, max(nc) AS nc
                  FROM t)
            SELECT n, dof, chi2,
              CASE WHEN least(nr, nc) > 1
                THEN sqrt(chi2 / (CAST(n AS DOUBLE) * CAST(least(nr, nc) - 1 AS DOUBLE)))
                ELSE NULL END AS cramers_v
            FROM g"""
      }),

    QDef(
      "er_blocked_pairs",
      // entity resolution: candidate duplicate pairs from 16-char-prefix
      // blocking, scored by levenshtein over the 40-char title prefix and
      // kept at <= 12 edits. Oversized blocks (> 100 members) are purged
      // before pairing — the standard ER guard that keeps the per-block
      // quadratic bounded at scale (Linkage.blockedPairs scaladoc); the
      // census rides the self-join's own shuffle key. All-integer output
      (s, d) => Linkage.blockedPairs(t(s, d, "documents"), "doc_id", "text"),
      Some("""WITH k0 AS (SELECT doc_id, substr(text, 1, 16) AS blk,
                   substr(text, 1, 40) AS title FROM documents),
              keep AS (SELECT blk FROM k0 GROUP BY blk HAVING count(*) <= 100),
              k AS (SELECT k0.* FROM k0 JOIN keep USING (blk))
              SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                CAST(levenshtein(a.title, b.title) AS BIGINT) AS dist
              FROM k a JOIN k b ON a.blk = b.blk AND a.doc_id < b.doc_id
              WHERE levenshtein(a.title, b.title) <= 12"""))
  )
}
