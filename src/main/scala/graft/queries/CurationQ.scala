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

  /** The `cur_funnel` ledger builder — shared verbatim with
    * `cur_funnel_summary` so the report cannot fork from the ledger.
    * Stage semantics documented at the QDef.
    *
    * Scan shape: each gate re-reads `documents` pruned to its own 1-2
    * columns and re-derives `Text.tokens` from raw text — KEPT THAT WAY
    * BY MEASUREMENT, against the "share one token bag" intuition. Both
    * shared-bag variants were built and benched at sf0.1 under identical
    * conditions (single-query harness, min of 2 passes): a persisted
    * (doc_id, lang, fp, toks-array) bag = 71.5 cpu-s, a persisted
    * EXPLODED (doc_id, lang, token) flat-string bag = 42.8 cpu-s, the
    * per-gate re-tokenize = 28.3 cpu-s. `split` is codegen-fused into
    * each gate's own pipeline (scan → tokenize → first aggregation in one
    * stage, no materialization), while any cached tokenized form pays
    * columnar-cache encode plus a per-consumer decode that exceeds the
    * splits it saves — the same lesson as the repo's MapType-lookup note:
    * measure the cache, don't assume it. Parquet column pruning keeps the
    * repeated SCANS IO-free; on a source WITHOUT column pruning (row
    * formats, streams) persist a (doc_id, lang, text) projection first.
    * The fingerprint is computed once into `fps` and shared by the keeper
    * election and the ledger join; the post-gate flag frame is persisted
    * (reused by the budget stage and the final ledger join).
    */
  private def funnelLedger(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val docs = t(s, d, "documents")
    val quality = Text.qualityScore(docs, "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"), col("quality_score"))
    val pred = Text.languageIdWith(docs, "doc_id", "text", Q.langProfiles(s, d))
      .select(col("doc_id"), col("pred_lang"))
    val rep = Text.gopherRepetition(docs, "doc_id", "text")
      .select(col("doc_id"), col("flagged"))
    val fps = docs.select(
      col("doc_id"), col("lang"), Text.fingerprint(col("text")).as("fp"))
    val keepers = Dedup.exactGroupsFromFp(fps, "doc_id", "fp")
      .select(col("fp"), col("keeper_id"))
    val base = Caches.trackPersist(fps
      .join(quality, "doc_id")
      .join(pred, Seq("doc_id"), "left")
      .join(rep, Seq("doc_id"), "left")
      .join(keepers, "fp")
      .select(
        col("doc_id"), col("lang"), col("n_tokens"),
        coalesce(col("pred_lang") === col("lang"), lit(false)).as("__lok"),
        (col("quality_score") >= lit(0.35d)).as("__qok"),
        coalesce(col("flagged") === 0L, lit(false)).as("__rok"),
        (col("doc_id") === col("keeper_id")).as("__dok")))
    val survivors = base
      .filter(col("__lok") && col("__qok") && col("__rok") && col("__dok"))
      .select("doc_id", "lang", "n_tokens")
    val budget = Sampling.tokenBudgetLedger(survivors, "doc_id", "lang", "n_tokens", 2000L)
      .select(col("doc_id"), col("keep").as("__bok"))
    base.join(budget, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("lang"), col("n_tokens"),
        when(!col("__lok"), "lang")
          .when(!col("__qok"), "quality")
          .when(!col("__rok"), "repetition")
          .when(!col("__dok"), "dedup")
          .when(col("__bok") === 0L, "budget")
          .as("killed_by"),
        (col("__lok") && col("__qok") && col("__rok") && col("__dok") &&
          col("__bok") === 1L).cast("long").as("keep"))
  }

  /** Oracle CTE chain mirroring [[funnelLedger]], ending in
    * `led(doc_id, lang, n_tokens, killed_by, keep)`. Declared ABOVE
    * `defs` (QDef oracle strings build eagerly at object init).
    */
  private val funnelSql: String =
    s"""${Text.qualitySql()},
        ltok AS (SELECT doc_id, lang, unnest(string_split(trim(text), ' ')) AS token
                 FROM documents),
        lcnt AS (SELECT lang, token, count(*) AS cnt FROM ltok GROUP BY 1, 2),
        prof AS (SELECT lang AS profile_lang, token FROM
                   (SELECT lang, token,
                      row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rnk
                    FROM lcnt) WHERE rnk <= 20),
        lsc AS (SELECT t.doc_id, p.profile_lang, CAST(count(*) AS BIGINT) AS score
                FROM ltok t JOIN prof p ON t.token = p.token GROUP BY 1, 2),
        pr AS (SELECT doc_id, profile_lang AS pred_lang FROM
                 (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, profile_lang) AS rn FROM lsc)
               WHERE rn = 1),
        gtk AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
        gbg AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS g
                FROM gtk, unnest(generate_series(1, len(toks) - 1)) AS u(i)
                WHERE len(toks) >= 3),
        gtg AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
                FROM gtk, unnest(generate_series(1, len(toks) - 2)) AS u(i)
                WHERE len(toks) >= 3),
        gbc AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM gbg GROUP BY 1, 2),
        gb AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nb,
                 CAST(max(c) AS BIGINT) AS topb FROM gbc GROUP BY 1),
        gtc AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM gtg GROUP BY 1, 2),
        gt AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nt,
                 CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dupt
               FROM gtc GROUP BY 1),
        gflag AS (SELECT gb.doc_id,
                    CASE WHEN CAST(gb.topb AS DOUBLE) / CAST(gb.nb AS DOUBLE)
                           > CAST(0.2 AS DOUBLE)
                          OR CAST(gt.dupt AS DOUBLE) / CAST(gt.nt AS DOUBLE)
                           > CAST(0.15 AS DOUBLE)
                         THEN 1 ELSE 0 END AS flagged
                  FROM gb JOIN gt ON gt.doc_id = gb.doc_id),
        fps AS (SELECT doc_id, lang,
                  md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
                FROM documents),
        kp AS (SELECT fp, min(doc_id) AS keeper FROM fps GROUP BY 1),
        base AS (SELECT f.doc_id, f.lang, q.n_tokens,
                   coalesce(pr.pred_lang = f.lang, false) AS lok,
                   q.quality_score >= CAST(0.35 AS DOUBLE) AS qok,
                   coalesce(g.flagged = 0, false) AS rok,
                   f.doc_id = k.keeper AS dok
                 FROM fps f
                 JOIN qual q ON q.doc_id = f.doc_id
                 LEFT JOIN pr ON pr.doc_id = f.doc_id
                 LEFT JOIN gflag g ON g.doc_id = f.doc_id
                 JOIN kp k ON k.fp = f.fp),
        surv AS (SELECT doc_id, lang, n_tokens,
                   ${Sampling.sqlHashU24("doc_id")} AS u
                 FROM base WHERE lok AND qok AND rok AND dok),
        bud AS (SELECT doc_id,
                  CASE WHEN sum(n_tokens) OVER (PARTITION BY lang
                    ORDER BY u, doc_id ROWS UNBOUNDED PRECEDING) <= 2000
                    THEN 1 ELSE 0 END AS bok
                FROM surv),
        led AS (SELECT b.doc_id, b.lang, b.n_tokens,
                  CASE WHEN NOT lok THEN 'lang'
                       WHEN NOT qok THEN 'quality'
                       WHEN NOT rok THEN 'repetition'
                       WHEN NOT dok THEN 'dedup'
                       WHEN bud.bok = 0 THEN 'budget' END AS killed_by,
                  CAST(CASE WHEN lok AND qok AND rok AND dok AND bud.bok = 1
                    THEN 1 ELSE 0 END AS BIGINT) AS keep
                FROM base b LEFT JOIN bud ON bud.doc_id = b.doc_id)"""

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
              WHERE levenshtein(a.title, b.title) <= 12""")),

    QDef(
      "cur_funnel",
      // the END-TO-END curation pipeline as ONE auditable ledger (the
      // FineWeb/C4-report shape): every doc flows through the standard
      // gate sequence — language-ID agreement (t3's voter must confirm
      // the label) → quality score ≥ 0.35 (the one t2 definition; ~25%
      // of this corpus falls below) → Gopher repetition rules (t25's
      // flag; docs too short to audit fail CLOSED) → exact-dedup first
      // claimant (d1's keeper) → per-language 2000-token budget over the
      // survivors (mix_token_budget's exact-quota scan) — and the ledger
      // records WHICH stage killed each doc (`killed_by`, NULL = kept),
      // the attribution a curation ablation report is built from. Every
      // stage reuses its registered operator verbatim, so the funnel
      // cannot fork from the per-stage queries; all flags are
      // engine-exact (integer votes, one IEEE score comparison, md5
      // fingerprints, integral budget cumsum)
      (s, d) => funnelLedger(s, d),
      Some(s"""WITH $funnelSql
               SELECT doc_id, lang, n_tokens, killed_by, keep FROM led""")),

    QDef(
      "cur_funnel_summary",
      // the funnel REPORT: per stage (first-killing gate, or 'kept'),
      // how many docs and tokens it removed — the table a curation
      // ablation writes up. Rides funnelLedger/funnelSql verbatim, so
      // the report cannot disagree with the ledger.
      (s, d) => funnelLedger(s, d)
        .groupBy(coalesce(col("killed_by"), lit("kept")).as("stage"))
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens")),
      Some(s"""WITH $funnelSql
               SELECT coalesce(killed_by, 'kept') AS stage,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_tokens) AS BIGINT) AS n_tokens
               FROM led GROUP BY 1""")),

    QDef(
      "cur_source_cap",
      // per-source document cap — the FineWeb per-domain gate with
      // `source` as the domain proxy: at most 15 docs per source, admitted
      // in deterministic (hash, doc_id) order, full ledger (rank + keep)
      // so the rejected tail is auditable. The rank rides
      // Windows.chunkedScan on the hash high bits (sources × 256
      // parallelism — the mix_shards shape) because the ledger keeps every
      // row of a potentially hot source; the oracle's direct row_number is
      // bit-identical. Funnel slot: between dedup and the token budget
      // (Sampling.sourceCapLedger scaladoc)
      (s, d) => Sampling.sourceCapLedger(
        t(s, d, "documents").select("doc_id", "source"),
        "doc_id", "source", maxDocs = 15),
      Some(s"""WITH g AS (SELECT doc_id, source,
                  ${Sampling.sqlHashU24("doc_id")} AS u
                FROM documents)
               SELECT doc_id, source,
                 CAST(row_number() OVER (PARTITION BY source ORDER BY u, doc_id)
                   AS BIGINT) AS src_rank,
                 CAST(CASE WHEN row_number() OVER (PARTITION BY source
                     ORDER BY u, doc_id) <= 15
                   THEN 1 ELSE 0 END AS BIGINT) AS keep
               FROM g""")),

    QDef(
      "cur_source_token_cap",
      // per-source TOKEN cap — cur_source_cap weighted by token mass (how
      // real pipelines cap a domain: many short boilerplate pages and a
      // few huge ones face the same budget): inclusive running token sum
      // per source in deterministic (hash, doc_id) order, keep while the
      // cumsum fits 1000 tokens (the budgetedPrefix greedy convention —
      // non-negative deltas make the kept set a true prefix). Same
      // chunkedScan shape as cur_source_cap (the ledger keeps every row
      // of a potentially hot source); the oracle's direct running-sum
      // window is bit-identical (integer sums)
      (s, d) => Sampling.sourceTokenCapLedger(
        t(s, d, "documents").select(
          col("doc_id"), col("source"),
          size(Text.tokens(col("text"))).cast("long").as("n_tokens")),
        "doc_id", "source", "n_tokens", maxTokens = 1000),
      Some(s"""WITH g AS (SELECT doc_id, source,
                  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
                  ${Sampling.sqlHashU24("doc_id")} AS u
                FROM documents)
               SELECT doc_id, source, n_tokens,
                 CAST(row_number() OVER (PARTITION BY source ORDER BY u, doc_id)
                   AS BIGINT) AS src_rank,
                 CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS src_cum_tokens,
                 CAST(CASE WHEN sum(n_tokens) OVER (PARTITION BY source
                     ORDER BY u, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) <= 1000
                   THEN 1 ELSE 0 END AS BIGINT) AS keep
               FROM g"""))
  )
}
