package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops._

/** Relational operator demo queries over the TPC-H-ish driver tables.
  *
  * Covers SURVEY §2 items S2 (scan+prune), P1-P5/P7/P13 (projections,
  * filters, scalar functions), J1/J4 + semi/anti (joins), A1/A2 (groupBy,
  * distinct), O2/O3 (top-k per group, set ops), rollup/cube passthrough and
  * M1 (label encoding as pure SQL). Filters and projections are written so
  * Catalyst pushes them into the parquet scan (`PushedFilters`/`ReadSchema`);
  * joins leave strategy choice to Catalyst/AQE — customer/nation-sized sides
  * broadcast automatically.
  */
object Relational {
  import Q._

  val defs: Seq[QDef] = Seq(
    QDef(
      "s2_scan_project",
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_quantity") < 5 && col("l_returnflag") === "A")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
              FROM lineitem WHERE l_quantity < 5 AND l_returnflag = 'A'""")),

    QDef(
      "p1_substring_concat",
      (s, d) =>
        t(s, d, "customer").select(
          col("c_custkey"),
          substring(col("c_name"), 1, 8).as("name_prefix"),
          substring(col("c_name"), 10, 3).as("name_mid"),
          concat_ws("|", col("c_mktsegment"), col("c_name")).as("seg_name")),
      Some("""SELECT c_custkey, substr(c_name, 1, 8) AS name_prefix,
              substr(c_name, 10, 3) AS name_mid,
              concat_ws('|', c_mktsegment, c_name) AS seg_name FROM customer""")),

    QDef(
      "p2_split_index",
      // Spark array indexing via get() is 0-based; DuckDB list indexing is
      // 1-based — the SQL below indexes [1]/[2] for the same two tokens.
      (s, d) =>
        t(s, d, "part").select(
          col("p_partkey"),
          get(split(col("p_name"), " "), lit(0)).as("first_word"),
          get(split(col("p_name"), " "), lit(1)).as("second_word")),
      Some("""SELECT p_partkey, string_split(p_name, ' ')[1] AS first_word,
              string_split(p_name, ' ')[2] AS second_word FROM part""")),

    QDef(
      "p7_arith_project",
      (s, d) =>
        t(s, d, "lineitem").select(
          col("l_orderkey"),
          col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax"))).as("effective_price")),
      Some("""SELECT l_orderkey, l_linenumber,
              l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) * (CAST(1.0 AS DOUBLE) + l_tax)
                AS effective_price FROM lineitem""")),

    QDef(
      "q1_pricing_summary",
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_quantity") < 50)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            Exact.dsum(col("l_quantity")).as("sum_qty"),
            Exact.dsum(col("l_extendedprice")).as("sum_base_price"),
            Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
            Exact.dmean(col("l_quantity")).as("avg_qty"),
            Exact.dmean(col("l_extendedprice")).as("avg_price"),
            count(lit(1)).as("n")),
      Some(s"""SELECT l_returnflag, l_linestatus,
               ${Exact.sqlDsum("l_quantity")} AS sum_qty,
               ${Exact.sqlDsum("l_extendedprice")} AS sum_base_price,
               ${Exact.sqlDsum("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")} AS sum_disc_price,
               ${Exact.sqlDmean("l_quantity")} AS avg_qty,
               ${Exact.sqlDmean("l_extendedprice")} AS avg_price,
               CAST(count(*) AS BIGINT) AS n
               FROM lineitem WHERE l_quantity < 50 GROUP BY 1, 2""")),

    QDef(
      "j1_join_agg",
      (s, d) =>
        t(s, d, "orders")
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"), col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n_orders"),
            Exact.dsum(col("o_totalprice")).as("total_price")),
      Some(s"""SELECT c_mktsegment, o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               ${Exact.sqlDsum("o_totalprice")} AS total_price
               FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2""")),

    QDef(
      "pivot_event_counts",
      // long→wide pivot with an EXPLICIT value list (never inferred: an
      // inference pass scans the corpus once just to learn column names,
      // and a late-arriving category silently changes the schema)
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        events(s, d)
          .groupBy("user_id")
          .pivot("event_type", types)
          .agg(count(lit(1)))
          .select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      },
      Some {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val cols = types.map(t =>
          s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t").mkString(", ")
        s"SELECT user_id, $cols FROM events GROUP BY 1"
      }),

    QDef(
      "j6_salted_join",
      // manually salted skewed join: lineitem's partkey distribution fans
      // out over 8 salt buckets, part replicates 8x — the salt never
      // reaches the output, so the aggregate is exactly the plain join's
      (s, d) => {
        val li = t(s, d, "lineitem").select(
          col("l_partkey").as("pk"), col("l_orderkey"), col("l_quantity"))
        val p = t(s, d, "part").select(col("p_partkey").as("pk"), col("p_brand"))
        Skew.saltedJoin(li, p, "pk", "l_orderkey", 8)
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"), Exact.dsum(col("l_quantity")).as("sum_qty"))
      },
      Some(s"""SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
               ${Exact.sqlDsum("l_quantity")} AS sum_qty
               FROM lineitem JOIN part ON p_partkey = l_partkey GROUP BY 1""")),

    QDef(
      "j4_lookup_default",
      (s, d) =>
        t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(
            count(col("o_orderkey")).as("n_orders"),
            coalesce(Exact.dsum(col("o_totalprice")), lit(0.0)).as("total_price")),
      Some(s"""SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders,
               coalesce(${Exact.sqlDsum("o_totalprice")}, CAST(0.0 AS DOUBLE)) AS total_price
               FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY 1""")),

    QDef(
      "j_semi",
      (s, d) =>
        t(s, d, "customer")
          .join(
            t(s, d, "orders").filter(col("o_totalprice") > 300000),
            col("c_custkey") === col("o_custkey"),
            "left_semi")
          .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer WHERE EXISTS
              (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)""")),

    QDef(
      "j_anti",
      (s, d) =>
        t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS
              (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")),

    QDef(
      "set_union_distinct",
      (s, d) =>
        t(s, d, "nation").select(col("n_name").as("name"))
          .union(t(s, d, "region").select(col("r_name").as("name")))
          .distinct(),
      Some("SELECT n_name AS name FROM nation UNION SELECT r_name AS name FROM region")),

    QDef(
      "set_intersect",
      (s, d) =>
        t(s, d, "supplier").select(col("s_nationkey").as("nk"))
          .intersect(t(s, d, "customer").select(col("c_nationkey").as("nk"))),
      Some("SELECT s_nationkey AS nk FROM supplier INTERSECT SELECT c_nationkey AS nk FROM customer")),

    QDef(
      "set_except",
      (s, d) =>
        t(s, d, "customer").select(col("c_nationkey").as("nk"))
          .except(t(s, d, "supplier").select(col("s_nationkey").as("nk"))),
      Some("SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey AS nk FROM supplier")),

    QDef(
      "agg_rollup",
      (s, d) =>
        t(s, d, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), Exact.dsum(col("l_quantity")).as("sum_qty")),
      Some(s"""SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
               ${Exact.sqlDsum("l_quantity")} AS sum_qty
               FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""")),

    QDef(
      "agg_cube",
      (s, d) =>
        t(s, d, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), Exact.dsum(col("o_totalprice")).as("sum_price")),
      Some(s"""SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
               ${Exact.sqlDsum("o_totalprice")} AS sum_price
               FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""")),

    QDef(
      "a2_distinct",
      (s, d) => t(s, d, "lineitem").select("l_returnflag", "l_linestatus").distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    QDef(
      "o2_topk_per_group",
      (s, d) =>
        t(s, d, "orders")
          .withColumn(
            "rnk",
            row_number()
              .over(Window.partitionBy(col("o_custkey"))
                .orderBy(col("o_totalprice").desc, col("o_orderkey")))
              .cast("long"))
          .filter(col("rnk") <= 3)
          .select("o_custkey", "rnk", "o_orderkey", "o_totalprice"),
      Some("""SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM
              (SELECT o_custkey, o_orderkey, o_totalprice,
                      row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
               FROM orders) WHERE rnk <= 3""")),

    QDef(
      "o5_topk_heap",
      // o2's semantics through the custom whole-operator path: the
      // TopKPerKeyExec physical node keeps a bounded k-heap per key
      // (O(n log k), no partition sort, no spill) instead of ranking a
      // fully sorted window — same rows, same ranks, pinned against the
      // row_number oracle
      (s, d) => TopK.perKey(
        t(s, d, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
        Seq("o_custkey"),
        Seq(("o_totalprice", true), ("o_orderkey", false)),
        3)
        .select("o_custkey", "rnk", "o_orderkey", "o_totalprice"),
      Some("""SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM
              (SELECT o_custkey, o_orderkey, o_totalprice,
                      row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
               FROM orders) WHERE rnk <= 3""")),

    QDef(
      "agg_grouping_sets",
      // explicit GROUPING SETS (beyond the rollup/cube shorthands)
      (s, d) => {
        t(s, d, "orders").createOrReplaceTempView("v_orders")
        s.sql(s"""SELECT o_orderstatus, o_orderpriority,
                  CAST(count(*) AS BIGINT) AS n, ${Exact.sqlDsum("o_totalprice")} AS sum_price
                  FROM v_orders
                  GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
      },
      Some(s"""SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n, ${Exact.sqlDsum("o_totalprice")} AS sum_price
               FROM orders
               GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")),

    QDef(
      "sketch_approx",
      // sketch passthroughs: HLL distinct counts + approximate quantiles.
      // Sketch internals differ engine to engine, so no oracle — the driver
      // records the rows-only check.
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            approx_count_distinct(col("l_partkey")).as("approx_parts"),
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx_median")),
      None),

    QDef(
      "agg_count_distinct",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            count(lit(1)).as("n")),
      Some("""SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
              CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
              CAST(count(*) AS BIGINT) AS n
              FROM lineitem GROUP BY 1""")),

    QDef(
      "m1_label_encode",
      (s, d) =>
        events(s, d).select("event_type").distinct()
          .withColumn("code", (dense_rank().over(Window.orderBy(col("event_type"))) - 1).cast("long")),
      Some("""SELECT event_type, CAST(dense_rank() OVER (ORDER BY event_type) - 1 AS BIGINT) AS code
              FROM (SELECT DISTINCT event_type FROM events)""")),

    QDef(
      "a17_corr",
      // per-flag Pearson correlation + sample covariance of quantity vs
      // extendedprice from exact decimal moment sums — never the builtin
      // corr/covar_samp (streaming Welford, partition-order-dependent)
      (s, d) =>
        Stats.corrCovar(
          t(s, d, "lineitem"), Seq("l_returnflag"), "l_quantity", "l_extendedprice"),
      Some(s"""WITH s AS (SELECT l_returnflag,
                CAST(count(*) AS BIGINT) AS n_rows,
                ${Exact.sqlDsum("l_quantity")} AS sx,
                ${Exact.sqlDsum("l_extendedprice")} AS sy,
                ${Exact.sqlDsumTrunc4("l_quantity * l_extendedprice")} AS sxy,
                ${Exact.sqlDsumTrunc4("l_quantity * l_quantity")} AS sxx,
                ${Exact.sqlDsumTrunc4("l_extendedprice * l_extendedprice")} AS syy
              FROM lineitem GROUP BY 1)
              SELECT l_returnflag, n_rows,
                CASE WHEN n_rows > 1 THEN
                  (CAST(n_rows AS DOUBLE) * sxy - sx * sy)
                    / (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - CAST(1 AS DOUBLE)))
                END AS covar_samp,
                CASE WHEN CAST(n_rows AS DOUBLE) * sxx - sx * sx > 0
                      AND CAST(n_rows AS DOUBLE) * syy - sy * sy > 0 THEN
                  (CAST(n_rows AS DOUBLE) * sxy - sx * sy)
                    / (sqrt(CAST(n_rows AS DOUBLE) * sxx - sx * sx)
                       * sqrt(CAST(n_rows AS DOUBLE) * syy - sy * sy))
                END AS pearson_r
              FROM s""")),

    QDef(
      "p18_unpivot",
      // wide-to-long melt: the four lineitem measure columns unpivoted to
      // (metric, value) rows — Spark's native unpivot plans as an Expand
      // (row replication IN-STAGE off the scan: no shuffle, no join, stays
      // inside whole-stage codegen); values are raw doubles untouched, so
      // the compare is bit-exact
      (s, d) =>
        t(s, d, "lineitem")
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(
              col("l_quantity"), col("l_extendedprice"),
              col("l_discount"), col("l_tax")),
            "metric",
            "value"),
      Some {
        val arms = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
          .map(c =>
            s"""SELECT l_orderkey, l_linenumber, '$c' AS metric, $c AS value
                FROM lineitem""")
          .mkString("\nUNION ALL\n")
        arms
      }),

    QDef(
      "j8_star_revenue",
      // the TPC-H Q5 shape: local-supplier revenue per nation — the classic
      // multi-join star probe. Two fact-fact shuffles (lineitem⋈orders on
      // orderkey, then ⋈customer on custkey); supplier/nation/region are
      // dimensions and broadcast (supplier joins on (suppkey, nationkey) so
      // the customer-nation = supplier-nation residual rides the hash key).
      // Date predicate is integer epoch-µs vs a literal, pushed to the
      // orders scan; revenue is the tie-free trunc-4 product sum.
      (s, d) => {
        val yearLoUs = 852076800000000L // 1997-01-01T00:00:00Z
        val yearHiUs = 883612800000000L // 1998-01-01T00:00:00Z
        val ord = t(s, d, "orders")
          .withColumn("o_us", unix_micros(col("o_orderdate").cast("timestamp")))
          .filter(col("o_us") >= yearLoUs && col("o_us") < yearHiUs)
          .select("o_orderkey", "o_custkey")
        val cust = t(s, d, "customer").select("c_custkey", "c_nationkey")
        val supp = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
        val nat = t(s, d, "nation").select("n_nationkey", "n_name", "n_regionkey")
        val reg = t(s, d, "region").filter(col("r_name") === "ASIA").select("r_regionkey")
        t(s, d, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(
            broadcast(supp),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(
            Exact.dsumTrunc4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some(s"""SELECT n_name,
               ${Exact.sqlDsumTrunc4("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")}
                 AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
               FROM lineitem
               JOIN orders ON l_orderkey = o_orderkey
                 AND epoch_us(o_orderdate) >= 852076800000000
                 AND epoch_us(o_orderdate) < 883612800000000
               JOIN customer ON o_custkey = c_custkey
               JOIN supplier ON l_suppkey = s_suppkey
                 AND c_nationkey = s_nationkey
               JOIN nation ON s_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
               GROUP BY 1""")),

    QDef(
      "dq_validate",
      // Deequ-style pre-promotion constraint suite over orders: the three
      // row-local checks (completeness, range, domain) fold into ONE
      // keyless single-pass aggregate; uniqueness runs as its own pruned
      // distinct aggregate (kept out of the shared pass so no metric rides
      // a full-cardinality grouping — regime probes in ops/Quality); RI
      // against customer is ONE broadcast anti-join. 3 jobs total
      // regardless of row-local constraint count, all-integer report. The
      // 250k price ceiling is a deliberately-failing demonstration
      // threshold so the report exercises both verdicts.
      (s, d) =>
        Quality.validate(
          t(s, d, "orders"),
          Seq(
            Quality.Check(
              "complete_o_custkey",
              Quality.failing(col("o_custkey").isNotNull)),
            Quality.Check(
              "range_o_totalprice_le_250k",
              Quality.failing(col("o_totalprice") > 0 && col("o_totalprice") <= 250000.0)),
            Quality.Check(
              "domain_o_orderstatus",
              Quality.failing(col("o_orderstatus").isin("O", "F", "P")))),
          Some(("unique_o_orderkey", "o_orderkey")),
          "o_custkey", t(s, d, "customer"), "c_custkey",
          "ref_o_custkey_in_customer"),
      Some("""WITH m AS (SELECT
                CAST(count(*) AS BIGINT) AS total,
                CAST(count(*) FILTER (WHERE NOT coalesce(o_custkey IS NOT NULL, false)) AS BIGINT) AS v0,
                CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v1,
                CAST(count(*) FILTER (WHERE NOT coalesce(o_totalprice > 0 AND o_totalprice <= 250000.0, false)) AS BIGINT) AS v2,
                CAST(count(*) FILTER (WHERE NOT coalesce(o_orderstatus IN ('O','F','P'), false)) AS BIGINT) AS v3
                FROM orders),
              ri AS (SELECT CAST(count(*) AS BIGINT) AS vri FROM orders o
                     WHERE NOT EXISTS (SELECT 1 FROM customer c
                                       WHERE c.c_custkey = o.o_custkey))
              SELECT c."constraint", c.violations, m.total,
                c.violations = 0 AS passed
              FROM m, ri, LATERAL (VALUES
                ('complete_o_custkey', v0),
                ('unique_o_orderkey', v1),
                ('range_o_totalprice_le_250k', v2),
                ('domain_o_orderstatus', v3),
                ('ref_o_custkey_in_customer', vri)) AS c("constraint", violations)"""))
  )
}
