package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Canary for DRIVER TESTDATA REGENERATION drift across ALL tables — the
  * generalization of [[EventsSchemaSpec]] (which pins the three accepted
  * events.ts shapes). Round 7's outage was a silent regen that changed one
  * column's parquet type and broke 42 queries at analysis time while the
  * old Verify swallowed the errors; this spec makes any future drift fail
  * the FIRST `sbt test` run of the round, naming the table and column.
  *
  * On failure: the driver regenerated `/root/testdata` with a new shape.
  * Adapt the reader (as `Q.events` does for its three historical ts
  * shapes), re-run the full oracle gate at sf0.001/sf0.01/sf0.1, then
  * update the accepted-type map here. Timestamp-carrying columns accept
  * every shape the driver has ever shipped (µs TIMESTAMP with/without tz,
  * plus nanos-as-long BIGINT under the session's legacy conf); all other
  * columns pin their exact current type.
  */
class TestdataSchemaSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  // the shapes driver timestamps have shipped in (see EventsSchemaSpec)
  private val tsShapes: Set[DataType] =
    Set(TimestampType, TimestampNTZType, LongType)

  /** table -> (column -> accepted types). */
  private val expected: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> Set(IntegerType),
      "r_name" -> Set(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> Set(IntegerType),
      "n_name" -> Set(StringType),
      "n_regionkey" -> Set(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> Set(LongType),
      "c_name" -> Set(StringType),
      "c_nationkey" -> Set(IntegerType),
      "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> Set(LongType),
      "s_name" -> Set(StringType),
      "s_nationkey" -> Set(IntegerType),
      "s_acctbal" -> Set(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> Set(LongType),
      "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType),
      "p_type" -> Set(StringType),
      "p_size" -> Set(IntegerType),
      "p_retailprice" -> Set(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> Set(LongType),
      "o_custkey" -> Set(LongType),
      "o_orderstatus" -> Set(StringType),
      "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> (tsShapes + DateType),
      "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> Set(LongType),
      "l_partkey" -> Set(LongType),
      "l_suppkey" -> Set(LongType),
      "l_linenumber" -> Set(IntegerType),
      "l_quantity" -> Set(DoubleType),
      "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType),
      "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType),
      "l_linestatus" -> Set(StringType),
      "l_shipdate" -> (tsShapes + DateType)),
    "events" -> Seq(
      "event_id" -> Set(LongType),
      "ts" -> tsShapes,
      "user_id" -> Set(LongType),
      "event_type" -> Set(StringType),
      "value" -> Set(DoubleType),
      "props" -> Set(StringType)),
    "documents" -> Seq(
      "doc_id" -> Set(LongType),
      "text" -> Set(StringType),
      "lang" -> Set(StringType),
      "source" -> Set(StringType),
      "n_chars" -> Set(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, containsNull = false)),
      "label" -> Set(IntegerType)))

  test("no driver column carries NULLs (latent NULL-propagation divergence guard)") {
    // A regen-audited census, not an assumption: the whole testdata is
    // NULL-free today (probed at every sf), and many oracle-matched
    // expressions are only verified on NULL-free input — a propagated NULL
    // hits each engine's OWN null rules downstream (Spark NULLS FIRST asc
    // vs DuckDB NULLS LAST in rank/window axes, skyline dominance with a
    // NULL axis, count(*)-vs-count(x) mean denominators). The IVM mean and
    // o6_skyline are NULL-proofed by construction; the rest rely on this
    // census. If a driver regen introduces NULLs anywhere, this fails
    // naming table.column so guards get added DELIBERATELY instead of the
    // gate diverging silently.
    import org.apache.spark.sql.functions.{col, count, lit}
    val offenders = expected.keys.toSeq.sorted.flatMap { table =>
      val df = Q.t(spark, sfDir, table)
      val total = count(lit(1))
      val row = df.select(df.columns.toIndexedSeq.map(c =>
        (total - count(col(c))).as(c)): _*).first()
      df.columns.zipWithIndex.collect {
        case (c, i) if row.getLong(i) > 0L => s"$table.$c (${row.getLong(i)} NULLs)"
      }
    }
    assert(offenders.isEmpty,
      s"DRIVER REGEN DRIFT: NULLs appeared in: ${offenders.mkString(", ")} — " +
        "audit every query touching these columns for Spark-vs-DuckDB NULL " +
        "divergence (coalesce/filter both sides, o6_skyline-style) before trusting the gate")
  }

  expected.foreach { case (table, cols) =>
    test(s"driver table '$table' matches its pinned schema contract") {
      val schema = Q.t(spark, sfDir, table).schema
      val actualNames = schema.fields.map(_.name).toSeq
      assert(
        actualNames == cols.map(_._1),
        s"DRIVER REGEN DRIFT: $table columns changed — expected " +
          s"${cols.map(_._1).mkString(",")} but read ${actualNames.mkString(",")}")
      cols.foreach { case (name, accepted) =>
        val actual = schema(name).dataType
        assert(
          accepted.contains(actual),
          s"DRIVER REGEN DRIFT: $table.$name is $actual, accepted shapes: " +
            s"${accepted.mkString(" | ")} — adapt the reader, re-run the " +
            "oracle gate at all SFs, then extend this canary")
      }
    }
  }
}
