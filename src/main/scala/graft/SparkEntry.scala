package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY §2 (plus the dedup / similarity / text
  * extensions) is registered as a named query over the driver's parquet
  * tables; each SQL-expressible one carries a DuckDB oracle that
  * hash-matches bit-for-bit (determinism strategy in [[graft.queries.QDef]]).
  */
object SparkEntry {
  private val all: Seq[QDef] =
    Relational.defs ++ TimeSeries.defs ++ Scalers.defs ++
      DedupQ.defs ++ TextQ.defs ++ SimilarityQ.defs ++ MlQ.defs ++
      EventsQ.defs ++ CurationQ.defs

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * per-user hourly tumbling aggregation over events (W1 + A3/A4).
    */
  def entry(spark: SparkSession): DataFrame = {
    // events.ts has shipped as TIMESTAMP(NANOS), TIMESTAMP, and (currently)
    // TIMESTAMP_NTZ across driver rounds — Q.events handles all three, but
    // needs the legacy conf for the nanos shape and a UTC session timezone
    // for the NTZ→TIMESTAMP cast to match the oracle's epoch_us (entry runs
    // on the driver's own session, so self-set both; Verify/Bench set them
    // at build time)
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    try spark.conf.set("spark.sql.session.timeZone", "UTC")
    catch { case _: Throwable => () }
    queries("w1_tumble_agg")(spark, "/root/testdata/sf0.001")
  }

  /** Second flagship, on the `documents` table — mirrors [[entry]]'s role
    * for the text side (cheap insurance against a driver smoke-check of a
    * non-events table, the way round 7's regen hit events): per-document
    * token/quality statistics (t1). Same self-set session confs as entry.
    */
  def entryDocs(spark: SparkSession): DataFrame = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    try spark.conf.set("spark.sql.session.timeZone", "UTC")
    catch { case _: Throwable => () }
    queries("t1_token_stats")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
