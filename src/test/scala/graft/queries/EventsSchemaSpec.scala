package graft.queries

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType, Types}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Canary for the driver's events.ts schema drift (round-7 outage: the
  * regenerated parquet switched TIMESTAMP(NANOS) → TIMESTAMP_NTZ µs and all
  * 42 events queries threw at analysis time). [[Q.events]] must accept every
  * shape the driver has ever shipped and produce the identical BIGINT
  * `ts_us` key for each:
  *
  *   1. TIMESTAMP(NANOS) — under `spark.sql.legacy.parquet.nanosAsLong=true`
  *      (the shared-session conf) Spark surfaces it as a nanos BIGINT;
  *   2. TIMESTAMP µs (isAdjustedToUTC) — plain `unix_micros`;
  *   3. TIMESTAMP_NTZ µs — cast to TIMESTAMP under the UTC session timezone
  *      then `unix_micros` (matches DuckDB `epoch_us(ts)`, which also treats
  *      naive timestamps as UTC).
  *
  * Spark cannot write TIMESTAMP(NANOS) itself, so fixture 1 is authored with
  * parquet-mr's example writer directly.
  */
class EventsSchemaSpec extends SparkSpec {
  // fixed epoch-µs values spanning a DST boundary of a non-UTC zone and a
  // non-midnight remainder — any session-timezone leak in the NTZ cast
  // would shift these by a whole hour
  private val tsUs: Seq[Long] = Seq(
    1704067200000000L,           // 2024-01-01T00:00:00Z
    1711846923456789L,           // 2024-03-31 ~01:02Z (EU DST switch day)
    1735689599999999L)           // 2024-12-31T23:59:59.999999Z

  private def tmp(tag: String): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_evschema_$tag").toFile
    d.deleteOnExit(); d
  }

  private def writeNanosFixture(dir: java.io.File): Unit = {
    val schema = Types.buildMessage()
      .required(PrimitiveType.PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(true, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .required(PrimitiveType.PrimitiveTypeName.INT64).named("event_id")
      .named("events")
    val writer = ExampleParquetWriter
      .builder(new Path(s"${dir.getAbsolutePath}/events.parquet"))
      .withType(schema)
      .build()
    val gf = new SimpleGroupFactory(schema)
    tsUs.zipWithIndex.foreach { case (us, i) =>
      val g = gf.newGroup()
      g.add("ts", us * 1000L)
      g.add("event_id", i.toLong)
      writer.write(g)
    }
    writer.close()
  }

  private def writeSparkFixture(dir: java.io.File, toTsCol: org.apache.spark.sql.Column): Unit = {
    import spark.implicits._
    tsUs.zipWithIndex.toDF("us", "event_id")
      .select(toTsCol.as("ts"), col("event_id").cast("long"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/events.parquet")
  }

  test("Q.events yields identical ts_us for nanos-long, timestamp, and timestamp_ntz shapes") {
    val nanosDir = tmp("nanos")
    val tzDir = tmp("tz")
    val ntzDir = tmp("ntz")
    writeNanosFixture(nanosDir)
    writeSparkFixture(tzDir, timestamp_micros(col("us")))
    writeSparkFixture(ntzDir, timestamp_micros(col("us")).cast(TimestampNTZType))

    def readBack(dir: java.io.File): Map[Long, Long] =
      Q.events(spark, dir.getAbsolutePath)
        .select(col("event_id"), col("ts_us"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val expected = tsUs.zipWithIndex.map { case (us, i) => i.toLong -> us }.toMap

    // pin the scan-side types first so a failure names the drifted shape
    assert(Q.t(spark, nanosDir.getAbsolutePath, "events").schema("ts").dataType == LongType,
      "nanos fixture must surface as BIGINT under nanosAsLong=true")
    assert(Q.t(spark, tzDir.getAbsolutePath, "events").schema("ts").dataType == TimestampType)
    assert(Q.t(spark, ntzDir.getAbsolutePath, "events").schema("ts").dataType == TimestampNTZType)

    assert(readBack(nanosDir) == expected, "TIMESTAMP(NANOS) shape")
    assert(readBack(tzDir) == expected, "TIMESTAMP µs shape")
    assert(readBack(ntzDir) == expected, "TIMESTAMP_NTZ µs shape")
  }

  test("the driver's current events table is readable and µs-keyed") {
    // the actual canary: breaks the moment the driver regenerates testdata
    // with a shape Q.events does not handle (round 7 failure mode)
    val ev = Q.events(spark, "/root/testdata/sf0.001")
    val row = ev.agg(min("ts_us"), max("ts_us"), count(lit(1))).collect()(0)
    assert(row.getLong(2) > 0, "events table is empty")
    // epoch-µs sanity window: 2000-01-01 .. 2100-01-01 in MICROseconds — a
    // nanos/millis mixup lands 1000× outside it
    val (lo, hi) = (946684800000000L, 4102444800000000L)
    assert(row.getLong(0) >= lo && row.getLong(1) < hi,
      s"ts_us out of µs range: ${row.getLong(0)} .. ${row.getLong(1)}")
  }
}
