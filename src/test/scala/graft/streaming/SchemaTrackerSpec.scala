package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.table.VersionedTable

/** Unit behavior of the Autoloader-style schema resolution (SURVEY §7.5
  * risk 6): hints override inference, drift appends, the schema log
  * versions and reloads. The end-to-end mid-stream drift case lives in
  * CdcStreamsSpec. */
class SchemaTrackerSpec extends SparkSpec {

  private def struct(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  test("hints override inferred types; inference-only and hint-only columns survive") {
    val inferred = struct("a" -> StringType, "b" -> LongType)
    val hints = struct("a" -> TimestampType, "c" -> DoubleType)
    assert(SchemaTracker.merge(inferred, hints) ===
      struct("a" -> TimestampType, "b" -> LongType, "c" -> DoubleType))
  }

  test("drift append keeps persisted slots and types, appends only new columns") {
    val persisted = struct("a" -> TimestampType, "b" -> LongType)
    val incoming = struct("b" -> StringType, "note" -> StringType)
    assert(SchemaTracker.appendNew(persisted, incoming) ===
      struct("a" -> TimestampType, "b" -> LongType, "note" -> StringType))
  }

  test("resolve infers, persists v0, evolves to v1 on drift, and reloads idempotently") {
    val base = Files.createTempDirectory("schema-track")
    val landing = Files.createDirectories(base.resolve("landing"))
    val loc = base.resolve("schemas").toString
    Files.writeString(landing.resolve("a.json"),
      """{"id": 1, "name": "x"}""")

    val hints = struct("id" -> LongType)
    val v0 = SchemaTracker.resolve(spark, landing.toString, hints, loc)
    assert(v0 === struct("id" -> LongType, "name" -> StringType))
    assert(SchemaTracker.latest(Paths.get(loc)).map(_._1) === Some(0L))

    // restart without drift: same schema, no new log version
    assert(SchemaTracker.resolve(spark, landing.toString, hints, loc) === v0)
    assert(SchemaTracker.latest(Paths.get(loc)).map(_._1) === Some(0L))

    // a new column lands -> v1 appends it; existing types are stable
    Files.writeString(landing.resolve("b.json"),
      """{"id": 2, "name": "y", "extra": 3.5}""")
    val v1 = SchemaTracker.resolve(spark, landing.toString, hints, loc)
    assert(v1 === struct("id" -> LongType, "name" -> StringType,
      "extra" -> DoubleType))
    assert(SchemaTracker.latest(Paths.get(loc)).map(_._1) === Some(1L))

    // the column disappearing again does NOT shrink the schema
    Files.delete(landing.resolve("b.json"))
    assert(SchemaTracker.resolve(spark, landing.toString, hints, loc) === v1)
    assert(SchemaTracker.latest(Paths.get(loc)).map(_._1) === Some(1L))

    VersionedTable.deleteRecursively(base)
  }

  test("empty landing dir resolves to the hints alone") {
    val base = Files.createTempDirectory("schema-empty")
    val landing = Files.createDirectories(base.resolve("landing"))
    val hints = struct("id" -> LongType, "ts" -> TimestampType)
    assert(SchemaTracker.resolve(spark, landing.toString, hints,
      base.resolve("schemas").toString) === hints)
    VersionedTable.deleteRecursively(base)
  }
}
