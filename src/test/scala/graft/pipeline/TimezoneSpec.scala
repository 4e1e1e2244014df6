package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DST edge cases for the F4 normalization `to_utc_timestamp(ts,
  * 'Europe/Paris')` (SURVEY §7.5 risk 4): the session runs in UTC and
  * source timestamps are timezone-naive local times, so the spring
  * gap (non-existent local times) and autumn overlap (ambiguous local
  * times) deserve pinned expectations — java.time resolves the gap by
  * shifting forward and the overlap by choosing the EARLIER offset. */
class TimezoneSpec extends SparkSpec {
  import spark.implicits._

  private def toUtc(local: String): String =
    Seq(local).toDF("ts")
      .select(to_utc_timestamp($"ts".cast("timestamp"), "Europe/Paris")
        .cast("string"))
      .as[String].head()

  test("normal winter and summer offsets") {
    assert(toUtc("2023-01-08 11:02:17") === "2023-01-08 10:02:17") // CET +1
    assert(toUtc("2023-07-08 11:02:17") === "2023-07-08 09:02:17") // CEST +2
  }

  test("spring-forward gap: non-existent local times shift forward") {
    // 02:00-03:00 on 2023-03-26 does not exist in Europe/Paris;
    // 02:30 resolves like 03:30 CEST -> 01:30 UTC
    assert(toUtc("2023-03-26 01:30:00") === "2023-03-26 00:30:00") // still CET
    assert(toUtc("2023-03-26 02:30:00") === "2023-03-26 01:30:00") // gap
    assert(toUtc("2023-03-26 03:30:00") === "2023-03-26 01:30:00") // CEST
  }

  test("fall-back overlap: ambiguous local times take the earlier offset") {
    // 02:00-03:00 on 2023-10-29 occurs twice; the first occurrence
    // (CEST, +2) wins
    assert(toUtc("2023-10-29 02:30:00") === "2023-10-29 00:30:00")
    assert(toUtc("2023-10-29 03:30:00") === "2023-10-29 02:30:00") // CET
  }
}
