package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Every registered query must run and return rows at the smallest
  * scale factor — the same invariant the driver's smoke check applies
  * to `entry`, extended to the full surface. */
class AllQueriesSmokeSpec extends SparkSpec {
  test("every SparkEntry query returns rows at sf0.001") {
    for ((name, fn) <- SparkEntry.queries) {
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows at sf0.001")
    }
  }

  test("the flagship entry point returns rows (the driver's smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
