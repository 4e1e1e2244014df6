package graft
import org.apache.spark.sql.SparkSession

/** Round benchmark: runs every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line the driver records as
  * `BENCH_r{N}.json`.
  *
  * Harness design (VERDICT r1 findings 2-3, r3 finding 1):
  *   - execution is forced through the `noop` sink, which fully evaluates
  *     every projected column — `count()` lets Catalyst prune unreferenced
  *     projections, so md5/timestamp work was never measured in r1;
  *   - a full untimed warmup pass first, so no single query pays JVM /
  *     codegen / parquet-footer warmup inside its timing;
  *   - PASSES timed passes per query, reported as the per-query MEDIAN
  *     with the raw per-pass values kept in a `"passes"` field — a single
  *     noisy pass under external machine load can no longer become the
  *     round's number (the recorded BENCH_r03 overstated runtime 1.6×
  *     exactly this way). Passes are pass-major (all queries, then
  *     repeat) so a transient load spike lands in at most one pass of
  *     each query and the median discards it;
  *   - failures are reported per-query in an `"errors"` field instead of
  *     being swallowed into a fast-looking timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(name: String): Option[String] =
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        None
      } catch { case e: Throwable =>
        Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }

    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(force) // warmup, untimed

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // pass-major: [pass][query] timings
    val perPass: Seq[Seq[(String, Double)]] = (1 to passes).map { _ =>
      names.map { name =>
        val t0 = System.nanoTime()
        force(name).foreach(errors(name) = _)
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val byQuery: Seq[(String, Seq[Double])] =
      names.map(n => n -> perPass.map(_.toMap.apply(n)))
    val medians = byQuery.map { case (n, xs) => n -> median(xs) }

    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    def fmt(v: Double) = f"$v%.4f"
    val qs = medians.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val passJson = byQuery.map { case (k, xs) =>
      "\"" + k + "\":" + xs.map(fmt).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val total = medians.map(_._2).sum
    val passTotals = perPass.map(p => p.map(_._2).sum)
    val spreadPct = // max deviation of a pass total from the median total
      if (passTotals.isEmpty) 0.0
      else 100.0 * passTotals.map(t => math.abs(t - median(passTotals))).max /
        median(passTotals)
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"passes":$passJson,"pass_totals":${passTotals.map(fmt).mkString("[", ",", "]")},"spread_pct":${fmt(spreadPct)},"n_passes":$passes,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
