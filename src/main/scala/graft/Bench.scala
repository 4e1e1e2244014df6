package graft
import org.apache.spark.sql.SparkSession

/** Round benchmark: runs every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line the driver records as
  * `BENCH_r{N}.json`.
  *
  * Harness design (VERDICT r1 findings 2-3):
  *   - execution is forced through the `noop` sink, which fully evaluates
  *     every projected column — `count()` lets Catalyst prune unreferenced
  *     projections, so md5/timestamp work was never measured in r1;
  *   - a full untimed warmup pass first, so no single query pays JVM /
  *     codegen / parquet-footer warmup inside its timing;
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

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(force) // warmup, untimed

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = names.map { name =>
      val t0 = System.nanoTime()
      force(name).foreach(errors(name) = _)
      name -> (System.nanoTime() - t0) / 1e9
    }

    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
