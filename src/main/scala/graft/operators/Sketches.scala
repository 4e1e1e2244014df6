package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Approximate, MERGEABLE aggregate sketches — the single-pass answer
  * to "how many distinct users / what's the p99" at 100 TB, where exact
  * distinct counting shuffles every key and exact percentiles sort the
  * world.
  *
  * The operative property is mergeability, not just approximation:
  * `hll_sketch_agg` (Apache DataSketches HLL, built into Spark 4)
  * produces a BINARY sketch per group that `hll_union_agg` combines
  * without leaving the HLL error envelope (register states may differ
  * from a one-shot sketch — sparse→dense promotion timing — but the
  * accuracy bound survives the merge, which is the property that
  * matters) — partial aggregation works map-side like any sum, daily
  * sketches roll up into monthly ones without rescanning history, and a
  * grand total falls out of the per-group sketches instead of a second
  * pass over the input. `q_hll_distinct` demonstrates exactly that
  * shape: one scan → per-group sketches → estimates, plus an ALL row
  * computed by unioning the group sketches.
  *
  * Estimates are deterministic (HLL register updates are
  * order-independent maxima, so cluster parallelism and row order don't
  * change the result) but engine-specific, so there is no DuckDB
  * oracle; the rows-only driver check is backed by SketchesSpec, which
  * pins the relative-error bound against exact counts, the lossless
  * union property, and `percentile_approx`'s rank-error bound.
  */
object Sketches extends QueryModule {
  import Tables._

  /** Distinct orderkeys per return flag via HLL sketches, with the
    * grand total unioned FROM the group sketches (no second scan). */
  private def qHllDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sketches = lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(hll_sketch_agg($"l_orderkey").as("sk"))
    val perGroup = sketches.select($"l_returnflag",
      hll_sketch_estimate($"sk").as("approx_distinct"))
    val total = sketches.agg(
      hll_sketch_estimate(hll_union_agg($"sk")).as("approx_distinct"))
      .select(lit("ALL").as("l_returnflag"), $"approx_distinct")
    perGroup.unionAll(total)
  }

  override def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q_hll_distinct" -> (qHllDistinct _))

  // Engine-specific sketch bytes → no cross-engine SQL oracle; the
  // driver records the weaker rows-only check and SketchesSpec carries
  // the correctness contract (error + union-losslessness bounds).
  override def oracles: Seq[(String, String)] = Seq.empty
}
