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
  * change the result) but engine-specific, so the sketch bytes and raw
  * estimates cannot be hashed cross-engine. The driver gate instead
  * verifies the accuracy CONTRACT quantitatively: the query emits the
  * exact distinct count beside a `within_2pct` flag derived from the
  * sketch, and the DuckDB oracle computes the same exact count with
  * `within_2pct = TRUE` — a sketch outside its error envelope (or a
  * lossy union) flips the flag and fails the hash. SketchesSpec
  * additionally pins the raw estimates, the lossless union property,
  * and `percentile_approx`'s rank-error bound. The exact counts here
  * exist only to power the gate; production callers use
  * [[hllEstimates]], which is the one-scan sketch-only path.
  */
object Sketches extends QueryModule {
  import Tables._

  /** Per-returnflag HLL sketches + estimates, with the grand total
    * unioned FROM the group sketches (no second scan). The production
    * shape: one pass, mergeable partials, ALL row from sketch union. */
  def hllEstimates(s: SparkSession, d: String): DataFrame = {
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

  /** Driver-gate variant: joins the sketch estimates with exact
    * distinct counts and reduces the engine-specific estimate to a
    * cross-engine-hashable accuracy verdict. An order's lineitems can
    * carry different return flags, so the ALL exact count is its own
    * aggregation, not a sum of the groups — same as the oracle's. */
  private def qHllDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val exactGroups = lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("exact_distinct"))
    val exactAll = lineitem(s, d)
      .agg(countDistinct($"l_orderkey").as("exact_distinct"))
      .select(lit("ALL").as("l_returnflag"), $"exact_distinct")
    hllEstimates(s, d)
      .join(exactGroups.unionAll(exactAll), Seq("l_returnflag"))
      .select($"l_returnflag", $"exact_distinct",
        (abs($"approx_distinct" - $"exact_distinct") <=
          $"exact_distinct" * 0.02).as("within_2pct"))
  }

  private val qHllDistinctSql =
    """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_distinct,
      |       TRUE AS within_2pct
      |FROM lineitem GROUP BY l_returnflag
      |UNION ALL
      |SELECT 'ALL', count(DISTINCT l_orderkey), TRUE FROM lineitem""".stripMargin

  override def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q_hll_distinct" -> (qHllDistinct _))

  override def oracles: Seq[(String, String)] = Seq(
    "q_hll_distinct" -> qHllDistinctSql)
}
