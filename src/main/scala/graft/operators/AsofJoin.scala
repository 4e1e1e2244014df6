package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the single latest right
  * row of the same key with `rightTime <= leftTime` (the
  * feature-lookup / point-in-time-correctness join; DuckDB/kdb call it
  * ASOF JOIN, Pandas `merge_asof`). Spark has no built-in operator; the
  * naive formulation (equi-join on key + time filter + row_number)
  * explodes every key into |left|×|right| intermediate pairs.
  *
  * == The union+window plan ==
  * This implementation never builds a pair: both sides are UNIONED into
  * one relation tagged by side, partitioned ONCE by key, and sorted by
  * `(time, side)` within partitions; a running `last(ignoreNulls)`
  * window then carries the latest right payload forward onto each left
  * row (right sorts before left at equal times, so the match is
  * inclusive). The right payload travels as ONE struct, so a right row
  * whose payload columns contain legitimate NULLs is still carried
  * atomically — a per-column `last` would resurrect older values.
  *
  * == 100 TB design ==
  * Cost is one hash shuffle + one sort of |left| + |right| rows — the
  * same bound as a shuffled equi-join, with NO pair blow-up for hot
  * keys (a key with L lefts and R rights costs L + R, not L×R). AQE
  * sees an ordinary Exchange. The plan contains no Join node at all
  * (AsofJoinSpec pins that). Skew follows key volume exactly like any
  * keyed window — salt-and-merge applies if one key dominates.
  *
  * Semantics notes: keys join null-UNSAFE like SQL equality (null-key
  * right rows are dropped up front; null-key left rows match nothing);
  * right rows should be unique per `(keys, rightTime)` — collapse ties
  * upstream (e.g. `groupBy(keys, time).agg(...)`) for deterministic
  * output, otherwise the carried row among equal-time rights is
  * tie-broken arbitrarily. */
object AsofJoin {

  /** @param payload right columns carried onto each matched left row,
    *                emitted as `prefix + name` (plus `prefix + "time"`,
    *                the matched right timestamp); all NULL when the key
    *                has no right row at or before the left time.
    * @param toleranceUs when set, a match older than `leftTime −
    *                toleranceUs` is discarded (pandas `merge_asof
    *                tolerance`): the carried struct is nulled AFTER the
    *                window, so staleness filtering costs one codegen'd
    *                comparison, not a different plan. */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      prefix: String = "asof_",
      toleranceUs: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    val lCols = left.columns.toSeq.filterNot(keys.contains)
    val rStruct = struct(
      (col(rightTime).cast("timestamp").as("__rt") +: payload.map(col)): _*)
    val rPart = right
      .filter(keys.map(k => col(k).isNotNull).reduce(_ && _))
      .select(keys.map(col) :+
        col(rightTime).cast("timestamp").as("__t") :+
        lit(0).as("__side") :+
        rStruct.as("__r"): _*)
    val rType = rPart.schema("__r").dataType
    val lPart = left.select(keys.map(col) ++
      Seq(col(leftTime).cast("timestamp").as("__t"), lit(1).as("__side"),
        lit(null).cast(rType).as("__r")) ++
      lCols.map(c => col(c).as(s"__l_$c")): _*)
    // unionByName(allowMissing): right side lacks the left payload cols
    val u = lPart.unionByName(rPart, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u.withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    val fresh = toleranceUs.fold(carried)(tol =>
      carried.withColumn("__r",
        when(col("__r.__rt") >= col("__t") - expr(s"INTERVAL $tol MICROSECOND"),
          col("__r"))))
    fresh
      .filter(col("__side") === 1)
      .select(keys.map(col) ++
        lCols.map(c => col(s"__l_$c").as(c)) ++
        (col("__r.__rt").as(s"${prefix}time") +:
          payload.map(c => col(s"__r.$c").as(s"$prefix$c"))): _*)
  }

  /** Convenience overload: both sides share the time column name. */
  def asof(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      time: String, payload: Seq[String]): DataFrame =
    asof(left, right, keys, time, time, payload)

  // naive reference implementation, used by AsofJoinSpec only
  private[graft] def asofNaive(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val r = right.select(keys.map(col) :+
      col(rightTime).cast("timestamp").as("__rt") :+
      struct(payload.map(col): _*).as("__rp"): _*)
    val joined = left.join(r,
      keys.map(k => left(k) === r(k)).reduce(_ && _) &&
        r("__rt") <= left(leftTime).cast("timestamp"), "left")
    val w = Window.partitionBy(left.columns.map(left(_)): _*)
      .orderBy(col("__rt").desc_nulls_last)
    joined.withColumn("__rnk", row_number().over(w)).filter(col("__rnk") === 1)
      .select(left.columns.map(left(_)) ++
        (col("__rt").as(s"${prefix}time") +:
          payload.map(c => col(s"__rp.$c").as(s"$prefix$c"))): _*)
  }
}
