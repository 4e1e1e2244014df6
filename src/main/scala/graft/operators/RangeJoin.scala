package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band (equi + bounded-distance) join — pairs of rows sharing `keys`
  * whose event times differ by at most `tolUs`. Spark plans the naive
  * formulation (`a.key = b.key AND abs(a.t - b.t) <= tol`) as an
  * equi-join whose per-key output is all pairs filtered afterwards —
  * fine — but with NO equality key at all, or one hot key, it degrades
  * to a nested-loop/cartesian explosion.
  *
  * == The bucket trick ==
  * Time is quantized into buckets of width `tolUs`. A RIGHT row lives
  * in exactly one bucket; a LEFT row within `tolUs` of it must sit in
  * that bucket or an adjacent one, so the left side explodes ×3 into
  * its candidate buckets and the join becomes a plain shuffled
  * EQUI-join on `(keys…, bucket)`, with the exact |Δt| ≤ tol predicate
  * verifying candidates. Every qualifying pair is produced EXACTLY once
  * (the right row has one bucket; at most one of the left's three
  * candidates equals it) — no dedup step.
  *
  * == 100 TB design ==
  * Shuffle volume is 3|L| + |R| rows keyed by `(keys, bucket)` — the
  * bucket term spreads a hot key's rows across time, so a key skewed in
  * volume but spread in time no longer lands in one partition (the same
  * reason Flink/interval-join implementations bucket by time). Work is
  * proportional to genuinely-close candidate pairs, never all pairs of
  * a key. The plan is an ordinary shuffled equi-join — AQE-friendly,
  * broadcast-eligible when one side is small (RangeJoinSpec pins "no
  * cartesian/nested-loop"). */
object RangeJoin {

  /** Inner band join. Column names of `left` and `right` (beyond
    * `keys`) must be disjoint; both time columns must be castable to
    * timestamp. Returns `keys ++ left-others ++ right-others`. */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      tolUs: Long): DataFrame = {
    require(tolUs > 0, "tolerance must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"non-key columns must be disjoint, both sides have: ${overlap.mkString(", ")}")
    val lt = unix_micros(col(leftTime).cast("timestamp"))
    val rt = unix_micros(col(rightTime).cast("timestamp"))
    val lb = left.withColumn("__lt", lt)
      .withColumn("__band", explode(array((-1 to 1).map(i =>
        floor(col("__lt") / tolUs) + i): _*)))
    val rb = right.withColumn("__rt", rt)
      .withColumn("__band", floor(col("__rt") / tolUs))
    lb.join(rb, (keys :+ "__band").toIndexedSeq)
      .filter(abs(col("__lt") - col("__rt")) <= tolUs)
      .drop("__band", "__lt", "__rt")
  }
}
