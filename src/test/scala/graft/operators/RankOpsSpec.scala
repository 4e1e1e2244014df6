package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RankOps.withGlobalOrder must be BIT-IDENTICAL to the single-partition
  * global window it replaces, on data with heavy ties, negatives, skew,
  * and more buckets than rows — while planning no partition-less
  * WindowExec. */
class RankOpsSpec extends SparkSpec {
  import spark.implicits._

  // skewed, tie-heavy: values v = (i*i) % 97 (many collisions), ids unique
  private lazy val data = (1 to 5000)
    .map(i => ((i.toLong * i) % 97, i.toLong, (i % 13).toLong - 6))
    .toDF("v", "id", "x")

  private def naive(asc: Boolean) = {
    val o = if (asc) $"v".asc else $"v".desc
    val w = Window.orderBy(o, $"id".asc)
    data
      .withColumn("rk", rank().over(Window.orderBy(o)).cast("long"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cs", sum($"x".cast("long")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
  }

  private def dist(asc: Boolean, buckets: Int) =
    RankOps.withGlobalOrder(data, $"v", asc, Seq($"id"),
      rankCol = Some("rk"), rowNumCol = Some("rn"),
      runningSums = Seq(($"x", "cs")), countCol = Some("n"),
      buckets = buckets)

  private def check(asc: Boolean, buckets: Int): Unit = {
    val cols = Seq("v", "id", "x", "rk", "rn", "cs", "n").map(col)
    val a = naive(asc).select(cols: _*).orderBy($"rn").collect()
    val b = dist(asc, buckets).select(cols: _*).orderBy($"rn").collect()
    assert(a.length == 5000, s"naive row count ${a.length}")
    assert(b.length == a.length, s"dist row count ${b.length} != ${a.length}")
    a.toSeq.zip(b.toSeq).zipWithIndex.find { case ((x, y), _) => x != y }
      .foreach { case ((x, y), i) =>
        fail(s"asc=$asc buckets=$buckets first divergence at $i: " +
          s"naive=$x dist=$y")
      }
  }

  test("ascending, 8 buckets: rank/row_number/running-sum/count all exact") {
    check(asc = true, buckets = 8)
  }

  test("running MIN/MAX/AVG are bit-identical to the window forms") {
    for (asc <- Seq(true, false); buckets <- Seq(1, 8, 256)) {
      val o = if (asc) $"v".asc else $"v".desc
      val rows = Window.orderBy(o, $"id".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = data
        .withColumn("rn", row_number()
          .over(Window.orderBy(o, $"id".asc)).cast("long"))
        .withColumn("mn", min($"x".cast("long")).over(rows))
        .withColumn("mx", max($"x".cast("long")).over(rows))
        .withColumn("av", sum($"x".cast("long")).over(rows) /
          row_number().over(Window.orderBy(o, $"id".asc)).cast("double"))
        .select($"id", $"rn", $"mn", $"mx", $"av")
        .orderBy($"rn").collect()
      val got = RankOps.withGlobalOrder(data, $"v", asc, Seq($"id"),
          rowNumCol = Some("rn"),
          runningMins = Seq(($"x", "mn")),
          runningMaxs = Seq(($"x", "mx")),
          runningAvgs = Seq(($"x", "av")),
          buckets = buckets)
        .select($"id", $"rn", $"mn", $"mx", $"av")
        .orderBy($"rn").collect()
      assert(got.length == want.length)
      want.toSeq.zip(got.toSeq).zipWithIndex
        .find { case ((x, y), _) => x != y }
        .foreach { case ((x, y), i) =>
          fail(s"asc=$asc buckets=$buckets divergence at $i: " +
            s"window=$x dist=$y")
        }
    }
  }

  test("descending, 8 buckets") {
    check(asc = false, buckets = 8)
  }

  test("percent_rank and ntile are bit-identical to the window forms") {
    for (asc <- Seq(true, false); k <- Seq(1, 7, 10, 6000)) {
      val o = if (asc) $"v".asc else $"v".desc
      val want = data
        .withColumn("rn", row_number()
          .over(Window.orderBy(o, $"id".asc)).cast("long"))
        .withColumn("pr", percent_rank().over(Window.orderBy(o)))
        .withColumn("nt", ntile(k)
          .over(Window.orderBy(o, $"id".asc)).cast("long"))
        .select($"id", $"rn", $"pr", $"nt")
        .orderBy($"rn").collect()
      val got = RankOps.withGlobalOrder(data, $"v", asc, Seq($"id"),
          rowNumCol = Some("rn"),
          percentRankCol = Some("pr"), ntile = Some((k, "nt")),
          buckets = 8)
        .select($"id", $"rn", $"pr", $"nt")
        .orderBy($"rn").collect()
      assert(got.length == want.length)
      want.toSeq.zip(got.toSeq).zipWithIndex
        .find { case ((x, y), _) => x != y }
        .foreach { case ((x, y), i) =>
          fail(s"asc=$asc k=$k divergence at $i: window=$x dist=$y")
        }
    }
    // single-row relation: percent_rank is 0.0 by definition
    val one = RankOps.withGlobalOrder(data.limit(1), $"v", ascending = true,
      Seq($"id"), percentRankCol = Some("pr"), buckets = 4)
      .select($"pr").collect()
    assert(one.length == 1 && one.head.getDouble(0) == 0.0)
  }

  test("more buckets than distinct values (97 values, 256 buckets)") {
    check(asc = true, buckets = 256)
  }

  test("single bucket degenerates gracefully") {
    check(asc = true, buckets = 1)
  }

  test("constant key: every row ties at rank 1, order falls to tiebreaks") {
    val const = data.withColumn("v", lit(7L))
    val out = RankOps.withGlobalOrder(const, $"v", ascending = true,
      Seq($"id"), rankCol = Some("rk"), rowNumCol = Some("rn"),
      countCol = Some("n"), buckets = 8)
    val rows = out.select($"id", $"rk", $"rn", $"n").orderBy($"rn").collect()
    assert(rows.length == 5000)
    assert(rows.forall(r => r.getLong(1) == 1L && r.getLong(3) == 5000L))
    // row_number follows the id tiebreak exactly
    assert(rows.map(_.getLong(0)).toSeq == (1L to 5000L))
    assert(rows.map(_.getLong(2)).toSeq == (1L to 5000L))
  }

  test("staged() cache keys on (label, sfDir): different dirs never collide") {
    val a = Seq((1L, "a")).toDF("k", "tag")
    val b = Seq((2L, "b"), (3L, "b")).toDF("k", "tag")
    val ra = RankOps.staged(a, "spec-cache", "dirA")
    val rb = RankOps.staged(b, "spec-cache", "dirB")
    assert(ra.count() == 1 && rb.count() == 2)
    // repeat call with the same key reuses the materialization (same
    // content, no re-write of a fresh scratch dir)
    val ra2 = RankOps.staged(a, "spec-cache", "dirA")
    assert(ra2.inputFiles.toSeq == ra.inputFiles.toSeq)
  }

  test("empty input yields empty output with the requested schema") {
    val out = RankOps.withGlobalOrder(data.filter($"v" < -1), $"v", true,
      Seq($"id"), rankCol = Some("rk"), rowNumCol = Some("rn"),
      runningSums = Seq(($"x", "cs")), countCol = Some("n"))
    assert(out.count() == 0)
    assert(out.columns.toSeq ==
      Seq("v", "id", "x", "rk", "rn", "cs", "n"))
  }

  test("topK matches orderBy+limit exactly, including NULL keys both directions") {
    // null score rows: asc = nulls FIRST, desc = nulls LAST — the
    // comparator must mirror the orderBy that selected the K rows
    // (ADVICE r10: explicit IS NULL arms), or the selected set and its
    // attached ranks disagree
    val rows = (1 to 200).map { i =>
      (if (i % 7 == 0) None else Some((i * 31 % 23).toLong), i.toLong, i % 5L)
    }.toDF("score", "id", "w")
    for (asc <- Seq(true, false)) {
      val order =
        if (asc) Seq($"score".asc, $"id".asc) else Seq($"score".desc, $"id".asc)
      val want = rows.orderBy(order: _*).limit(25)
        .collect().map(r => (r.get(0), r.getLong(1))).toSeq
      val got = RankOps.topK(rows, 25,
          Seq(("score", asc), ("id", true)), rankName = "rnk",
          runningSums = Seq(("w", "cum_w")))
        .orderBy($"rnk")
        .collect().map(r => (r.get(r.fieldIndex("score")),
          r.getLong(r.fieldIndex("id")))).toSeq
      assert(got == want, s"asc=$asc: topK order diverges from orderBy+limit")
    }
    // running sum over the sorted top-K is the inclusive prefix sum
    val out = RankOps.topK(rows, 10, Seq(("id", true)), "rnk",
      runningSums = Seq(("w", "cum_w")))
      .orderBy($"rnk").select($"w", $"cum_w").collect()
    val prefix = out.map(_.getLong(0)).scanLeft(0L)(_ + _).tail
    assert(out.map(_.getLong(1)).toSeq == prefix.toSeq)
  }

  test("topK backtick-quotes non-identifier column names in its comparator") {
    val df = Seq((3L, 1L), (1L, 2L), (2L, 3L)).toDF("score col", "id")
    val out = RankOps.topK(df, 2, Seq(("score col", false), ("id", true)), "rnk")
      .orderBy($"rnk").select(col("`score col`"), $"id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((3L, 1L), (2L, 3L)))
  }

  test("plan has no partition-less WindowExec; side branches stay tiny") {
    val p = dist(asc = true, buckets = 8)
      .queryExecution.executedPlan.toString
    // every Window node must partition on the bucket column
    val windowLines = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windowLines.nonEmpty)
    assert(windowLines.forall(_.contains("[__rk_bucket")),
      s"window must be bucket-partitioned:\n$p")
    // exactly two bucket-hash exchanges: the window's (the single
    // relation-scale shuffle) and the stats branch's — the latter above
    // a map-side partial aggregate, so it moves #buckets rows per input
    // partition, not the relation
    val hashEx = p.linesIterator
      .count(_.contains("Exchange hashpartitioning(__rk_bucket"))
    assert(hashEx == 2, s"expected 2 bucket exchanges, got $hashEx:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"stats branch must partial-aggregate before its shuffle:\n$p")
    // bounds and stats reach rows via broadcast, never a sort-merge join
    assert(!p.contains("SortMergeJoin"), s"no relation-scale join:\n$p")
  }
}
