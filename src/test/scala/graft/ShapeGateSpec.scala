package graft

import graft.catalog.PlanShape

/** The surface-wide 100 TB plan-risk CI gate (VERDICT r10 #2): every
  * batch query in `SparkEntry.queries` is compiled (never executed)
  * through the SAME audit `DESCRIBE SHAPE` serves ([[PlanShape]]), and
  * its plan must produce ZERO `risk` rows — no partition-less window
  * (single-task sort of the whole relation), no cartesian product —
  * unless the query is on the short, documented exemption list below.
  *
  * The exemption list is SELF-PRUNING: an exempted query that stops
  * producing its risk row fails the suite too, so the list can only
  * shrink as rows are fixed, never silently rot.
  */
class ShapeGateSpec extends SparkSpec {

  /** Queries ALLOWED to plan a partition-less window, each with the
    * reason single-partition is the CORRECT plan there at any corpus
    * scale: the window input is bounded by construction (post-
    * aggregation keyspace, sketch depth, day span), so one task sees a
    * small constant-ish relation, and distributing it would add a
    * shuffle for nothing. Verified by inspection round 10 (VERDICT
    * plan audit) and pinned here by name.
    */
  private val windowExempt: Map[String, String] = Map(
    "q_survival_hazard" -> ("cum-hazard over |distinct user lifetimes| " +
      "rows — bounded by the day span of the corpus, not its size"),
    "q_new_returning" -> ("cumulative users over the per-DAY growth " +
      "table — bounded by the day span"),
    "q_curriculum_order" -> ("offset table over (stage, shard) groups — " +
      "bounded by the fixed shard count, rows stream via partitioned " +
      "windows"))

  test("every batch query plans ZERO unexempted risk rows") {
    val failures = Seq.newBuilder[String]
    val sawRisk = scala.collection.mutable.Set[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      SparkEntry.prepares.get(name).foreach(_(spark, sf))
      val risks =
        try PlanShape.ofDf(spark, fn(spark, sf))
          .filter(_.getString(0) == "risk")
        catch { case e: Throwable =>
          failures += s"$name: audit threw ${e.getMessage}"; Nil
        }
      if (risks.nonEmpty) {
        sawRisk += name
        if (!windowExempt.contains(name))
          failures += s"$name: " + risks.map(r =>
            s"${r.getString(1)} x${r.getLong(2)} (${r.getString(3)})")
            .mkString("; ")
        else if (risks.exists(_.getString(1) != "partition-less window"))
          failures += s"$name: exemption covers partition-less windows " +
            "only, but plan has: " + risks.map(_.getString(1)).mkString(", ")
      }
    }
    // self-pruning: a fixed row must leave the exemption list
    for (name <- windowExempt.keys if !sawRisk(name))
      failures += s"$name: exempted but plans no risk row any more — " +
        "remove it from the exemption list"
    assert(failures.result().isEmpty,
      "surface risk gate:\n  " + failures.result().mkString("\n  "))
  }

  // --- the broadcast-keyed-window risk row (VERDICT r12 #2) ---------
  // The partition-less check's blind spot: a window partitioned on a
  // bounded-low-cardinality (broadcast-origin) key over an unbounded
  // scan-fed relation is exactly as bad — the whole corpus fully
  // sorted into a handful of groups. These fixtures pin the detector
  // on the three shapes that matter: the deliberately-unfiltered
  // per-query ranking (the r12 RRF-leg bug shape) must flag; the same
  // ranking with a literal rank cap (WindowGroupLimit fires) must
  // pass; and a broadcast-side PAYLOAD column equi-joined through a
  // distinct stream key (the q_dedup_keep_best shape — bounded by the
  // broadcast relation) must NOT flag.

  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.expressions.Window

  private def bcastRiskRows(df: => org.apache.spark.sql.DataFrame) =
    PlanShape.ofDf(spark, df).filter(r => r.getString(0) == "risk" &&
      r.getString(1) == "unbounded window on broadcast-origin key")

  test("unfiltered ranking on a broadcast-origin key FLAGS") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val seeds = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"))
    val ranked = emb.select(col("vec_id").as("doc_id"))
      .crossJoin(broadcast(seeds))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("doc_id"))))
    assert(bcastRiskRows(ranked).nonEmpty,
      "the unfiltered per-query ranking (the r12 RRF-leg shape) " +
        "must produce the risk row")
  }

  test("the same ranking with a rank-limit cap passes") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val seeds = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"))
    val capped = emb.select(col("vec_id").as("doc_id"))
      .crossJoin(broadcast(seeds))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("doc_id"))))
      .filter(col("rn") <= 100)
    assert(bcastRiskRows(capped).isEmpty,
      "a rank-capped ranking plans WindowGroupLimit and must pass")
  }

  test("unfiltered ranking on the STREAM-side key of an inner " +
      "broadcast hash join FLAGS") {
    // ADVICE r13: stream.join(broadcast(q), Seq(key)) — a USING-join
    // keeps the STREAM-side key attribute, whose exprId differs from
    // the build side's, but after an inner join its post-join
    // cardinality is bounded by the broadcast relation all the same.
    // This is the common retrieval shape (corpus keyed into a small
    // standing-query set); the detector must flag it via the
    // stream-side equi-key, not just the BNLJ/build-side paths.
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val seeds = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"))
    val ranked = emb
      .select((col("vec_id") % 8).as("q_id"), col("vec_id").as("doc_id"))
      .join(broadcast(seeds), Seq("q_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("doc_id"))))
    assert(bcastRiskRows(ranked).nonEmpty,
      "the unbounded window on the stream-side equi-key of an inner " +
        "broadcast hash join must produce the risk row")
  }

  test("the same BHJ-keyed ranking with a rank-limit cap passes") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val seeds = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"))
    val capped = emb
      .select((col("vec_id") % 8).as("q_id"), col("vec_id").as("doc_id"))
      .join(broadcast(seeds), Seq("q_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("doc_id"))))
      .filter(col("rn") <= 100)
    assert(bcastRiskRows(capped).isEmpty,
      "a rank-capped BHJ-keyed ranking plans WindowGroupLimit and " +
        "must pass")
  }

  test("broadcast payload key through a distinct equi-join does not flag") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // tiny label table: broadcast side, window key is its PAYLOAD
    // column, joined 1:1 on the stream side's distinct vec_id — the
    // window input is bounded by the broadcast relation, not the scan
    val labels = emb.filter(col("vec_id") < 32)
      .select(col("vec_id"), (col("vec_id") % 4).as("cluster_id"))
    val joined = emb.select(col("vec_id"), col("label"))
      .join(broadcast(labels.select(col("vec_id"), col("cluster_id"))),
        "vec_id")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("cluster_id")).orderBy(col("vec_id"))))
    assert(bcastRiskRows(joined).isEmpty,
      "the q_dedup_keep_best shape is bounded and must not flag")
  }
}
