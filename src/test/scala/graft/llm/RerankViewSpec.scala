package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.VersionedTable

/** The [[RerankView]] maintenance contract: after ANY refresh, the
  * readout equals the declarative per-standing-query rerank top-K over
  * the corpus snapshot — through pure insert folds, slack-funded
  * deletes, per-query re-scores, and idempotent refresh. Synthetic
  * corpus (deterministic embeddings + shingle texts) so score order is
  * fully controlled and both fold and derive paths are forced. */
class RerankViewSpec extends SparkSpec {
  import RerankViewOps.{build, srcSchema, CAND, K}

  private def mkSource(name: String): VersionedTable =
    VersionedTable.create(spark,
      graft.Scratch.dir(name).resolve("t").toString,
      srcSchema, Map(VersionedTable.PROP_CDF -> "true"))

  /** Deterministic unit-ish embedding: direction angle keyed by id. */
  private def vec(seed: Long): Seq[Float] = {
    val a = (seed % 17).toDouble / 17.0 * math.Pi
    Seq(math.cos(a).toFloat, math.sin(a).toFloat,
      ((seed % 5) + 1).toFloat / 5f, 1f)
  }

  private def shingleText(seed: Long): Seq[String] =
    Seq(s"w${seed % 7} w${(seed + 1) % 7} w${(seed + 2) % 7}",
      s"w${(seed + 1) % 7} w${(seed + 2) % 7} w${(seed + 3) % 7}")

  private def docRows(ids: Seq[Long]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        ids.map(i => org.apache.spark.sql.Row(i, vec(i), shingleText(i))), 2),
      srcSchema)

  private def queryDf(qids: Seq[Long]): DataFrame =
    docRows(qids).select(col("doc_id").as("q_id"),
      col("ce").as("qe"), col("cs").as("qs"))

  /** Declarative recompute straight off the source snapshot. */
  private def expected(src: VersionedTable, q: DataFrame)
      : Seq[(Long, Long, Long, Double)] = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("rerank").desc, col("doc_id").asc)
    RerankViewOps.scorePairs(src.snapshot(), q)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= K)
      .select(col("q_id"), col("doc_id"), col("rnk"),
        round(col("rerank"), 6).as("rerank"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._3))
  }

  private def got(v: RerankView): Seq[(Long, Long, Long, Double)] =
    v.topk().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._3))

  graft.functions.GraftFunctions.register(spark)

  test("insert fold matches declarative recompute, no re-score, bounded state") {
    val src = mkSource("rrv-ins")
    val q = queryDf(Seq(1000L, 1001L))
    src.append(docRows(8L to 40L))
    val v = build(src, graft.Scratch.dir("rrv-ins-v").toString, q)
    assert(got(v) === expected(src, q))
    src.append(docRows(41L to 80L))
    v.refresh(src, q)
    assert(v.lastDerived === 0, "pure inserts must never re-score the corpus")
    assert(got(v) === expected(src, q))
    val sizes = v.state.snapshot().groupBy("q_id").count().collect()
    sizes.foreach(r => assert(r.getLong(1) <= CAND))
  }

  test("deletes spend slack; slack exhaustion re-scores only the hit queries") {
    val src = mkSource("rrv-del")
    val q = queryDf(Seq(1000L, 1001L))
    src.append(docRows(8L to 60L))
    val v = build(src, graft.Scratch.dir("rrv-del-v").toString, q)
    // delete ONE buffered doc of q 1000: slack absorbs it, no re-score
    val top1000 = v.state.snapshot().filter(col("q_id") === 1000L)
      .orderBy(col("rerank").desc).limit(1).collect()(0).getLong(1)
    src.deleteWhere(col("doc_id") === top1000)
    v.refresh(src, q)
    assert(v.lastDerived === 0, "one buffered delete must fold via slack")
    assert(got(v) === expected(src, q))
    // now delete enough buffered docs to exhaust slack -> derive path
    val buffered = v.state.snapshot().filter(col("q_id") === 1000L)
      .orderBy(col("rerank").desc).limit(K).collect().map(_.getLong(1))
    src.deleteWhere(col("doc_id").isin(buffered.toIndexedSeq: _*))
    v.refresh(src, q)
    assert(v.lastDerived >= 1, "slack exhaustion must re-score the hit query")
    assert(got(v) === expected(src, q))
  }

  test("mixed churn converges and refresh is idempotent") {
    val src = mkSource("rrv-mix")
    val q = queryDf(Seq(1000L, 1001L, 1002L))
    src.append(docRows(8L to 30L))
    val v = build(src, graft.Scratch.dir("rrv-mix-v").toString, q)
    src.append(docRows(31L to 55L))
    src.deleteWhere(col("doc_id") % 3 === 0)
    v.refresh(src, q)
    assert(got(v) === expected(src, q))
    val before = got(v)
    assert(v.refresh(src, q) === None, "no new source version -> no-op")
    assert(got(v) === before)
  }

  test("sub-buffer clones never perturb the readout (the steady-state staging contract)") {
    val src = mkSource("rrv-clone")
    val q = queryDf(Seq(1000L))
    src.append(docRows(8L to 60L))
    val v = build(src, graft.Scratch.dir("rrv-clone-v").toString, q)
    val base = got(v)
    // the q_rerank_refresh filler construction: a doc ranked past CAND
    // for every query, cloned with larger ids (score ties rank after)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("rerank").desc, col("doc_id").asc)
    val fillerId = RerankViewOps.scorePairs(src.snapshot(), q)
      .withColumn("rnk", row_number().over(w))
      .groupBy(col("doc_id")).agg(min(col("rnk")).as("mn"))
      .filter(col("mn") > CAND)
      .agg(max(col("doc_id"))).collect()(0).getLong(0)
    val clones = src.snapshot().filter(col("doc_id") === fillerId)
      .crossJoin(spark.range(32).select((col("id") + 100000000L).as("nid")))
      .select(col("nid").as("doc_id"), col("ce"), col("cs"))
    src.append(clones)
    v.refresh(src, q)
    assert(v.lastDerived === 0)
    assert(got(v) === base, "clones of a sub-buffer doc must be invisible")
    assert(got(v) === expected(src, q))
  }
}
