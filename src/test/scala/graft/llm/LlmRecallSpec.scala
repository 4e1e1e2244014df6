package graft.llm

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Measured ANN quality for the banded cosine LSH (VERDICT r2 #2):
  * with planted neighbors at cosine 0.8, banding (12 bands × 6 bits)
  * must retrieve ≥ 0.9 of what brute force finds — the single-signature
  * scheme it replaced sat at ~0.25 recall on the same geometry. */
class LlmRecallSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 64

  private lazy val planted: org.apache.spark.sql.DataFrame = {
    val rng = new Random(42)
    def unit(): Array[Double] = {
      val v = Array.fill(dims)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val queries = (0 until 100).map(i => (i.toLong, unit()))
    // neighbor at cosine EXACTLY 0.8: 0.8·q + 0.6·u with u ⟂ q, both unit
    val neighbors = queries.map { case (qid, q) =>
      val raw = unit()
      val proj = (0 until dims).map(i => raw(i) * q(i)).sum
      val orth = Array.tabulate(dims)(i => raw(i) - proj * q(i))
      val on = math.sqrt(orth.map(x => x * x).sum)
      (1000L + qid, Array.tabulate(dims)(i => 0.8 * q(i) + 0.6 * orth(i) / on))
    }
    val noise = (0 until 2000).map(i => (10000L + i.toLong, unit()))
    (queries ++ neighbors ++ noise)
      .map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
  }

  private def recallOf(res: Array[(Long, Long)], nQ: Int): Double = {
    val found = res.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    (0 until nQ).count(i =>
      found.getOrElse(i.toLong, Set.empty).contains(1000L + i)).toDouble / nQ
  }

  test("SQ8 top-k recovers >= 0.8 of exact brute-force top-k") {
    // 8-bit scalar quantization perturbs each dimension by at most half
    // a bucket; on the shared embeddings table its top-5 must agree
    // with full-precision brute force for the large majority of slots
    def slots(name: String): Set[(Long, Long)] =
      graft.SparkEntry.queries(name)(spark, sf)
        .select(col("q_id"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = slots("q_topk_cosine")
    val sq = slots("q_sq8_cosine")
    val recall = (exact intersect sq).size.toDouble / exact.size
    assert(recall >= 0.8, f"SQ8 slot recall $recall%.2f < 0.8")
  }

  test("PQ shortlist + exact rerank recovers >= 0.9 of exact top-k") {
    // raw 4-byte ADC scores land only ~0.3 of exact top-5 slots
    // (measured) — the deployed two-stage shape (ADC shortlist of 50,
    // exact rerank) must recover nearly all of them while reading raw
    // vectors for shortlist members only
    def slots(name: String): Set[(Long, Long)] =
      graft.SparkEntry.queries(name)(spark, sf)
        .select(col("q_id"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = slots("q_topk_cosine")
    val pq = slots("q_pq_cosine")
    val recall = (exact intersect pq).size.toDouble / exact.size
    info(f"PQ+rerank slot recall: $recall%.2f")
    assert(recall >= 0.9, f"PQ+rerank slot recall $recall%.2f < 0.9")
  }

  test("banded LSH recall >= 0.9 of brute-force top-k on planted cos-0.8 neighbors") {
    graft.functions.GraftFunctions.register(spark)
    val nQ = 100
    val emb = planted

    // ground truth: brute force ranks every planted neighbor first
    // (noise cosines concentrate near 0 ± 1/√dims; 0.8 is far outside)
    val q = emb.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val c = emb.filter(col("vec_id") >= nQ)
      .select(col("vec_id"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc_nulls_last)
    val brute = c.crossJoin(broadcast(q))
      .withColumn("cos", expr("cosine_sim(qe, ce)"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toMap
    assert((0 until nQ).forall(i => brute(i.toLong) === 1000L + i),
      "test geometry broken: planted neighbor is not the brute-force top-1")

    val res = SimilarityOps.lshTopK(emb, col("vec_id") < nQ, 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
    val recall = recallOf(res, nQ)
    info(f"banded LSH recall@5 on planted cos-0.8 neighbors: $recall%.2f")
    assert(recall >= 0.9, s"LSH recall $recall < 0.9 — banding insufficient")
  }

  test("IVFPQ index recall >= 0.85 on planted cos-0.8 neighbors with the " +
      "ADC stage genuinely filtering") {
    // At this geometry (2100-vector corpus, ~46 adaptive cells, ~12
    // probes) each query's probed-cell candidate set is ~550 rows —
    // WELL past PQ_SHORTLIST=150 — so the 4-byte ADC stage must rank
    // the planted neighbor into the shortlist for the exact rerank to
    // recover it. This is the composition's quality gate: IVF recall
    // alone measures cell coverage, PQ recall alone measures ADC
    // fidelity at full candidacy; this measures both stages chained.
    graft.functions.GraftFunctions.register(spark)
    val base = java.nio.file.Files.createTempDirectory("ivfpq-recall")
    val srcSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    val src = graft.table.VersionedTable.create(spark,
      s"$base/src", srcSchema,
      Map(graft.table.VersionedTable.PROP_CDF -> "true"))
    val nQ = 100
    src.append(planted.filter(col("vec_id") >= nQ))
    val idx = IvfPqIndex.build(src, s"$base/idx")
    // sanity: the ADC stage actually filters at this geometry
    val cells = idx.ivfCodebook.count()
    val np = SimilarityOps.adaptiveNprobe(cells)
    val perCell = (2100.0 / cells) * np
    assert(perCell > SimilarityOps.PQ_SHORTLIST,
      f"geometry must exceed the shortlist to exercise ADC ($perCell%.0f)")
    val res = idx.search(
        planted.filter(col("vec_id") < nQ)
          .select(col("vec_id").as("q_id"), col("embedding").as("qe")), 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
    val recall = recallOf(res, nQ)
    info(f"IVFPQ recall@5 on planted cos-0.8 neighbors: $recall%.2f")
    assert(recall >= 0.85,
      s"IVFPQ recall $recall < 0.85 — ADC shortlist or probing regressed")
    graft.table.VersionedTable.deleteRecursively(base)
  }

  test("codebook training reads a bounded, deterministic sample") {
    val corpus = planted.filter(col("vec_id") >= 100)
      .select(col("vec_id").as("__vid"), col("embedding").as("ce"))
    assert(corpus.count() > SimilarityOps.TRAIN_MAX,
      "fixture must exceed the bound to exercise sampling")
    val sample = SimilarityOps.trainingSample(corpus, "__vid")
    // bounded: TRAIN_MAX rows exactly, however large the corpus
    val ids1 = sample.select("__vid").as[Long].collect().toSeq
    assert(ids1.length === SimilarityOps.TRAIN_MAX)
    // deterministic: the same subset every evaluation
    val ids2 = SimilarityOps.trainingSample(corpus, "__vid")
      .select("__vid").as[Long].collect().toSeq
    assert(ids1 === ids2)
    // plan shape: a top-K over the corpus (no global sort shuffle)
    val plan = sample.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"sampling should plan as a top-K, got:\n$plan")
  }

  test("IVF (16 cells, nprobe 4, Lloyd-trained) reaches banded-LSH recall parity") {
    graft.functions.GraftFunctions.register(spark)
    val nQ = 100
    val res = SimilarityOps.ivfTopK(planted, col("vec_id") < nQ, 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
    val recall = recallOf(res, nQ)
    info(f"IVF recall@5 on planted cos-0.8 neighbors: $recall%.2f")
    // the r3 UNTRAINED (sampled) codebook sat at 0.85 here; Lloyd
    // training balances the cells and lifts cos-0.8 pairs into shared
    // probed cells (measured 0.98) — the gate is parity with banded LSH
    assert(recall >= 0.92, s"IVF recall $recall < 0.92 — codebook training regressed")
  }

  test("IVF recall/nprobe curve: recall rises monotonically-ish with probes") {
    graft.functions.GraftFunctions.register(spark)
    val nQ = 100
    val curve = Seq(1, 2, 4, 8).map { np =>
      val res = SimilarityOps.ivfTopK(planted, col("vec_id") < nQ, 5, nprobe = np)
        .select("q_id", "vec_id").as[(Long, Long)].collect()
      np -> recallOf(res, nQ)
    }
    info("IVF recall@5 by nprobe (16 trained cells): " +
      curve.map { case (np, r) => f"$np->$r%.2f" }.mkString(", "))
    // nprobe=1 must already beat the 1/16 random-cell floor massively
    // (neighbor usually shares the nearest cell), and more probes must
    // not lose recall
    assert(curve.head._2 >= 0.5)
    assert(curve.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a })
    assert(curve.last._2 >= 0.98, "nprobe=8 of 16 cells should be near-exhaustive")
  }

  test("near-dup capture at the borderline threshold: sharp 12-bit bands still catch") {
    graft.functions.GraftFunctions.register(spark)
    // pairs at cosine EXACTLY 0.955 — just above the 0.95 verify
    // threshold, the HARDEST true positives. Theory for 12 bands × 12
    // bits: p = 1 − acos(0.955)/π ≈ 0.904, capture 1−(1−p^12)^12 ≈ 0.99.
    val rng = new scala.util.Random(7)
    def unit(): Array[Double] = {
      val v = Array.fill(dims)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val c = 0.955
    val s = math.sqrt(1 - c * c)
    val originals = (0 until 100).map(i => (i.toLong, unit()))
    val dups = originals.map { case (id, q) =>
      val raw = unit()
      val proj = (0 until dims).map(i => raw(i) * q(i)).sum
      val orth = Array.tabulate(dims)(i => raw(i) - proj * q(i))
      val on = math.sqrt(orth.map(x => x * x).sum)
      (1000L + id, Array.tabulate(dims)(i => c * q(i) + s * orth(i) / on))
    }
    val noise = (0 until 1000).map(i => (10000L + i.toLong, unit()))
    val emb = (originals ++ dups ++ noise)
      .map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val flagged = DedupOps.neardupFlags(emb)
      .filter(col("is_dup")).select("vec_id").as[Long].collect().toSet
    val captured = (0 until 100).count(i => flagged.contains(1000L + i))
    info(f"near-dup capture at cos 0.955 (tau 0.95): ${captured / 100.0}%.2f")
    assert(captured >= 90, s"only $captured/100 borderline near-dups captured")
    assert(!flagged.exists(_ < 100), "no original may be flagged")
    // noise pairs concentrate near cos 0 — none reach the 0.95 verify
    assert(!flagged.exists(id => id >= 10000L), "noise must never be flagged")
  }
}
