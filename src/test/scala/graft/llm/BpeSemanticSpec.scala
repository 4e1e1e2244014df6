package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Semantics of the BPE trainer/encoder and the SemDeDup cluster-scoped
  * dedup (value-level parity with DuckDB is covered by the oracle gate;
  * these pin the algorithmic behavior on hand-computable fixtures). */
class BpeSemanticSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def craftedCorpus(docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bpe-spec").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("BPE trainer reproduces hand-computed merges on a crafted corpus") {
    // word types: banana x3, bandana x2, ana x1 (xx7 fails [a-z]{2,})
    val d = craftedCorpus(Seq(
      1L -> "banana banana bandana xx7 ana",
      2L -> "banana bandana"))
    val merges = TextOps.trainBpeMerges(spark, d)
    // pair counts round 1: (a,n)=3*2+2*1+1*1? banana: an,an = 2 per word;
    // bandana: an,an = 2; ana: an = 1 -> n(a,n) = 3*2+2*2+1 = 11, the max
    assert(merges.head === ((1L, "a", "n", "an", 11L)))
    // round 2: banana -> [b,an,an,a], bandana -> [b,an,d,an,a], ana -> [an,a]
    // pairs: (an,an)=3, (an,a)=3+2+1=6, (b,an)=5, (an,d)=2, (d,an)=2
    assert(merges(1) === ((2L, "an", "a", "ana", 6L)))
    // round 3: banana -> [b,an,ana], bandana -> [b,an,d,ana], ana -> [ana]
    // pairs: (b,an)=5, (an,ana)=3, (an,d)=2, (d,ana)=2
    assert(merges(2) === ((3L, "b", "an", "ban", 5L)))
  }

  test("BPE trainer stops early when a tiny corpus runs out of pairs") {
    val d = craftedCorpus(Seq(1L -> "ab ab"))
    val merges = TextOps.trainBpeMerges(spark, d)
    // one merge (a,b) fully collapses the only word type
    assert(merges === Seq((1L, "a", "b", "ab", 2L)))
  }

  test("greedy left-to-right merge: aaaa + (a,a) folds to two pieces") {
    val d = craftedCorpus(Seq(1L -> "aaaa aaaa"))
    val merges = TextOps.trainBpeMerges(spark, d)
    // round 1: (a,a) counted positionally = 3 pairs x 2 occurrences
    assert(merges.head === ((1L, "a", "a", "aa", 6L)))
    // round 2: greedy fold left 'aaaa' as [aa, aa] -> pair (aa,aa)
    assert(merges(1) === ((2L, "aa", "aa", "aaaa", 2L)))
  }

  test("encoder piece counts are bounded by tokens below and chars above") {
    val enc = q("q_bpe_encode")
      .select("doc_id", "n_tokens", "n_pieces")
      .as[(Long, Long, Long)].collect()
    assert(enc.nonEmpty)
    val charBound = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), expr(
        """aggregate(transform(split(lower(text), ' '),
          |  w -> CASE WHEN w RLIKE '^[a-z]{2,}$' THEN length(w)
          |            ELSE 1 END), 0, (acc, x) -> acc + x)""".stripMargin)
        .cast("long").as("chars"))
      .as[(Long, Long)].collect().toMap
    enc.foreach { case (id, nTok, nPieces) =>
      assert(nPieces >= nTok, s"doc $id: fewer pieces than tokens")
      assert(nPieces <= charBound(id),
        s"doc $id: merges must never increase piece count past chars")
    }
    // merges must actually fire somewhere on the real corpus
    assert(enc.exists { case (id, _, p) => p < charBound(id) },
      "no document was compressed by the learned merges")
  }

  test("tokenizer fertility: per-lang rows reconcile with per-doc encode totals") {
    val fert = q("q_tokenizer_fertility").cache()
    try {
      val rows = fert.select("lang", "n_docs", "n_tokens", "n_pieces",
          "pieces_per_token_ppm")
        .as[(String, Long, Long, Long, Long)].collect()
      assert(rows.nonEmpty)
      // lang partition is exhaustive: doc/token/piece totals must equal
      // the per-doc encoder's corpus totals exactly
      val (totTok, totPieces) = q("q_bpe_encode")
        .agg(sum("n_tokens"), sum("n_pieces"))
        .as[(Long, Long)].first()
      assert(rows.map(_._3).sum === totTok)
      assert(rows.map(_._4).sum === totPieces)
      assert(rows.map(_._2).sum ===
        graft.Tables.documents(spark, sf).count())
      rows.foreach { case (lang, _, tok, pieces, ppm) =>
        assert(pieces >= tok, s"$lang: fewer pieces than tokens")
        assert(ppm === pieces * 1000000L / tok, s"$lang: ppm arithmetic")
        assert(ppm >= 1000000L, s"$lang: fertility below 1 piece/token")
      }
    } finally fert.unpersist()
  }

  test("semantic dedup finds exactly the planted near-dups, keeper = source") {
    val dups = q("q_semantic_dedup")
      .select("dup_id", "keep_id", "cos")
      .as[(Long, Long, Double)].collect()
    val planted = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 25 === 0).select("vec_id")
      .as[Long].collect().toSet
    assert(dups.length === planted.size)
    dups.foreach { case (dupId, keepId, cos) =>
      // the planted copy (vec_id + 100000) dedups against its source:
      // unrelated pairs peak at cosine 0.51, far under tau = 0.95
      assert(dupId - 100000L === keepId, s"dup $dupId kept $keepId")
      assert(planted.contains(keepId))
      assert(cos > 0.999)
    }
  }

  test("semantic dedup agrees with the LSH-candidate near-dup flags") {
    val semantic = q("q_semantic_dedup").select("dup_id")
      .as[Long].collect().toSet
    val flagged = q("q_embed_neardup")
      .filter(col("is_dup")).select("vec_id").as[Long].collect().toSet
    assert(semantic === flagged,
      "cluster-scoped and LSH-candidate dedup must flag the same set")
  }
}
