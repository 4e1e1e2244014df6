package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Property tests for the LLM-pipeline operators (value-level parity is
  * covered by the DuckDB oracle gate; these assert the semantic
  * relationships between the operators). */
class LlmOpsSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("exact dedup keeps exactly one survivor per key group, the lowest doc_id") {
    val docs = Tables.documents(spark, sf)
    val out = q("q_exact_dedup").cache()
    val nGroups = docs.select("lang", "source").distinct().count()
    assert(out.count() === nGroups)
    val expected = docs.groupBy("lang", "source").agg(min("doc_id").as("doc_id"))
    assert(out.select("doc_id").except(expected.select("doc_id")).isEmpty)
  }

  test("minhash-LSH candidates achieve full recall on exact near-dup pairs") {
    val exact = q("q_ngram_jaccard")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val cands = q("q_minhash_lsh")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    // 4 bands x 3 rows at sim>=0.8: miss probability (1-s^3)^4 < 1e-2 —
    // planted pairs are ~0.99 similar, miss < 1e-4 each
    val missed = exact -- cands
    assert(missed.isEmpty, s"LSH missed exact near-dup pairs: $missed")
  }

  test("containment prefix filter finds exactly the brute-force pairs at t=0.9") {
    val got = q("q_containment").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // exhaustive all-pairs reference: same shingle definition, no prefix
    // filter — any candidate the pigeonhole prefix drops is a recall bug
    val sh = Tables.documents(spark, sf)
      .withColumn("tokens", split(lower(col("text")), " "))
      .filter(size(col("tokens")) >= 3)
      .withColumn("s", expr(
        """array_distinct(transform(sequence(1, size(tokens)-2),
          |  i -> concat(element_at(tokens, i), ' ',
          |              element_at(tokens, i+1), ' ',
          |              element_at(tokens, i+2))))""".stripMargin))
      .select(col("doc_id"), col("lang"), col("s"), size(col("s")).as("n"))
    val brute = sh.alias("a").join(sh.alias("b"),
        col("a.lang") === col("b.lang") &&
        (col("a.n") < col("b.n") ||
          (col("a.n") === col("b.n") && col("a.doc_id") < col("b.doc_id"))))
      .withColumn("c",
        size(array_intersect(col("a.s"), col("b.s"))) / col("a.n"))
      .filter(col("c") >= 0.9)
      .select(col("a.doc_id"), col("b.doc_id"), col("c"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(brute.nonEmpty, "fixture should contain embedded-document pairs")
    assert(got.keySet === brute.keySet,
      s"prefix filter disagrees with brute force: missed=${brute.keySet -- got.keySet} extra=${got.keySet -- brute.keySet}")
    got.foreach { case (k, c) =>
      assert(math.abs(c - brute(k)) < 1e-12 && c >= 0.9 && c <= 1.0)
    }
  }

  test("bm25 scores exactly the docs matching a query term, positively") {
    val out = q("q_bm25").cache()
    val docs = Tables.documents(spark, sf)
    try {
      // result set = docs containing >= 1 query term (no silent top-k cut)
      val matching = docs.filter(
        arrays_overlap(split(lower(col("text")), " "),
          array(lit("vector"), lit("stream"), lit("window")))).count()
      assert(out.count() === matching)
      // +1-smoothed idf is strictly positive, so every score is
      assert(out.filter(col("score") <= 0).count() === 0)
      assert(out.filter(col("n_terms") < 1 || col("n_terms") > 3).count() === 0)
    } finally { out.unpersist(); () }
  }

  test("simhash puts near-dup pairs within small Hamming distance") {
    val sig = q("q_simhash").as[(Long, Long)].collect().toMap
    val pairs = q("q_ngram_jaccard")
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      val ham = java.lang.Long.bitCount(sig(a) ^ sig(b))
      assert(ham <= 4, s"near-dup pair ($a,$b) has hamming distance $ham")
    }
  }

  test("LSH cosine results are a same-bucket subset consistent with brute force") {
    val exact = q("q_topk_cosine")
      .select("q_id", "vec_id", "cos").as[(Long, Long, Double)].collect()
      .map { case (qid, vid, cos) => (qid, vid) -> cos }.toMap
    val lsh = q("q_cosine_lsh")
      .select("q_id", "vec_id", "cos").as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (qid, vid, cos) =>
      assert(cos >= -1.0 && cos <= 1.0)
      // any LSH hit that brute force also ranked must agree on the score
      exact.get((qid, vid)).foreach(e => assert(math.abs(e - cos) < 1e-9))
    }
  }

  test("multimodal: real PNG encode, ImageIO decode round-trip, deterministic") {
    val docs = Tables.documents(spark, sf).filter(length($"text") >= 1)
    val feats = Multimodal.decodeFeatures(docs, batchSize = 7).cache()
    assert(feats.count() === docs.count())

    // the media column carries REAL PNGs: magic header + decodable
    val media = Multimodal.withMedia(docs.limit(8))
      .select("doc_id", "media").as[(Long, Array[Byte])].collect()
    assert(media.nonEmpty)
    media.foreach { case (_, png) =>
      assert(png.length > 8)
      assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte &&
        png(2) === 'N'.toByte && png(3) === 'G'.toByte,
        "media payload must be a real PNG")
      assert(ImageCodec.decode(png).width >= 16)
    }

    // decoded dims == synthesized dims; pixel sum == tiled content sum
    val texts = docs.select("doc_id", "text").as[(Long, String)]
      .collect().map(t => t._1 -> t._2).toMap
    feats.collect().foreach { f =>
      val text = texts(f.doc_id).getBytes("UTF-8")
      val (w, h) = ImageCodec.dims(text.length)
      assert(f.width === w.toLong && f.height === h.toLong,
        s"doc ${f.doc_id}: decoded dims must equal synthesized dims")
      assert(f.src_bytes === text.length.toLong)
      val expectedSum = (0 until w * h)
        .map(p => (text(p % text.length) & 0xff).toLong).sum
      assert(f.pixel_sum === expectedSum,
        s"doc ${f.doc_id}: decoded pixel sum must equal the tiled content sum")
      assert(f.media_bytes > 8L)
    }
    val again = Multimodal.decodeFeatures(docs, batchSize = 64).collect().toSet
    assert(again === feats.collect().toSet, "batch size must not affect results")

    // resize: ceil-halved dims, sampled-position pixel sum, and a
    // deterministic re-encoded artifact
    val resized = Multimodal.resizeMedia(docs, factor = 2, batchSize = 5)
      .collect().map(r => r.doc_id -> r).toMap
    val resized2 = Multimodal.resizeMedia(docs, factor = 2, batchSize = 64)
      .collect().map(r => r.doc_id -> r).toMap
    texts.foreach { case (id, t) =>
      val bytes = t.getBytes("UTF-8")
      val n = bytes.length
      val (w, h) = ImageCodec.dims(n)
      val (w2, h2) = ((w + 1) / 2, (h + 1) / 2)
      val r = resized(id)
      assert(r.width === w2.toLong && r.height === h2.toLong)
      val expected = (for (y <- 0 until h2; x <- 0 until w2)
        yield (bytes(((2 * y) * w + 2 * x) % n) & 0xff).toLong).sum
      assert(r.pixel_sum === expected)
      assert(r.n_bytes > 8L)
      assert(resized2(id) === r, "resize must be deterministic")
    }
  }

  test("embedding near-dup flags exactly the planted perturbed copies") {
    val out = q("q_embed_neardup").cache()
    val n = Tables.embeddings(spark, sf).count()
    assert(out.count() === n + (n + 24) / 25) // corpus + planted copies
    val flagged = out.filter($"is_dup").select("vec_id").as[Long].collect().toSet
    val planted = Tables.embeddings(spark, sf)
      .filter($"vec_id" % 25 === 0).select($"vec_id" + 100000L)
      .as[Long].collect().toSet
    // every planted copy is caught (cos ~0.999998 >> tau) and no
    // original is ever flagged: originals precede their copies by id
    // and unrelated pairs sit below cos 0.52
    assert(flagged === planted)
  }

  test("text stats are internally consistent") {
    val stats = q("q_text_stats")
    val bad = stats.filter(
      $"n_distinct" > $"n_tokens" ||
      $"type_token_ratio" < 0 || $"type_token_ratio" > 1 ||
      $"stopword_ratio" < 0 || $"stopword_ratio" > 1 ||
      $"avg_token_len" <= 0).count()
    assert(bad === 0L)
  }

  test("dup clusters are the transitive closure of the LSH pair graph") {
    val pairs = q("q_minhash_lsh").select($"doc_a", $"doc_b")
      .as[(Long, Long)].collect()
    val labels = q("q_dup_clusters").as[(Long, Long)].collect().toMap
    // every paired doc is labeled, endpoints share a cluster
    pairs.foreach { case (a, b) =>
      assert(labels.contains(a) && labels.contains(b))
      assert(labels(a) === labels(b), s"pair ($a,$b) split across clusters")
    }
    // labels are canonical: each cluster's id is its minimum member
    labels.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min === cid, s"cluster $cid not labeled by min member")
    }
    // transitivity is non-trivial on this data: some component is larger
    // than a single pair (A~B, B~C chains exist)
    assert(labels.groupBy(_._2).exists(_._2.size > 2),
      "expected at least one component larger than one pair")
  }

  test("doc chunks tile every document with stride overlap and exact token windows") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", size($"toks").as("n")).as[(Long, Int)].collect().toMap
    val chunks = q("q_doc_chunks")
      .as[(Long, Long, Long, String)].collect()
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet === docs.keySet)
    byDoc.foreach { case (id, cs) =>
      val n = docs(id)
      // one chunk per stride start below n
      assert(cs.length === (n + 19) / 20, s"doc $id: ${cs.length} chunks for $n tokens")
      cs.foreach { case (_, start, len, text) =>
        assert(len === math.min(30L, n - start))
        // the window really holds `len` tokens (empty token edge aside)
        if (text.nonEmpty)
          assert(text.split(" ", -1).length.toLong === len)
      }
    }
  }

  test("doc outlier: 5% quota per label, flagged scores dominate kept scores") {
    val out = q("q_doc_outlier")
      .select($"vec_id", $"label", $"cos_centroid", $"is_outlier")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(out.nonEmpty)
    val total = Tables.embeddings(spark, sf).count()
    assert(out.length.toLong == total, "every vector is scored")
    out.groupBy(_._2).foreach { case (_, rows) =>
      val n = rows.length.toLong
      val flagged = rows.filter(_._4)
      assert(flagged.length.toLong == (n + 19) / 20,
        "exactly ceil(5%) flagged per label")
      if (flagged.nonEmpty) {
        val maxFlagged = flagged.map(_._3).max
        val minKept = rows.filterNot(_._4).map(_._3).min
        assert(maxFlagged <= minKept,
          "no kept vector scores below a flagged one")
      }
      rows.foreach { case (_, _, c, _) => assert(c >= -1.0001 && c <= 1.0001) }
    }
  }
}
