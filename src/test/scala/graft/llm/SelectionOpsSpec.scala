package graft.llm

import graft.{SparkEntry, SparkSpec}

/** Selection operators: MMR greedy optimality + diversity, and the
  * cluster-balanced sample cap. */
class SelectionOpsSpec extends SparkSpec {

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val vecs: Map[Long, Array[Float]] =
    graft.Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  /** In-memory reference MMR: same shortlist, same greedy recursion. */
  private def referenceMmr(qId: Long): Seq[(Long, Double)] = {
    val qe = vecs(qId)
    val cands = vecs.keys.filter(_ >= 8).toSeq.sorted
    val rel = cands.map(c => c -> cos(qe, vecs(c))).toMap
    val shortlist = cands.sortBy(c => (-rel(c), c)).take(32)
    var selected = Vector.empty[(Long, Double)]
    for (_ <- 1 to 8) {
      val remaining = shortlist.filterNot(c => selected.exists(_._1 == c))
      val scored = remaining.map { c =>
        val msim = if (selected.isEmpty) 0.0
          else selected.map(s => cos(vecs(c), vecs(s._1))).max
        c -> (0.5 * rel(c) - 0.5 * msim)
      }
      val (pick, score) = scored.minBy { case (c, sc) => (-sc, c) }
      selected = selected :+ (pick, score)
    }
    selected
  }

  private lazy val mmr = SparkEntry.queries("q_mmr_select")(spark, sf)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("MMR matches the in-memory greedy reference per query and step") {
    for (q <- 0L until 4L) {
      val got = mmr.filter(_._1 == q).sortBy(_._3).map(t => (t._2, t._4))
      val want = referenceMmr(q).map { case (id, s) =>
        (id, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      assert(got.map(_._1).toSeq == want.map(_._1),
        s"q=$q pick order mismatch: got ${got.toSeq} want $want")
      got.zip(want).foreach { case ((_, gs), (_, ws)) =>
        assert(math.abs(gs - ws) < 1e-6, s"q=$q score $gs vs $ws") }
    }
  }

  test("MMR selections are distinct and complete (K per query)") {
    for (q <- 0L until 4L) {
      val rows = mmr.filter(_._1 == q)
      assert(rows.length == 8)
      assert(rows.map(_._2).distinct.length == 8, "picks must be distinct")
      assert(rows.map(_._3).sorted.toSeq == (1L to 8L), "steps 1..K")
    }
  }

  test("MMR set is no less diverse than plain relevance top-K") {
    def maxPairCos(ids: Seq[Long]): Double =
      (for { a <- ids; b <- ids if a < b } yield cos(vecs(a), vecs(b))).max
    for (q <- 0L until 4L) {
      val qe = vecs(q)
      val topk = vecs.keys.filter(_ >= 8).toSeq
        .sortBy(c => (-cos(qe, vecs(c)), c)).take(8)
      val sel = mmr.filter(_._1 == q).map(_._2).toSeq
      assert(maxPairCos(sel) <= maxPairCos(topk) + 1e-12,
        s"q=$q: MMR must not be more redundant than top-K")
    }
  }

  test("cluster sample respects the per-cell cap with contiguous ranks") {
    val rows = SparkEntry.queries("q_cluster_sample")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.map(_._2).distinct.length == rows.length,
      "a vector is sampled at most once")
    rows.groupBy(_._1).foreach { case (cell, rs) =>
      assert(rs.length <= 16, s"cell $cell exceeds cap")
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length.toLong),
        s"cell $cell ranks must be contiguous from 1")
    }
    val corpus = vecs.keySet
    assert(rows.forall(r => corpus.contains(r._2)))
  }
}
