package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Video-modality operators: the GVID container round trip over REAL
  * ImageIO PNG frames, decoded-feature reconciliation against a direct
  * recompute from the source text, and the temporal perceptual dedup
  * finding exactly the planted near-dup sequences. */
class VideoOpsSpec extends SparkSpec {

  test("GVID container round-trips real PNG frames exactly") {
    val payload = ("The quick brown fox jumps over the lazy dog. " * 4)
      .getBytes("US-ASCII")
    val n = payload.length
    val video = VideoCodec.encodeVideo(payload)
    val frames = VideoCodec.decodeVideo(video)
    assert(frames.length === VideoCodec.nFrames(n))
    assert(frames.length === VideoCodec.nominalFrames(n),
      "long content covers the nominal frame count")
    // every frame is a genuine PNG the real codec decodes
    val s = VideoCodec.stride(n)
    frames.zipWithIndex.foreach { case (fr, f) =>
      assert(fr.slice(1, 4).map(_.toChar).mkString === "PNG", s"frame $f magic")
      val lf = math.min(n, (f + 1) * s) - f * s
      val dec = ImageCodec.decode(fr)
      assert((dec.width, dec.height) === ImageCodec.dims(lf), s"frame $f dims")
      // frame pixels tile the frame's OWN window of the content
      val ph = ImageCodec.dhash(fr)
      assert(ph.grid.forall(v => v >= 0 && v <= 255))
    }
    // determinism: byte-identical on re-encode
    assert(java.util.Arrays.equals(video, VideoCodec.encodeVideo(payload)))
  }

  test("frame windows are a disjoint cover: a 1-char edit perturbs only frame 0") {
    val t = ("some sufficiently long deterministic content string " * 3)
      .getBytes("US-ASCII")
    val edited = t.clone(); edited(0) = 'z'.toByte
    val a = VideoCodec.decodeVideo(VideoCodec.encodeVideo(t))
    val b = VideoCodec.decodeVideo(VideoCodec.encodeVideo(edited))
    assert(a.length === b.length)
    a.zip(b).zipWithIndex.foreach { case ((fa, fb), f) =>
      val same = java.util.Arrays.equals(fa, fb)
      if (f == 0) assert(!same, "frame 0 must carry the edit")
      else assert(same, s"frame $f must be untouched by a frame-0 edit")
    }
  }

  test("q_video_features reconciles against a direct recompute from text") {
    val out = SparkEntry.queries("q_video_features")(spark, sf)
      .collect().map(r => r.getLong(0) -> r).toMap
    val docs = Tables.documents(spark, sf)
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"), col("text")).collect()
    assert(out.size === docs.length)
    docs.take(30).foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getString(1).getBytes("US-ASCII")
      val frames = VideoCodec.decodeVideo(VideoCodec.encodeVideo(bytes))
      val row = out(id)
      assert(row.getLong(1) === frames.length.toLong, s"n_frames doc $id")
      val d0 = ImageCodec.decode(frames.head)
      assert(row.getLong(2) === d0.width.toLong, s"frame0_w doc $id")
      assert(row.getLong(3) === d0.height.toLong, s"frame0_h doc $id")
      assert(row.getLong(4) ===
        frames.map(fr => ImageCodec.dhash(fr).grid.sum).sum, s"grid_sum doc $id")
    }
  }

  test("video dedup finds exactly the planted near-dup sequences") {
    val out = SparkEntry.queries("q_video_dedup")(spark, sf).collect()
    val eligible = Tables.documents(spark, sf)
      .filter(col("doc_id") % 25 === 0 && length(col("text")) >= 1)
      .count()
    assert(eligible > 0, "fixture needs planted-eligible docs")
    assert(out.length === eligible.toInt,
      "this corpus has no equal-length natural video near-dups, so the " +
        "output is exactly the planted set")
    out.foreach { r =>
      assert(r.getLong(1) === r.getLong(0) + 1000000L, s"pair $r")
      assert(r.getLong(0) % 25 === 0)
      assert(r.getLong(3) <= 7 * r.getLong(2), s"sequence hamming gate $r")
      assert(r.getLong(4) <= ImageCodec.GRID_N * 16L, s"sequence SAD gate $r")
    }
  }
}
