package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryModule, Tables}
import graft.table._

/** An incrementally-maintained BM25 lexical-retrieval index — the
  * inverted-index counterpart of the vector-side [[VectorIndex]] /
  * [[SignatureIndex]] family: the corpus's postings and the BM25
  * statistics persist as engine tables and stay in sync with a
  * CDF-tracked source by the engine's OWN maintenance primitives, so
  * steady-state retrieval never re-tokenizes the corpus (the dominant
  * cost of the query-path operator [[TextOps]] `q_bm25`).
  *
  * Three chained artifacts, each with its own upstream watermark:
  *
  *   - '''postings''' `(pkey, doc_id, tok, tf, dl)` — one row per
  *     (document, distinct token), keyed AND hash-bucketed by the
  *     composite `pkey` so the CoW merge rewrites only buckets holding
  *     changed pairs. Maintained from the source's CDF: changed docs'
  *     stale pairs become explicit DELETEs (anti-join of the indexed
  *     pairs against the re-derivation), new/updated pairs UPSERT — one
  *     three-clause [[Merge]] with the source version in its txn.
  *   - '''doclens''' `(doc_id, dl, k)` — per-document length (plus the
  *     constant `k` grouping column the corpus-stats view groups by),
  *     a plain [[IncrementalIndex.refresh]] single-key derivation.
  *   - '''term/corpus statistics''' — [[AggView]]s over the POSTINGS
  *     and DOCLENS tables' own CDF (the `q_view_chain` pattern):
  *     `df(tok)` is the postings row count per token (each row is a
  *     distinct doc by construction), `(n_docs, Σdl)` the doclens
  *     count/sum. Both maintain additively from signed deltas; a
  *     tf-only update's preimage/postimage pair cancels, so df moves
  *     only when a token enters or leaves a document.
  *
  * == 100 TB design ==
  * Refresh is O(changed docs × their tokens + touched buckets): the
  * stale-pair read is key-pruned ([[VersionedTable.snapshotForKeys]],
  * falling back to a semi-join past [[Bm25Ops.KEY_CAP]] keys), the
  * merge rewrites only buckets holding changed doc_ids, and the stats
  * views fold the delta alone. Scoring reads postings filtered to the
  * |Q| query terms (parquet dictionary/stats pruning on `tok`), joins
  * the |Q|-row broadcast df slice and the 1-row broadcast corpus
  * stats — no corpus-scale work on the query path. A crash between
  * stages re-runs only the stage whose watermark lags; every stage is
  * idempotent under replay.
  *
  * Reference anchor: the reference's incremental Silver/Gold
  * maintenance (notebooks/demo-notebook.py:349-435) applied to the IR
  * index shape; scoring matches `q_bm25` (Robertson/Okapi BM25,
  * k1=1.2, b=0.75) bit-for-bit, so the index path shares its oracle.
  */
final class Bm25Index private (
    val postings: VersionedTable,
    val doclens: VersionedTable,
    val termStats: AggView,
    val corpusStats: AggView) {
  import Bm25Ops.{APP, derivePostings, KEY_CAP}

  /** Applies all source changes not yet reflected, stage by stage:
    * postings + doclens from the source CDF, then the stats views from
    * the index tables' CDF. Returns the postings version committed, or
    * None when everything was already current. */
  def refresh(source: VersionedTable): Option[Long] = {
    val committed = Bm25Index.refreshPostings(postings, source)
    Bm25Index.refreshDoclens(doclens, source)
    termStats.refresh(postings)
    corpusStats.refresh(doclens)
    committed
  }

  /** Full re-derivation of the current source snapshot — the
    * `REINDEX INDEX` recovery/uniformity path (there is no quantizer to
    * drift; postings are exact per-doc derivations). The overwrite
    * emits delete+insert CDF that the chained stats views fold to the
    * same state, so the whole stack converges without rebuilds. */
  def reindex(source: VersionedTable): Long = {
    val latest = source.latestVersion
    val snap = source.snapshot()
    postings.overwriteWhere(lit(true), Bm25Ops.derivePostings(snap))
    postings.commitFiles(Seq.empty, Seq.empty, None, "reindex-watermark",
      extraTxn = Map(Bm25Ops.APP -> latest))
    doclens.overwriteWhere(lit(true), snap.select(col("doc_id"),
      size(split(lower(col("text")), " ")).cast("long").as("dl"),
      lit(0).as("k")))
    doclens.commitFiles(Seq.empty, Seq.empty, None, "reindex-watermark",
      extraTxn = Map(Bm25Ops.APP -> latest))
    termStats.refresh(postings)
    corpusStats.refresh(doclens)
    postings.latestVersion
  }

  /** BM25 scores of every document matching any of `terms`, from the
    * PERSISTED index — expression-for-expression the query-path
    * operator ([[TextOps]] `q_bm25`), with `df`/`n_docs`/`Σdl` read
    * from the maintained stats views instead of recomputed. */
  def score(terms: Seq[String]): DataFrame = {
    val p = postings.snapshot().filter(col("tok").isin(terms: _*))
    val dfT = termStats.table.snapshot()
      .filter(col("tok").isin(terms: _*))
      .select(col("tok"), col("n_rows").as("df"))
    val stats = corpusStats.table.snapshot()
      .select(col("n_rows").as("n_docs"), col("sum_dl"))
    p.join(broadcast(dfT), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)))
      .withColumn("part",
        col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") * col("n_docs") / col("sum_dl"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_terms"),
        round(sum(col("part")), 4).as("score"))
  }
}

object Bm25Index {
  import Bm25Ops.{APP, derivePostings, KEY_CAP}

  private[llm] def refreshDoclens(
      doclens: VersionedTable, source: VersionedTable): Option[Long] =
    IncrementalIndex.refresh(doclens, source, "doc_id",
      rows => rows.select(col("doc_id"),
        size(split(lower(col("text")), " ")).cast("long").as("dl"),
        lit(0).as("k"), col("__op")),
      APP)

  private[llm] def refreshPostings(
      postings: VersionedTable, source: VersionedTable): Option[Long] = {
    val latest = source.latestVersion
    val since = postings.lastTxn(APP).getOrElse(0L) + 1
    if (latest < since) return None
    // net and the re-derived postings both feed multiple consumers
    // (emptiness probe / changed-key collect / merge source / stale
    // anti-join build) — persisted for the refresh so the CDF scan and
    // the tokenize-explode-aggregate run once each (guide §5); both
    // O(changed docs), bounded
    val net = IncrementalIndex.netChanges(source.changes(since), "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (net.isEmpty) return None
      val newPost = derivePostings(net.filter(col("__op") === "UPSERT"))
        .withColumn("__op", lit("UPSERT"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // indexed pairs of the changed docs that the re-derivation does
        // not re-assert (deleted docs: all of them; updated docs: tokens
        // that left) — read key-pruned, deleted explicitly
        val changedKeys = net.select(col("doc_id")).distinct()
        val bounded = changedKeys.limit(KEY_CAP + 1).collect().map(_.getLong(0)).toSeq
        val old =
          if (bounded.length <= KEY_CAP) postings.snapshotForKeys("doc_id", bounded)
          else postings.snapshot().join(changedKeys, Seq("doc_id"), "left_semi")
        val stale = old.select(col("pkey"), col("doc_id"), col("tok"),
            col("tf"), col("dl"))
          .join(newPost.select(col("pkey")), Seq("pkey"), "left_anti")
          .withColumn("__op", lit("DELETE"))
        Merge.run(postings, newPost.unionByName(stale), Seq("pkey"),
          IncrementalIndex.clauses, txn = Some(APP -> latest))
        Some(postings.latestVersion)
      } finally newPost.unpersist()
    } finally net.unpersist()
  }

  private def postingsSchema = StructType(Seq(
    StructField("pkey", StringType),
    StructField("doc_id", LongType),
    StructField("tok", StringType),
    StructField("tf", LongType),
    StructField("dl", LongType)))

  private def doclensSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("dl", LongType),
    StructField("k", IntegerType)))

  val BUCKETS = 8

  /** Indexes the source's current snapshot (full derivation — the bulk
    * path; [[Bm25Index.refresh]] handles deltas only) and builds the
    * chained stats views off the freshly-seeded index tables. Source
    * needs CDF enabled. */
  def build(source: VersionedTable, path: String): Bm25Index = {
    val s = source.spark
    val root = java.nio.file.Paths.get(path)

    // bucketed (merge-maintained) tables seed through the SAME refresh
    // path that maintains them — the [[SignatureIndex]] contract; the
    // initial catch-up processes the source's full CDF as one batch
    val post = VersionedTable.create(s, root.resolve("postings").toString,
      postingsSchema,
      IncrementalIndex.indexProps("bm25", source, "text", "pkey") +
        (VersionedTable.PROP_CDF -> "true"),
      bucketBy = Some(BucketSpec(Seq("pkey"), BUCKETS)))
    refreshPostings(post, source)

    val dls = VersionedTable.create(s, root.resolve("doclens").toString,
      doclensSchema,
      IncrementalIndex.indexProps("bm25-doclen", source, "text", "doc_id") +
        (VersionedTable.PROP_CDF -> "true"),
      bucketBy = Some(BucketSpec(Seq("doc_id"), BUCKETS)))
    refreshDoclens(dls, source)

    val term = AggView.build(post, root.resolve("termstats").toString,
      Seq("tok"), sums = Seq.empty)
    val corpus = AggView.build(dls, root.resolve("corpusstats").toString,
      Seq("k"), sums = Seq("dl" -> "dl"))
    new Bm25Index(post, dls, term, corpus)
  }

  def load(spark: SparkSession, path: String): Bm25Index = {
    val root = java.nio.file.Paths.get(path)
    new Bm25Index(
      VersionedTable.load(spark, root.resolve("postings").toString),
      VersionedTable.load(spark, root.resolve("doclens").toString),
      AggView.load(spark, root.resolve("termstats").toString),
      AggView.load(spark, root.resolve("corpusstats").toString))
  }
}

/** Oracle-gated rows for the persisted BM25 index (`q_bm25_index`) and
  * its steady-state maintenance cost (`q_bm25_refresh`). */
object Bm25Ops extends QueryModule {
  import Tables._

  private[llm] val APP = "bm25-index"
  /** Largest changed-doc key set read via [[VersionedTable.snapshotForKeys]]
    * before falling back to a semi-join (the [[graft.table.JoinView]]
    * rationale). */
  private[llm] val KEY_CAP = 10000

  /** `(pkey, doc_id, tok, tf, dl)` pairs of a batch of `(doc_id, text)`
    * rows — tokenization identical to the query-path `q_bm25`
    * (lowercase, single-space split; `dl` counts ALL tokens). */
  private[llm] def derivePostings(rows: DataFrame): DataFrame = rows
    .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
    .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
      explode(col("t")).as("tok"))
    .groupBy(col("doc_id"), col("tok"))
    .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    .select(concat(col("doc_id"), lit("|"), col("tok")).as("pkey"),
      col("doc_id"), col("tok"), col("tf"), col("dl"))

  private def srcSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** Fixture cached per (session, sf dir): the corpus lands in two
    * appends around the index build, then one slice is truncated and
    * restored — exercising insert, stale-pair deletion, df shrink/grow,
    * and doc-length change — with END STATE = the full documents table,
    * so the DuckDB oracle recomputes BM25 declaratively over
    * `documents` ([[TextOps.qBm25Sql]] verbatim). */
  private val cache = scala.collection.concurrent.TrieMap.empty[
    (SparkSession, String),
    (VersionedTable, Bm25Index, java.util.concurrent.atomic.AtomicLong)]

  private def fixture(s: SparkSession, d: String)
      : (VersionedTable, Bm25Index, java.util.concurrent.atomic.AtomicLong) =
    cache.synchronized {
      cache.getOrElseUpdate((s, d), {
        val root = graft.Scratch.dir("graft-bm25-index")
        val src = VersionedTable.create(s, root.resolve("src").toString,
          srcSchema, Map(VersionedTable.PROP_CDF -> "true"))
        val docs = documents(s, d).select(col("doc_id"), col("text"))
        src.append(docs.filter(col("doc_id") % 3 < 2))
        val idx = Bm25Index.build(src, root.resolve("idx").toString)
        src.append(docs.filter(col("doc_id") % 3 === 2))
        idx.refresh(src)
        // churn a slice: truncate to its first 5 tokens (tokens LEAVE
        // their documents -> stale postings delete, df shrinks, dl
        // changes) ...
        val churned = col("doc_id") % 7 === 0
        src.deleteWhere(churned)
        src.append(docs.filter(churned).withColumn("text",
          concat_ws(" ", slice(split(col("text"), " "), 1, 5))))
        idx.refresh(src)
        // ... then restore the originals -> end state = full corpus
        src.deleteWhere(churned)
        src.append(docs.filter(churned))
        idx.refresh(src)
        (src, idx, new java.util.concurrent.atomic.AtomicLong)
      })
    }

  private def qBm25Index(s: SparkSession, d: String): DataFrame =
    fixture(s, d)._2.score(TextOps.BM25_TERMS)

  /** STEADY-STATE maintenance + query: each untimed staging deletes and
    * re-appends a small doc slice (nets to a content-identical UPSERT —
    * real CDF rows, real bucket rewrites, provably unchanged scores),
    * so the timed body is ONE chained refresh plus the |Q|-term scoring
    * read. */
  private def brPrepare(s: SparkSession, d: String): Unit = {
    val (src, _, calls) = fixture(s, d)
    calls.getAndIncrement(): Unit
    val churned = col("doc_id") % 50 === 0
    src.deleteWhere(churned)
    src.append(documents(s, d).select(col("doc_id"), col("text"))
      .filter(churned)): Unit
  }

  private def qBm25Refresh(s: SparkSession, d: String): DataFrame = {
    val (src, idx, _) = fixture(s, d)
    idx.refresh(src)
    idx.score(TextOps.BM25_TERMS)
  }

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q_bm25_index"   -> qBm25Index _,
    "q_bm25_refresh" -> qBm25Refresh _)

  override val oracles: Seq[(String, String)] = Seq(
    "q_bm25_index"   -> TextOps.qBm25Sql,
    "q_bm25_refresh" -> TextOps.qBm25Sql)

  override val prepares: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "q_bm25_refresh" -> (brPrepare _))
}
