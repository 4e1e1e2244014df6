package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Privacy-preserving release operators, complementing the per-row PII
  * scrubbing in [[graft.llm.CorpusQuality]]: PII scrub rewrites values
  * INSIDE a row, k-anonymity reasons about which COMBINATIONS of
  * quasi-identifiers are safe to release at all (Sweeney 2002). A row
  * is releasable only if at least k rows share its quasi-identifier
  * tuple — otherwise the tuple itself re-identifies.
  *
  * '''q_k_anonymize''' — k-anonymity with a fixed generalization
  * ladder over the document table's quasi-identifiers
  * `(lang, source, n_chars)`:
  *
  *   - level 0: `(lang, source, length-bucket-of-200)` — full detail;
  *   - level 1: `(lang, source)` — length generalized to `*`;
  *   - level 2: `(lang)` — source also generalized;
  *   - suppress: even the lang-only group is smaller than k.
  *
  * Each row is released at the FINEST level whose group reaches k, the
  * standard local-generalization scheme (a full-domain lattice search
  * is NP-hard; a fixed ladder is the scalable production variant).
  *
  * == 100 TB design ==
  * The decision depends only on a row's level-0 group, never on the
  * row, so the plan is: ONE `rollup` aggregation (a single
  * expand+shuffle pass produces the counts of every ladder level
  * simultaneously — exactly what ROLLUP's prefix lattice computes),
  * assemble the per-group ladder by joining the three count levels
  * (aggregate-sized inputs), then one broadcast join back onto the
  * fact scan. Group count ≪ row count is the premise of k-anonymity
  * itself, so the broadcast side stays small at any corpus scale; the
  * fact table is touched by exactly one shuffle-free pass.
  */
object Privacy extends QueryModule {
  import Tables._

  private val K_ANON = 5
  private val BUCKET = 200 // n_chars generalization unit at level 0

  private def qKAnonymize(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
        expr(s"n_chars div $BUCKET").as("b"))
    kAnonymize(docs, K_ANON)
  }

  /** Release `docs(doc_id, lang, source, b)` under the ladder; rows
    * whose coarsest group stays under `k` are suppressed. */
  def kAnonymize(docs: DataFrame, k: Int): DataFrame = {
    // one expand+aggregate pass: (l,s,b) gid=0, (l,s) gid=1, (l) gid=3
    val counts = docs.rollup(col("lang"), col("source"), col("b"))
      .agg(count(lit(1)).as("c"), grouping_id().as("gid"))
    val c0 = counts.filter(col("gid") === 0)
      .select(col("lang"), col("source"), col("b"), col("c").as("c0"))
    val c1 = counts.filter(col("gid") === 1)
      .select(col("lang"), col("source"), col("c").as("c1"))
    val c2 = counts.filter(col("gid") === 3)
      .select(col("lang"), col("c").as("c2"))
    val ladder = c0
      .join(c1, Seq("lang", "source"))
      .join(c2, Seq("lang"))
      .withColumn("level",
        when(col("c0") >= k, 0L)
          .when(col("c1") >= k, 1L)
          .when(col("c2") >= k, 2L)
          .otherwise(-1L))
      .select(col("lang"), col("source"), col("b"), col("level"))
    docs.join(broadcast(ladder), Seq("lang", "source", "b"))
      .filter(col("level") =!= -1L)
      .select(col("doc_id"),
        col("lang").as("lang_g"),
        when(col("level") <= 1, col("source")).otherwise(lit("*")).as("source_g"),
        when(col("level") === 0, col("b").cast("string")).otherwise(lit("*"))
          .as("bucket_g"),
        col("level"))
  }

  private val qKAnonymizeSql: String =
    s"""WITH d AS (SELECT doc_id, lang, source, n_chars // $BUCKET AS b
      |           FROM documents),
      |c0 AS (SELECT lang, source, b, count(*) AS c FROM d GROUP BY 1, 2, 3),
      |c1 AS (SELECT lang, source, count(*) AS c FROM d GROUP BY 1, 2),
      |c2 AS (SELECT lang, count(*) AS c FROM d GROUP BY 1),
      |lev AS (SELECT d.doc_id, d.lang, d.source, d.b,
      |          CASE WHEN c0.c >= $K_ANON THEN 0
      |               WHEN c1.c >= $K_ANON THEN 1
      |               WHEN c2.c >= $K_ANON THEN 2
      |               ELSE -1 END AS level
      |        FROM d
      |        JOIN c0 USING (lang, source, b)
      |        JOIN c1 USING (lang, source)
      |        JOIN c2 USING (lang))
      |SELECT doc_id, lang AS lang_g,
      |  CASE WHEN level <= 1 THEN source ELSE '*' END AS source_g,
      |  CASE WHEN level = 0 THEN CAST(b AS VARCHAR) ELSE '*' END AS bucket_g,
      |  CAST(level AS BIGINT) AS level
      |FROM lev WHERE level <> -1""".stripMargin

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q_k_anonymize" -> (qKAnonymize _))

  override val oracles: Seq[(String, String)] = Seq(
    "q_k_anonymize" -> qKAnonymizeSql)
}
