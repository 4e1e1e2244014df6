package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every [[QueryModule]]'s named queries and their DuckDB
  * oracle SQL. Each query takes (spark, sfDir) and reads only the shared
  * parquet test tables under sfDir (TESTDATA.md).
  */
object SparkEntry {
  private val modules: Seq[QueryModule] = Seq(
    graft.queries.Relational,
    graft.queries.MergeOps,
    graft.operators.Sampling,
    graft.operators.Sketches,
    graft.operators.Privacy,
    graft.streaming.EventWindows,
    graft.streaming.EventStateViews,
    graft.table.TopKViewOps,
    graft.llm.TextOps,
    graft.llm.Bm25Ops,
    graft.llm.ChunkBm25Ops,
    graft.llm.CorpusQuality,
    graft.llm.DedupOps,
    graft.llm.SimilarityOps,
    graft.llm.RerankViewOps,
    graft.llm.SelectionOps,
    graft.llm.Multimodal,
    graft.llm.AudioOps,
    graft.llm.VideoOps)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap

  /** Untimed per-invocation staging for steady-state queries — run by
    * Bench/Verify right before the like-named query; results must not
    * depend on whether it ran (see [[QueryModule.prepares]]). */
  def prepares: Map[String, (SparkSession, String) => Unit] =
    modules.flatMap(_.prepares).toMap
}
