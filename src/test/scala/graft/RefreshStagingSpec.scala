package graft

/** The six steady-state `_refresh` rows stage net-zero churn (append a
  * shifted copy of ~2% of keys, delete exactly that batch) so their
  * oracle — the full-set batch form — stays valid across ANY number of
  * stagings. This pins that invariance end-to-end through the public
  * prepare/query path the bench harness drives: after two staged
  * refresh cycles the readout must equal the never-staged baseline
  * row-for-row, proving the CDF really carried +/− rows and the
  * maintained state absorbed them without drift. */
class RefreshStagingSpec extends SparkSpec {

  private val rows = Seq(
    "q_sessionize_refresh", "q_event_paths_refresh",
    "q_active_users_refresh", "q_completeness_refresh",
    "q_dataset_card_refresh", "q_mix_kl_refresh")

  private def readout(q: String): Map[String, Int] =
    SparkEntry.queries(q)(spark, sf).collect()
      .groupBy(_.toString).map { case (k, v) => k -> v.length }

  for (q <- rows) test(s"$q readout is invariant across net-zero stagings") {
    val base = readout(q)
    assert(base.nonEmpty, s"$q baseline readout is empty")
    SparkEntry.prepares(q)(spark, sf)
    val once = readout(q)
    SparkEntry.prepares(q)(spark, sf)
    val twice = readout(q)
    assert(once == base, s"$q drifted after first staged refresh")
    assert(twice == base, s"$q drifted after second staged refresh")
  }
}
