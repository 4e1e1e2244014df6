package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table._

/** Property tests for the CDC pipeline (SURVEY §5 test plan): random
  * realistic CDC streams, replayed through the real engine, must satisfy
  *   (a) silver ≡ the last-writer-wins fold of the stream;
  *   (b) incremental gold ≡ recomputed gold after every replay;
  *   (c) duplicate batch injection changes nothing (idempotence — incl.
  *       replayed DELETEs, which the guarded NOT-MATCHED clause absorbs);
  *   (d) batch-boundary invariance (same records, different splits →
  *       same final state).
  *
  * "Realistic" = per-key lifecycles INSERT → UPDATE* → optional
  * terminal DELETE, interleaved across keys — the guarantee a real DB
  * CDC log provides (no INSERT of a live primary key, no reuse of a
  * deleted key). Within that model the reference's batch semantics
  * (dedup-to-latest-per-id, then one merge action) coincide with the
  * per-record fold; outside it they provably cannot (a
  * DELETE-then-reINSERT of the same key inside ONE micro-batch dedups
  * to the INSERT, which a MATCHED target ignores — an inherent limit of
  * the reference's design worth knowing at 100 TB, where wider
  * micro-batches make multi-op keys more likely).
  *
  * Streams are generated with a seeded RNG — runs are deterministic.
  */
class CdcPropertySpec extends SparkSpec {
  import spark.implicits._

  private case class Rec(
      id: Long, country: String, district: String,
      numVisitors: Long, op: String, cdcTs: Long)

  private val countries = Seq("England", "Wales", "Scotland", "Australia")

  /** Interleaved per-key lifecycles with strictly increasing global
    * cdc timestamps. */
  private def stream(nIds: Int, seed: Long): Seq[Rec] = {
    val rng = new scala.util.Random(seed)
    val queues = (1 to nIds).map { id =>
      val country = countries(rng.nextInt(countries.size))
      val district = s"D${1 + rng.nextInt(3)}"
      val nUpdates = rng.nextInt(4)
      val base = Rec(id.toLong, country, district, 0L, "", 0L)
      val life = (base.copy(numVisitors = 1L + rng.nextInt(1000), op = "INSERT") +:
        (1 to nUpdates).map(_ =>
          base.copy(numVisitors = 1L + rng.nextInt(1000), op = "UPDATE"))) ++
        (if (rng.nextDouble() < 0.3) Seq(base.copy(op = "DELETE")) else Seq.empty)
      scala.collection.mutable.Queue(life: _*)
    }.toArray
    val out = Seq.newBuilder[Rec]
    var ts = 1673000000000L
    while (queues.exists(_.nonEmpty)) {
      val nonEmpty = queues.indices.filter(queues(_).nonEmpty)
      val q = queues(nonEmpty(rng.nextInt(nonEmpty.size)))
      out += q.dequeue().copy(cdcTs = ts)
      ts += 1000L
    }
    out.result()
  }

  private def toDf(recs: Seq[Rec]): DataFrame =
    CdcPipeline.withLineage(
      recs.map(r => (r.id, r.country, r.district, r.numVisitors, r.op, r.cdcTs))
        .toDF("id", "country", "district", "num_visitors", "cdc_operation", "ms")
        .withColumn("visit_timestamp",
          lit("2023-01-08 10:00:00").cast("timestamp"))
        .withColumn("cdc_timestamp", timestamp_millis($"ms"))
        .select(CdcPipeline.rawSchema.fieldNames.map(col): _*))

  /** Replays batches through silver+gold via the real engine. */
  private def replay(batches: Seq[Seq[Rec]], tag: String): (VersionedTable, VersionedTable) = {
    val base = Files.createTempDirectory(s"cdc-prop-$tag")
    val silver = CdcPipeline.createSilver(spark, s"$base/silver")
    val gold = CdcPipeline.createGold(spark, s"$base/gold")
    batches.filter(_.nonEmpty).foreach { b =>
      val sv = CdcPipeline.mergeBatchIntoSilver(silver, toDf(b))
      sv.version.foreach { v =>
        CdcPipeline.mergeDeltasIntoGold(gold,
          CdcPipeline.goldDeltas(silver.changes(v, Some(v))))
      }
    }
    (silver, gold)
  }

  /** Engine-independent reference model: per-record LWW fold. */
  private def lwwModel(recs: Seq[Rec]): Map[Long, Rec] =
    recs.sortBy(_.cdcTs).foldLeft(Map.empty[Long, Rec]) { (state, r) =>
      r.op match {
        case "DELETE" => state - r.id
        case "INSERT" => if (state.contains(r.id)) state else state + (r.id -> r)
        case _        => state + (r.id -> r)
      }
    }

  private def silverMap(silver: VersionedTable): Map[Long, (String, Long)] =
    silver.snapshot().select("id", "country", "num_visitors")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  private def goldMap(df: DataFrame): Map[String, Long] =
    df.select("country", "sum_visitors").as[(String, Long)].collect()
      .toMap.filter(_._2 != 0L)

  test("(a)+(b) random streams: silver is the LWW fold; incremental gold = recompute") {
    for (seed <- Seq(11L, 22L, 33L)) {
      val recs = stream(nIds = 15, seed)
      val (silver, gold) = replay(recs.grouped(9).toSeq, s"ab$seed")
      val model = lwwModel(recs)
      assert(silverMap(silver) ===
        model.map { case (id, r) => id -> (r.country, r.numVisitors) },
        s"seed $seed: silver diverged from the LWW model")
      val expectedGold = model.values.toSeq.groupBy(_.country)
        .map { case (c, rs) => c -> rs.map(_.numVisitors).sum }
        .filter(_._2 != 0L)
      assert(goldMap(gold.snapshot()) === expectedGold, s"seed $seed: gold")
      assert(goldMap(CdcPipeline.recomputedGold(silver)) === expectedGold,
        s"seed $seed: gold recompute")
    }
  }

  test("(c) duplicate batch injection is a no-op, including replayed DELETEs") {
    val recs = stream(nIds = 12, seed = 777L)
    val batches = recs.grouped(8).toSeq
    val withDups = batches.flatMap(b => Seq(b, b)) // every batch replayed verbatim
    val (s1, g1) = replay(batches, "nodup")
    val (s2, g2) = replay(withDups, "dup")
    assert(silverMap(s1) === silverMap(s2), "duplicated batches changed silver")
    assert(goldMap(g1.snapshot()) === goldMap(g2.snapshot()),
      "duplicated batches changed gold")
  }

  test("(d) batch-boundary invariance: any split yields the same final state") {
    val recs = stream(nIds = 12, seed = 4242L)
    val splits = Seq(
      recs.grouped(recs.size).toSeq, // single batch
      recs.grouped(7).toSeq,         // ragged batches
      recs.grouped(1).toSeq)         // one record per batch
    val states = splits.zipWithIndex.map { case (b, i) =>
      val (s, g) = replay(b, s"split$i")
      (silverMap(s), goldMap(g.snapshot()))
    }
    assert(states.distinct.size === 1,
      "different batch splits produced different final states")
  }
}
