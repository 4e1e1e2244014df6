package graft.table

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Fixture rows for [[MergeModelSpec]] (top-level for encoder access). */
case class MergeFuzzRow(k1: Long, k2: String, v: Long)
case class MergeFuzzSrc(k1: Long, k2: String, v: Long, op: String)

/** Model-based fuzzing of the merge engine: random targets, sources and
  * clause conditions, checked against a driver-side row-by-row model of
  * SQL MERGE semantics (first matching clause wins; unmatched targets
  * kept; sources matching no NOT-MATCHED clause dropped). Also covers
  * composite (two-column) merge keys, which the pipelines don't use. */
class MergeModelSpec extends SparkSpec {
  import spark.implicits._

  private type Row3 = MergeFuzzRow
  private val Row3 = MergeFuzzRow
  private type Src = MergeFuzzSrc
  private val Src = MergeFuzzSrc

  private val schema = StructType(Seq(
    StructField("k1", LongType),
    StructField("k2", StringType),
    StructField("v", LongType)))

  /** Driver-side model of one merge. Returns (snapshot, changes). */
  private def model(
      target: Seq[Row3],
      source: Seq[Src],
      delThresh: Long,
      updThresh: Long):
      (Seq[Row3], Seq[(Row3, String)]) = {
    val tMap = target.map(r => (r.k1, r.k2) -> r).toMap
    val sMap = source.map(r => (r.k1, r.k2) -> r).toMap
    val changes = Seq.newBuilder[(Row3, String)]
    val out = Seq.newBuilder[Row3]
    // matched + kept/updated/deleted targets
    tMap.foreach { case (key, t) =>
      sMap.get(key) match {
        case None => out += t
        case Some(s) =>
          // clause 1: matched AND op = DELETE AND s.v < delThresh
          if (s.op == "DELETE" && s.v < delThresh) {
            changes += ((t, "delete"))
          // clause 2: matched AND s.v > updThresh -> UPDATE SET v = t.v + s.v
          } else if (s.v > updThresh) {
            val u = Row3(t.k1, t.k2, t.v + s.v)
            changes += ((t, "update_preimage"))
            changes += ((u, "update_postimage"))
            out += u
          } else out += t // no clause matched: keep, no change row
      }
    }
    // unmatched sources: clause 3: NOT MATCHED AND op <> DELETE -> INSERT
    sMap.foreach { case (key, s) =>
      if (!tMap.contains(key) && s.op != "DELETE") {
        val r = Row3(s.k1, s.k2, s.v)
        changes += ((r, "insert"))
        out += r
      }
    }
    (out.result(), changes.result())
  }

  test("random merges match the row-by-row MERGE model (composite keys)") {
    for (seed <- Seq(7L, 99L, 2024L)) {
      val rng = new scala.util.Random(seed)
      val keys = for (a <- 1L to 6L; b <- Seq("x", "y", "z")) yield (a, b)
      val target = rng.shuffle(keys).take(10)
        .map { case (a, b) => Row3(a, b, rng.nextInt(100).toLong) }
      val source = rng.shuffle(keys).take(12)
        .map { case (a, b) => Src(a, b, rng.nextInt(100).toLong,
          if (rng.nextBoolean()) "DELETE" else "UPSERT") }
      val delThresh = rng.nextInt(100).toLong
      val updThresh = rng.nextInt(100).toLong

      val base = Files.createTempDirectory(s"merge-fuzz$seed")
      val dir = base.resolve("t").toString
      val t = VersionedTable.create(spark, dir, schema,
        Map(VersionedTable.PROP_CDF -> "true"))
      t.append(target.toDF("k1", "k2", "v"))

      val clauses = Seq(
        WhenMatchedDelete(Some(col("source.op") === "DELETE" &&
          col("source.v") < delThresh)),
        WhenMatchedUpdate(Some(col("source.v") > updThresh),
          set = Map("v" -> (col("target.v") + col("source.v")))),
        WhenNotMatchedInsert(Some(col("source.op") =!= "DELETE")))
      Merge.run(t, source.toDF("k1", "k2", "v", "op"), Seq("k1", "k2"), clauses)

      val (expSnap, expChanges) = model(target, source, delThresh, updThresh)
      val gotSnap = t.snapshot().as[(Long, String, Long)].collect()
        .map(r => Row3(r._1, r._2, r._3)).toSeq
      assert(gotSnap.sortBy(r => (r.k1, r.k2)) ===
        expSnap.sortBy(r => (r.k1, r.k2)), s"seed $seed: snapshot")

      val gotChanges = t.changes(2).select("k1", "k2", "v", "_change_type")
        .as[(Long, String, Long, String)].collect()
        .map(r => (Row3(r._1, r._2, r._3), r._4)).toSeq
      assert(gotChanges.sortBy(c => (c._1.k1, c._1.k2, c._2)) ===
        expChanges.sortBy(c => (c._1.k1, c._1.k2, c._2)), s"seed $seed: CDF")
      VersionedTable.deleteRecursively(base)
    }
  }

  test("mergeSchema fuzz: widening merges match the model; old versions keep their schema") {
    for (seed <- Seq(11L, 404L, 77L)) {
      val rng = new scala.util.Random(seed)
      val keys = for (a <- 1L to 5L; b <- Seq("x", "y")) yield (a, b)
      val target = rng.shuffle(keys).take(6)
        .map { case (a, b) => Row3(a, b, rng.nextInt(100).toLong) }
      val source = rng.shuffle(keys).take(8)
        .map { case (a, b) => (a, b, rng.nextInt(100).toLong,
          if (rng.nextInt(4) == 0) "DELETE" else "UPSERT", s"n$a$b") }

      val base = Files.createTempDirectory(s"merge-evo$seed")
      val t = VersionedTable.create(spark, base.resolve("t").toString, schema)
      t.append(target.toDF("k1", "k2", "v"))

      // UPDATE SET * / INSERT * with an extra source-only column `note`
      Merge.run(t, source.toDF("k1", "k2", "v", "op", "note"),
        Seq("k1", "k2"),
        Seq(WhenMatchedDelete(Some(col("source.op") === "DELETE")),
          WhenMatchedUpdate(),
          WhenNotMatchedInsert(Some(col("source.op") =!= "DELETE"))),
        mergeSchema = true)

      // `op` widens in too (SET */INSERT * carry every source column)
      assert(t.schema.fieldNames.toSeq === Seq("k1", "k2", "v", "op", "note"))
      val tMap = target.map(r => (r.k1, r.k2) -> r).toMap
      val sMap = source.map(s => (s._1, s._2) -> s).toMap
      val expected = (tMap.flatMap { case (key, tr) =>
        sMap.get(key) match {
          case Some(s) if s._4 == "DELETE" => None
          case Some(s) => Some((s._1, s._2, s._3, Some(s._4), Some(s._5)))
          case None => Some((tr.k1, tr.k2, tr.v, None, None))
        }
      } ++ sMap.collect {
        case (key, s) if !tMap.contains(key) && s._4 != "DELETE" =>
          (s._1, s._2, s._3, Some(s._4), Some(s._5))
      }).toSeq
      val got = t.snapshot()
        .as[(Long, String, Long, Option[String], Option[String])].collect().toSeq
      assert(got.sortBy(r => (r._1, r._2)) === expected.sortBy(r => (r._1, r._2)),
        s"seed $seed: evolved snapshot")
      // time travel across the evolution sees the pre-widening schema
      assert(t.snapshotAt(1).schema.fieldNames.toSeq === Seq("k1", "k2", "v"),
        s"seed $seed: v1 schema must be unwidened")
      VersionedTable.deleteRecursively(base)
    }
  }
}
