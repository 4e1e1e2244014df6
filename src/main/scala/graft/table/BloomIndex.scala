package graft.table

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.{Base64, UUID}
import scala.collection.concurrent.TrieMap
import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, In, Literal, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** Per-file bloom-filter index for point lookups on high-cardinality,
  * un-clustered columns — the gap the manifest's min/max stats cannot
  * close (a uniformly distributed hash/uuid column spans nearly the full
  * value range in EVERY file, so range stats prune nothing; Delta ships
  * a bloom filter index for exactly this query shape).
  *
  * Layout: one small JSON sidecar per data file under `_bloom/`,
  * referenced from the file's manifest entry (`DataFile.bloomPath`) —
  * manifests stay O(small), sidecars load lazily and only when an
  * equality/IN conjunct targets an indexed column. Sidecars are
  * immutable and share data-file liveness (vacuum deletes them with
  * their file; deletion vectors only remove rows, so a bloom stays a
  * conservative over-approximation — false positives open a file
  * needlessly, false negatives are impossible).
  *
  * Build is ONE distributed Spark job per ingest, all builtin
  * expressions (xxhash64 double-hashing → k bit positions → explode →
  * `groupBy(file, word).agg(bit_or)`); only the finished O(m/64)-sized
  * word lists reach the driver. Membership tests recompute the same
  * double hash on the driver via the identical Catalyst `XxHash64`
  * expression, so write-side and probe-side hashing can never drift.
  */
object BloomIndex {
  /** Hash-function count (k). With bitsPerRow=10 the false-positive
    * rate is ~0.9% (optimal k for m/n=10 is ~7). */
  val K = 7
  /** Second-hash salt for double hashing h_i = h1 + i*h2. */
  val SALT = 0x9E3779B97F4A7C15L

  final case class ColumnBloom(m: Long, k: Int, words: String) {
    lazy val bits: Array[Long] = {
      val bytes = Base64.getDecoder.decode(words)
      val out = new Array[Long](bytes.length / 8)
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < out.length) { out(i) = bb.getLong(); i += 1 }
      out
    }
    def mayContain(hs: Seq[Long]): Boolean =
      hs.forall { h =>
        val p = java.lang.Math.floorMod(h, m)
        val w = (p >>> 6).toInt
        w < bits.length && (bits(w) & (1L << (p & 63))) != 0L
      }
  }
  final case class Sidecar(cols: Map[String, ColumnBloom])

  private implicit val fmts: Formats = DefaultFormats
  /** Sidecars are immutable once published — cache across reads, keyed
    * by absolute path. */
  private val cache = TrieMap.empty[String, Option[Sidecar]]

  private def nextPow2(n: Long): Long = {
    var m = 64L
    while (m < n) m <<= 1
    m
  }

  /** Builds blooms for `entries` (just moved under `data/`) in one Spark
    * job, writes the sidecars under `<root>/_bloom/`, and returns the
    * entries with `bloomPath` attached. Null column values are not
    * indexed (`a = NULL` is never true; [[FileSkipping]] already skips
    * on it). */
  def attach(
      spark: SparkSession,
      root: Path,
      entries: Seq[DataFile],
      schema: StructType,
      bloomCols: Seq[String],
      bitsPerRow: Int): Seq[DataFile] = {
    val cols = bloomCols.filter(c => schema.fieldNames.contains(c))
    if (cols.isEmpty || entries.isEmpty) return entries
    // per-file m from the footer row count (already in the entry)
    val mByName: Map[String, Long] = entries.map { f =>
      val name = f.path.split('/').last
      name -> nextPow2(math.max(64L, f.rows.getOrElse(0L) * bitsPerRow.toLong))
    }.toMap
    val readSchema = StructType(schema.fields.filter(f => cols.contains(f.name)))
    val paths = entries.map(f => root.resolve(f.path).toString)
    val mExpr = typedLit(mByName)
    val base = spark.read.schema(readSchema).parquet(paths: _*)
      .withColumn("__f", element_at(split(col("_metadata.file_path"), "/"), -1))
      .withColumn("__m", element_at(mExpr, col("__f")))

    // one pass over all columns: union of per-column (file, col, word,
    // bit). k independent hashes come from per-i salts (no h1+i*h2
    // arithmetic: ANSI mode would overflow-check the multiply)
    val perCol = cols.map { c =>
      base.filter(col(c).isNotNull)
        .select(col("__f"), lit(c).as("__c"),
          explode(array((0 until K).map(i =>
            pmod(xxhash64(col(c), lit(SALT + i)), col("__m"))): _*)).as("__p"))
    }.reduce(_ union _)
    val words = perCol
      .select(col("__f"), col("__c"), (col("__p") / 64).cast("long").as("__w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(__p % 64 AS INT))").as("__bit"))
      .groupBy("__f", "__c", "__w").agg(expr("bit_or(__bit)").as("__word"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (f, rows) =>
        f -> rows.groupBy(_.getString(1)).map { case (c, rs) =>
          c -> rs.map(r => r.getLong(2) -> r.getLong(3)).toMap
        }
      }

    val bloomDir = root.resolve(VersionedTable.BLOOM_DIR)
    Files.createDirectories(bloomDir)
    entries.map { f =>
      val name = f.path.split('/').last
      val m = mByName(name)
      val colWords = words.getOrElse(name, Map.empty)
      val sidecar = Sidecar(cols.map { c =>
        val sparse = colWords.getOrElse(c, Map.empty[Long, Long])
        val arr = new Array[Long]((m >>> 6).toInt)
        sparse.foreach { case (w, v) => arr(w.toInt) = v }
        val bb = java.nio.ByteBuffer.allocate(arr.length * 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        arr.foreach(bb.putLong)
        c -> ColumnBloom(m, K, Base64.getEncoder.encodeToString(bb.array()))
      }.toMap)
      val sidecarName = s"$name.bloom.json"
      val tmp = bloomDir.resolve(s".tmp-$sidecarName-${UUID.randomUUID()}")
      Files.writeString(tmp, Serialization.write(sidecar))
      Files.move(tmp, bloomDir.resolve(sidecarName),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      f.copy(bloomPath = Some(s"${VersionedTable.BLOOM_DIR}/$sidecarName"))
    }
  }

  /** The (column -> tested literals) pairs a bloom can refute: equality
    * and IN-list conjuncts against a plain column. The literal's type
    * must already match the column's (post-analysis Catalyst guarantees
    * it for resolved predicates; anything else stays un-refuted). */
  def probes(conjuncts: Seq[Expression]): Seq[(String, Seq[Literal])] =
    conjuncts.collect {
      case EqualTo(a: AttributeReference, l: Literal) => a.name -> Seq(l)
      case EqualTo(l: Literal, a: AttributeReference) => a.name -> Seq(l)
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        a.name -> vs.map(_.asInstanceOf[Literal])
    }

  /** Driver-side k-hash of a literal — the SAME Catalyst XxHash64
    * expression (seed 42 = functions.xxhash64's default) the build job
    * runs on executors, so probe and build can never drift. */
  private def hashes(l: Literal): Option[Seq[Long]] =
    if (l.value == null) None
    else Try {
      (0 until K).map(i =>
        XxHash64(Seq(l, Literal(SALT + i)), 42L).eval(InternalRow.empty)
          .asInstanceOf[Long])
    }.toOption

  private def load(abs: Path): Option[Sidecar] =
    cache.getOrElseUpdate(abs.toString,
      Try(Serialization.read[Sidecar](Files.readString(abs))).toOption)

  /** false => the file provably holds none of the probed values: every
    * equality/IN conjunct on an indexed column rejects all its
    * literals. Missing sidecars, un-indexed columns, null literals and
    * unhashable types all stay conservative (`true`). */
  def mayMatch(
      root: Path,
      f: DataFile,
      conjunctProbes: Seq[(String, Seq[Literal])]): Boolean =
    f.bloomPath match {
      case None => true
      case Some(rel) =>
        val abs = if (rel.startsWith("/")) Paths.get(rel) else root.resolve(rel)
        load(abs) match {
          case None => true
          case Some(sc) =>
            conjunctProbes.forall { case (c, lits) =>
              sc.cols.get(c) match {
                case None => true
                case Some(b) =>
                  lits.exists(l => hashes(l) match {
                    case None => true // unhashable/null literal: no proof
                    case Some(hs) => b.mayContain(hs)
                  })
              }
            }
        }
    }
}
