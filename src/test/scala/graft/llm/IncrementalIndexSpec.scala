package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}
import graft.table.VersionedTable

/** CDF-maintained index tables: refresh ≡ rebuild under the frozen
  * codebook, deletes propagate, refreshes are O(delta) CoW merges, and
  * re-running a refresh is a no-op (the txn guard). The end-to-end
  * search/pairs correctness is oracle-checked by `q_ivf_index` /
  * `q_minhash_index`. */
class IncrementalIndexSpec extends SparkSpec {
  import spark.implicits._

  private val srcSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  test("vector index: incremental refresh equals frozen-codebook rebuild; deletes propagate") {
    graft.functions.GraftFunctions.register(spark)
    val base = Files.createTempDirectory("vec-index")
    val src = VersionedTable.create(spark, s"$base/src", srcSchema,
      Map(VersionedTable.PROP_CDF -> "true"))
    val corpus = Tables.embeddings(spark, sf).filter($"vec_id" >= 8)
    src.append(corpus.filter($"vec_id" % 2 === 0))
    val idx = VectorIndex.build(src, s"$base/idx")

    src.append(corpus.filter($"vec_id" % 2 === 1))
    assert(idx.refresh(src).isDefined)
    val m = idx.table.latestManifest
    assert(m.addedFiles.size <= VectorIndex.BUCKETS,
      s"refresh must be a bucket-scoped CoW merge, rewrote ${m.addedFiles.size} files")

    // refresh ≡ rebuild: assignment of the FULL corpus under the frozen
    // codebook matches the incrementally maintained table
    val expected = SimilarityOps.nearest(
        src.snapshot().select($"vec_id".as("__vid"), $"embedding".as("ce")),
        idx.codebook, "ce", 1, "__r")
      .select($"__vid".as("vec_id"), $"c_id")
    val actual = idx.table.snapshot().select($"vec_id", $"c_id")
    assert(actual.exceptAll(expected).isEmpty && expected.exceptAll(actual).isEmpty)

    // idempotence: nothing new -> no commit
    val v = idx.table.latestVersion
    assert(idx.refresh(src).isEmpty)
    assert(idx.table.latestVersion === v)

    // deletes propagate through the CDF into the index and its searches
    val victims = corpus.orderBy($"vec_id").limit(2)
      .select($"vec_id").as[Long].collect().toSeq
    src.deleteWhere($"vec_id".isin(victims: _*))
    assert(idx.refresh(src).isDefined)
    assert(idx.table.snapshot()
      .filter($"vec_id".isin(victims: _*)).count() === 0L)
    val res = idx.search(
      Tables.embeddings(spark, sf).filter($"vec_id" < 8)
        .select($"vec_id".as("q_id"), $"embedding".as("qe")), 5)
    assert(res.filter($"vec_id".isin(victims: _*)).count() === 0L)
    VersionedTable.deleteRecursively(base)
  }

  test("signature index: update re-signs a document; too-short docs index a null signature") {
    val base = Files.createTempDirectory("sig-index")
    val srcSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType)))
    val src = VersionedTable.create(spark, s"$base/src", srcSchema,
      Map(VersionedTable.PROP_CDF -> "true"))
    src.append(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "short")).toDF("doc_id", "text"))
    val idx = SignatureIndex.build(src, s"$base/idx")

    assert(idx.table.snapshot().count() === 3L)
    assert(idx.table.snapshot().filter($"doc_id" === 3 && $"mhs".isNull)
      .count() === 1L)
    // docs 1 and 2 share 6 of 7 shingles -> a near-dup pair
    assert(idx.pairs.select($"doc_a", $"doc_b").as[(Long, Long)].collect()
      .toSet === Set((1L, 2L)))

    // an UPDATE re-signs: make doc 2 unrelated, the pair disappears
    src.updateWhere($"doc_id" === 2,
      Map("text" -> lit("entirely different words appear in this one now")))
    assert(idx.refresh(src).isDefined)
    assert(idx.pairs.isEmpty)

    // and shrinking a doc below the shingle threshold clears its signature
    src.updateWhere($"doc_id" === 1, Map("text" -> lit("tiny")))
    idx.refresh(src)
    assert(idx.table.snapshot().filter($"doc_id" === 1 && $"mhs".isNull)
      .count() === 1L)
    VersionedTable.deleteRecursively(base)
  }
}
