package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dotFold =
    """aggregate(sequence(1, size(a)), cast(0.0 AS double),
      |  (acc, i) -> acc + cast(element_at(a, i) AS double)
      |                  * cast(element_at(b, i) AS double))""".stripMargin

  test("cosine_sim is bit-identical to the interpreted HOF fold") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf).limit(50)
    val pairs = emb.select($"vec_id".as("ida"), $"embedding".as("a"))
      .crossJoin(emb.select($"vec_id".as("idb"), $"embedding".as("b")))
      .filter($"ida" < $"idb")
    val qq = dotFold.replace("(a, i)", "(a, i)").replace("element_at(b", "element_at(a")
    val cc = dotFold.replace("element_at(a", "element_at(b")
    val checked = pairs
      .withColumn("fast", expr("cosine_sim(a, b)"))
      .withColumn("slow",
        expr(dotFold) / (sqrt(expr(qq)) * sqrt(expr(cc))))
    assert(checked.count() > 0)
    // exact bit equality, not approximate: both are the same sequential
    // double-precision operation order
    assert(checked.filter($"fast" =!= $"slow").count() === 0L)
  }

  test("cosine_sim is registered for SQL and self-similarity is 1.0") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sf).limit(10).createOrReplaceTempView("emb_t")
    val self = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM emb_t")
      .as[Double].collect()
    assert(self.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("cosine_sim rejects wrong input types") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.AnalysisException
    Tables.documents(spark, sf).limit(1).createOrReplaceTempView("doc_t")
    intercept[AnalysisException] {
      spark.sql("SELECT cosine_sim(text, text) FROM doc_t").collect()
    }
  }
}
