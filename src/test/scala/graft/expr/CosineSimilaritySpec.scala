package graft.expr

import graft.{SparkSpec, Tables}
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Native expression vs composed reference, SQL registration, nulls. */
class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native cosine is bit-identical to the composed form on real embeddings") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    val both = e
      .crossJoin(q)
      .select(
        Similarity.cosine(col("embedding"), col("q")).as("native"),
        Similarity.cosineComposed(col("embedding"), col("q")).as("composed")
      )
      .collect()
    both.foreach { r =>
      assert(
        java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1))
      )
    }
    assert(both.length == 500)
  }

  test("cosine_sim is registered for SQL via GraftExtensions") {
    Tables.embeddings(spark, "/root/testdata/sf0.001").createOrReplaceTempView("emb")
    val r = spark
      .sql("""SELECT cosine_sim(a.embedding, b.embedding) AS s
             |FROM emb a JOIN emb b ON b.vec_id = a.vec_id""".stripMargin)
      .agg(min("s"), max("s"))
      .collect()
      .head
    // self-cosine is 1.0 up to float rounding
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-6 && math.abs(r.getDouble(1) - 1.0) < 1e-6)
  }

  test("null input yields null; wrong type fails analysis") {
    val df = Seq((Some(Array(1f, 0f)), None: Option[Array[Float]])).toDF("a", "b")
    val out = df.select(Similarity.cosine(col("a"), col("b"))).collect().head
    assert(out.isNullAt(0))
    val bad = Seq((1, 2)).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(Similarity.cosine(col("a"), col("b"))).collect()
    }
  }
}
