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

  test("two cosine_sim instances in one projection compile under CODEGEN_ONLY") {
    // Regression: doGenCode used fixed local names (n, dot, ...); with
    // non-nullable children nullSafeExec adds no scoping braces, so two
    // instances in one generated scope redeclared the locals — Janino
    // CompileException, silent interpreted fallback. freshName fixes it.
    val conf = spark.conf
    val prevFallback = conf.get("spark.sql.codegen.fallback", "true")
    val prevFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      // non-nullable non-null arrays of primitives: the no-braces path
      val df = Seq((Array(1f, 2f), Array(2f, 1f), Array(0f, 1f)))
        .toDF("a", "b", "c")
      val r = df
        .select(
          Similarity.cosine(col("a"), col("b")).as("s1"),
          Similarity.cosine(col("a"), col("c")).as("s2")
        )
        .collect()
        .head
      assert(math.abs(r.getDouble(0) - 0.8) < 1e-9)
      assert(math.abs(r.getDouble(1) - 2.0 / math.sqrt(5.0) / 1.0) < 1e-9)
    } finally {
      conf.set("spark.sql.codegen.fallback", prevFallback)
      conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
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
