package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 retrieval: equality to a brute-force single-window reference,
  * determinism of the ordered score fold, and the retrieval corners
  * (unmatched terms, ties, k larger than the match set).
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // hand-sized corpus: tf and dl vary so scores are distinct per query
  private def corpus = Seq(
    (1L, "hash join hash join hash"),
    (2L, "hash join scan"),
    (3L, "scan scan scan scan scan scan scan scan"),
    (4L, "join"),
    (5L, "window merge window"),
    (6L, "the quick brown fox jumps over the lazy dog")
  ).toDF("doc_id", "text")

  private val queries = Seq(1 -> Seq("hash", "join"), 2 -> Seq("scan"), 3 -> Seq("window"))

  test("matches a brute-force reference: same ranks, same docs, same scores") {
    val got = Bm25
      .search(spark, corpus, "doc_id", "text", queries, k = 10)
      .orderBy($"qid", $"rank")
      .collect()

    // independent reference: plain groupBy-sum + single window
    val terms = queries.flatMap(_._2).distinct
    val post = Bm25.postings(corpus, "doc_id", "text", terms)
    val st = Bm25.fitStats(corpus, "doc_id", "text", terms, post)
    val qdf = queries.flatMap { case (q, ts) => ts.map(t => (q, t, st.idf(t))) }.toDF("qid", "term", "idf")
    val want = post
      .join(qdf, Seq("term"))
      .withColumn(
        "comp",
        $"idf" * ($"tf" * lit(Bm25.K1 + 1.0)) /
          ($"tf" + lit(Bm25.K1) * (lit(1.0 - Bm25.B) + lit(Bm25.B) * $"dl" / lit(st.avgdl)))
      )
      .groupBy($"qid", $"doc_id")
      .agg(sum($"comp").as("score"))
      .withColumn("rank", row_number().over(Window.partitionBy($"qid").orderBy($"score".desc, $"doc_id".asc)).cast("long"))
      .filter($"rank" <= 10)
      .orderBy($"qid", $"rank")
      .collect()

    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getAs[Int]("qid") === w.getAs[Int]("qid"))
      assert(g.getAs[Long]("rank") === w.getAs[Long]("rank"))
      assert(g.getAs[Long]("doc_id") === w.getAs[Long]("doc_id"))
      val (gs, ws) = (g.getAs[Double]("score"), w.getAs[Double]("score"))
      assert(math.abs(gs - ws) <= 1e-12 * math.abs(ws), s"score $gs vs $ws")
    }
  }

  test("idf: rarer terms score higher; unmatched query terms contribute nothing") {
    val terms = Seq("hash", "scan", "window", "zzz_absent")
    val post = Bm25.postings(corpus, "doc_id", "text", terms)
    val st = Bm25.fitStats(corpus, "doc_id", "text", terms, post)
    // df(hash)=2 < df(scan)=2, df(window)=1, absent df=0 → idf monotone in rarity
    assert(st.idf("window") > st.idf("hash"))
    assert(st.idf("zzz_absent") > st.idf("window"))
    // a query with only an absent term returns no rows, not an error
    val got = Bm25.search(spark, corpus, "doc_id", "text", Seq(9 -> Seq("zzz_absent")), k = 5)
    assert(got.count() === 0L)
  }

  test("score ties break by doc_id; k caps the output per query") {
    // docs 10/11 are identical → identical scores for 'alpha'
    val tied = Seq(
      (10L, "alpha beta"),
      (11L, "alpha beta"),
      (12L, "alpha alpha alpha gamma")
    ).toDF("doc_id", "text")
    val out = Bm25
      .search(spark, tied, "doc_id", "text", Seq(1 -> Seq("alpha")), k = 2)
      .orderBy($"rank")
      .collect()
    assert(out.length === 2)
    // doc 12 has highest tf → rank 1; tie between 10/11 broken by id → 10
    assert(out(0).getAs[Long]("doc_id") === 12L)
    assert(out(1).getAs[Long]("doc_id") === 10L)
  }

  test("output is invariant to input partitioning (deterministic fold order)") {
    val a = Bm25.search(spark, corpus, "doc_id", "text", queries, k = 10)
      .collect().map(_.toSeq).toSet
    val b = Bm25.search(spark, corpus.repartition(7), "doc_id", "text", queries, k = 10)
      .collect().map(_.toSeq).toSet
    assert(a === b) // exact equality including the folded double scores
  }
}
