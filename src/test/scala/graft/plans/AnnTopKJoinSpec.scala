package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim

/** Native top-k join units: equality with the declarative
  * crossJoin+window form (the law the q139 oracle also replays),
  * partition invariance of the heap pruning, the degenerate-fold rule,
  * and the no-exchange-below-the-operator plan shape.
  */
class AnnTopKJoinSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")

  private def declarative(k: Int): Seq[(Long, Int, Long, Double)] = {
    val c = corpus.select($"vec_id".as("neighbor_id"), $"embedding".as("cv"))
    val q = corpus.filter($"vec_id" < 5).select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id".asc)
    broadcast(q)
      .crossJoin(c)
      .filter($"neighbor_id" =!= $"query_id")
      .withColumn(
        "sim",
        round(GraftShim.column(graft.expr.CosineSimilarity(
          GraftShim.expression($"cv"), GraftShim.expression($"qv"))), 4)
      )
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"neighbor_id", $"sim")
      .as[(Long, Int, Long, Double)]
      .collect()
      .sortBy(r => (r._1, r._2))
      .toSeq
  }

  test("native operator equals the declarative crossJoin+window form") {
    val qs = AnnTopKJoin.queriesFrom(corpus.filter($"vec_id" < 5), "vec_id", "embedding")
    val native = AnnTopKJoin
      .topK(corpus, "vec_id", "embedding", qs, k = 7)
      .as[(Long, Int, Long, Double)]
      .collect()
      .sortBy(r => (r._1, r._2))
      .toSeq
    assert(native == declarative(7))
    assert(native.nonEmpty)
  }

  test("heap pruning is invariant under corpus partitioning") {
    val qs = AnnTopKJoin.queriesFrom(corpus.filter($"vec_id" < 5), "vec_id", "embedding")
    val a = AnnTopKJoin.topK(corpus, "vec_id", "embedding", qs, k = 5)
      .collect().map(_.toSeq).toSet
    val b = AnnTopKJoin.topK(corpus.repartition(13), "vec_id", "embedding", qs, k = 5)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("degenerate fold: k=0 and empty query set optimize to an empty LocalRelation") {
    val qs = AnnTopKJoin.queriesFrom(corpus.filter($"vec_id" < 3), "vec_id", "embedding")
    val zeroK = AnnTopKJoin.topK(corpus, "vec_id", "embedding", qs, k = 0)
    assert(zeroK.count() == 0)
    val noQ = AnnTopKJoin.topK(corpus, "vec_id", "embedding", IndexedSeq.empty, k = 5)
    assert(noQ.count() == 0)
    val opt = noQ.queryExecution.optimizedPlan.toString
    assert(!opt.contains("AnnTopKJoin"), s"degenerate node survived optimization:\n$opt")
  }

  test("physical plan: AnnTopKJoinExec present with no Exchange below it") {
    val qs = AnnTopKJoin.queriesFrom(corpus.filter($"vec_id" < 5), "vec_id", "embedding")
    val plan = AnnTopKJoin.topK(corpus, "vec_id", "embedding", qs, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AnnTopKJoin"), s"native exec missing:\n$plan")
    // the only exchange is the final q·k·partitions rank merge ABOVE the
    // operator; below it the corpus is scanned in place
    val below = plan.substring(plan.indexOf("AnnTopKJoin"))
    assert(!below.contains("Exchange"), s"exchange below the operator:\n$below")
  }
}
