package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim

/** Scale ladder for the native top-k join (VERDICT r8 task 6): the
  * operator's pruning claim — per-query bounded heaps inside the corpus
  * scan, shuffle volume q·k·partitions instead of n·q — implies
  * near-LINEAR runtime in corpus size n at fixed (q, k). Prove it the
  * way SparseCandidateSpec proved the df-cap: run 1×/2×/4× corpus
  * rungs under AQE, assert (a) resultset EQUALITY against the
  * declarative crossJoin+window form at every rung, (b) the measured
  * 4×/1× runtime ratio stays far under the quadratic signature (16×) —
  * the bound is deliberately loose (10×) so JIT/GC noise cannot flake
  * the suite while an accidental n² regression still fails it hard.
  */
class AnnTopKJoinScaleSpec extends SparkSpec {
  import spark.implicits._

  private val K = 5
  private val NQ = 60

  // rung m: the sf0.1 corpus replicated m times with disjoint id ranges
  // and per-replica perturbed vectors (so replicas are near- but not
  // exact duplicates — realistic ANN load, no degenerate all-ties heap)
  private def rung(m: Int): DataFrame = {
    val base = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select($"vec_id", $"embedding")
    (0 until m)
      .map { r =>
        base.select(
          ($"vec_id" + lit(r.toLong * 1000000L)).as("vec_id"),
          transform($"embedding", x => x + lit(r * 0.0625f)).as("embedding"))
      }
      .reduce(_ unionByName _)
  }

  private def queries(corpus: DataFrame) =
    AnnTopKJoin.queriesFrom(corpus.filter($"vec_id" < NQ), "vec_id", "embedding")

  private def declarative(corpus: DataFrame): Array[(Long, Int, Long, Double)] = {
    val c = corpus.select($"vec_id".as("neighbor_id"), $"embedding".as("cv"))
    val q = corpus.filter($"vec_id" < NQ).select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id".asc)
    broadcast(q)
      .crossJoin(c)
      .filter($"neighbor_id" =!= $"query_id")
      .withColumn("sim", round(GraftShim.column(graft.expr.CosineSimilarity(
        GraftShim.expression($"cv"), GraftShim.expression($"qv"))), 4))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= K)
      .select($"query_id", $"rank", $"neighbor_id", $"sim")
      .as[(Long, Int, Long, Double)]
      .collect()
      .sortBy(r => (r._1, r._2))
  }

  test("1x/2x/4x corpus ladder: equality at every rung, no quadratic slope, AQE active") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    val times = Seq(1, 2, 4).map { m =>
      val corpus = rung(m).cache()
      val n = corpus.count() // materialize off the clock
      assert(n == 2000L * m)
      val qs = queries(corpus)
      assert(qs.length == NQ) // queries come from replica 0 only
      val native = AnnTopKJoin.topK(corpus, "vec_id", "embedding", qs, k = K)
      // equality vs the declarative form at THIS rung
      val got = native.as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
      assert(got.toSeq == declarative(corpus).toSeq, s"rung ${m}x diverged")
      // AQE wraps the final rank stage; the native exec is in the plan
      val plan = native.queryExecution.executedPlan.toString
      assert(plan.contains("AdaptiveSparkPlan"), s"AQE absent at rung ${m}x")
      assert(plan.contains("AnnTopKJoin"), s"native exec absent at rung ${m}x")
      // best-of-3 warm runtime of the native path
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        AnnTopKJoin.topK(corpus, "vec_id", "embedding", qs, k = K).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      corpus.unpersist(blocking = false)
      t
    }
    val slope = times(2) / times(0)
    // linear pruning predicts ~4 (plus amortized constants, usually
    // <4); quadratic would be ≥16 — 10 separates them with slack
    assert(slope < 10.0, s"4x/1x runtime ratio $slope suggests superlinear scan: $times")
  }
}
