package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MEASURED scaling ladder for q112's df-cap claim (the
  * CandidateFractionSpec discipline: a 100 TB scaling argument is a
  * curve, not an adjective). The claim under test: on a Zipf-ish
  * corpus, UNCAPPED inverted-index pair work Σ C(df,2) grows
  * quadratically with corpus size N (head features occur in nearly
  * every doc), while the df-capped work grows linearly-ish — the cap
  * is what makes the operator a 100 TB candidate at all.
  *
  * Corpus: deterministic log-uniform (≈ Zipf s=1) token draws — token
  * rank = ⌊V^u⌋ with u from the portable multiplicative hash, so the
  * ladder is reproducible to the bit. Work is computed FROM THE df
  * TABLE (arithmetic, nothing materialized), then cross-checked
  * against the operator's actual join output at the smallest rung.
  */
class SparseCandidateSpec extends SparkSpec {
  import spark.implicits._

  private val V = 4096 // vocabulary size
  private val L = 20 // tokens per doc

  /** log-uniform token rank in [1, V]: P(rank ≤ r) = ln r / ln V. */
  private def tokenAt(doc: Long, k: Int): Int = {
    val h = (((doc * 131 + k) * 2654435761L) % 1000003L + 1000003L) % 1000003L
    val u = (h + 0.5) / 1000003.0
    math.min(V, math.max(1, math.pow(V.toDouble, u).toInt))
  }

  private def corpus(n: Int) =
    (0L until n.toLong)
      .map(i => (i, (0 until L).map(k => "t" + tokenAt(i, k)).mkString(" ")))
      .toDF("doc_id", "text")

  /** (uncapped work, capped work) = Σ C(df,2) over all / df≤cap features. */
  private def work(n: Int): (Double, Double) = {
    val cap = math.max(5.0, n / 100.0)
    val df = SparseSim
      .distinctFeatures(corpus(n), "doc_id", "text", n = 1)
      .groupBy($"feature")
      .agg(count(lit(1)).cast("double").as("df"))
    val row = df
      .agg(
        sum($"df" * ($"df" - 1) / 2).as("uncapped"),
        sum(when($"df" <= cap, $"df" * ($"df" - 1) / 2).otherwise(0.0)).as("capped")
      )
      .head()
    (row.getDouble(0), row.getDouble(1))
  }

  test("df-cap turns quadratic pair work linear-ish across a 16x corpus ladder") {
    val rungs = Seq(1 << 10, 1 << 12, 1 << 14).map(n => n -> work(n))
    val Seq((n0, (u0, c0)), (n1, (u1, c1)), (n2, (u2, c2))) = rungs
    info(f"n=$n0%6d uncapped=$u0%14.0f capped=$c0%12.0f")
    info(f"n=$n1%6d uncapped=$u1%14.0f capped=$c1%12.0f")
    info(f"n=$n2%6d uncapped=$u2%14.0f capped=$c2%12.0f")
    // uncapped: head features have df ~ N, so work ~ N² — each 4× rung
    // should multiply work by well over the linear 4× (observed ~16×)
    assert(u1 / u0 > 8.0, s"uncapped rung 1 grew only ${u1 / u0}x")
    assert(u2 / u1 > 8.0, s"uncapped rung 2 grew only ${u2 / u1}x")
    // capped: per-doc work stays bounded — work/N may not inflate by
    // more than ~2.5x across a 4x rung (linear-ish; the cap itself
    // scales with N/100, so some super-linearity is by design)
    assert((c1 / n1) / (c0 / n0) < 2.5, s"capped work/doc inflated ${(c1 / n1) / (c0 / n0)}x")
    assert((c2 / n2) / (c1 / n1) < 2.5, s"capped work/doc inflated ${(c2 / n2) / (c1 / n1)}x")
    // and the cap must be doing real pruning, not vacuously passing
    assert(c2 < u2 / 10.0)
  }

  test("df-derived work equals the operator's actual candidate stream (smallest rung)") {
    val n = 1 << 10
    val cap = math.max(5.0, n / 100.0)
    val (_, cappedWork) = work(n)
    val post = SparseSim.postings(corpus(n), "doc_id", "text", n = 1, dfCap = lit(cap))
    val streamed = SparseSim
      .allPairs(post, "doc_id", threshold = 0.0)
      .agg(sum($"n_shared"))
      .head()
      .getLong(0)
    assert(streamed.toDouble === cappedWork)
  }
}
