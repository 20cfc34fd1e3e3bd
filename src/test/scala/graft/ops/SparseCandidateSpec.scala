package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MEASURED scaling ladder for q112's df-cap claim (the
  * CandidateFractionSpec discipline: a 100 TB scaling argument is a
  * curve, not an adjective). The claim under test: on a Zipf-ish
  * corpus, UNCAPPED inverted-index pair work Σ C(df,2) grows
  * quadratically with corpus size N (head features occur in nearly
  * every doc), while work under a CONSTANT df-cap C is bounded by
  * C·|postings| — linear in N unconditionally, since
  * Σ_{df≤C} df² ≤ C·Σ_{df≤C} df ≤ C·|postings|.
  *
  * History (round 7): the first shipped cap was scale-following
  * (greatest(5, N/100)). THIS ladder measured its capped work/doc
  * inflating ~3.45× per 4× rung — head features saturate at df = N/100,
  * so Σdf² stays ~quadratic — and the cap was replaced by the constant.
  * The ladder now pins the constant-cap law the operator ships with.
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
  private val Cap = 64.0 // q112/q114's shipped constant df-cap

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

  /** (uncapped work, capped work) = Σ C(df,2) over all / df≤Cap features. */
  private def work(n: Int): (Double, Double) = {
    val df = SparseSim
      .distinctFeatures(corpus(n), "doc_id", "text", n = 1)
      .groupBy($"feature")
      .agg(count(lit(1)).cast("double").as("df"))
    val row = df
      .agg(
        sum($"df" * ($"df" - 1) / 2).as("uncapped"),
        sum(when($"df" <= Cap, $"df" * ($"df" - 1) / 2).otherwise(0.0)).as("capped")
      )
      .head()
    (row.getDouble(0), row.getDouble(1))
  }

  test("constant df-cap turns quadratic pair work linear across a 16x corpus ladder") {
    val rungs = Seq(1 << 10, 1 << 12, 1 << 14).map(n => n -> work(n))
    val Seq((n0, (u0, c0)), (n1, (u1, c1)), (n2, (u2, c2))) = rungs
    info(f"n=$n0%6d uncapped=$u0%14.0f capped=$c0%12.0f capped/doc=${c0 / n0}%8.1f")
    info(f"n=$n1%6d uncapped=$u1%14.0f capped=$c1%12.0f capped/doc=${c1 / n1}%8.1f")
    info(f"n=$n2%6d uncapped=$u2%14.0f capped=$c2%12.0f capped/doc=${c2 / n2}%8.1f")
    // uncapped: head features have df ~ N, so work ~ N² — each 4× rung
    // should multiply work by well over the linear 4× (observed ~16×)
    assert(u1 / u0 > 8.0, s"uncapped rung 1 grew only ${u1 / u0}x")
    assert(u2 / u1 > 8.0, s"uncapped rung 2 grew only ${u2 / u1}x")
    // capped: Σ_{df≤C} df² ≤ C·|postings| gives a HARD per-doc bound of
    // C·L = 1280 at any N; and on a Zipf corpus the realized per-doc
    // work must not INFLATE across rungs (features migrate over the
    // constant cap as N grows, so it flattens or falls — the linear
    // claim is that it does not grow)
    assert(c0 / n0 <= Cap * L, s"per-doc work ${c0 / n0} exceeds the C*L bound")
    assert(c2 / n2 <= Cap * L, s"per-doc work ${c2 / n2} exceeds the C*L bound")
    assert((c1 / n1) / (c0 / n0) < 1.2, s"capped work/doc inflated ${(c1 / n1) / (c0 / n0)}x")
    assert((c2 / n2) / (c1 / n1) < 1.2, s"capped work/doc inflated ${(c2 / n2) / (c1 / n1)}x")
    // and the cap must be doing real pruning, not vacuously passing
    assert(c2 < u2 / 10.0)
  }

  test("df-derived work equals the operator's actual candidate stream (smallest rung)") {
    val n = 1 << 10
    val (_, cappedWork) = work(n)
    val post = SparseSim.postings(corpus(n), "doc_id", "text", n = 1, dfCap = lit(Cap))
    val streamed = SparseSim
      .allPairs(post, "doc_id", threshold = 0.0)
      .agg(sum($"n_shared"))
      .head()
      .getLong(0)
    assert(streamed.toDouble === cappedWork)
  }
}
