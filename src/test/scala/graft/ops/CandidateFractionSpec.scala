package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** MEASURED candidate-fraction scaling for the multiprobe-LSH mining
  * path (q107/q31's geometry) — the falsifiable artifact behind the
  * "production shape" claim: as the corpus grows and
  * [[Similarity.lshParams]] raises nbits, what fraction of the corpus
  * does one anchor's candidate set touch?
  *
  * Two regimes, measured over a ladder of synthetic corpora to n = 2²⁰:
  *
  *  - **q107's own contract (targetCosine 0.4, recall 0.85)**: the
  *    fraction falls ~n^(−1/3) (hyperplane-LSH ρ = ln p_t / ln p_rand ≈
  *    0.67 at cos 0.4) while nbits grows, and FLOORS once the policy's
  *    maxTables backoff pins nbits (≈27% of the corpus at (11, 54)
  *    under the random-pair model). The honest statement — measured
  *    here, replacing the earlier unbounded-collapse wording — is: the
  *    LSH path's per-anchor scoring work shrinks RELATIVE to the exact
  *    pass as n grows, to a floor of a few-× win set by maxTables; the
  *    fixture's inverted cost (q107 slower than exact q91 at n = 2000,
  *    candidates ≈ ⅓ of the corpus) is the bottom of that curve, not
  *    its shape.
  *  - **the high-cosine contract (targetCosine 0.7)**: collision
  *    probability separates much faster per bit (p ≈ 0.75 vs 0.5), so
  *    the fraction genuinely COLLAPSES — measured below 5% by n = 2²⁰
  *    within this ladder — the regime a production miner operates in
  *    once candidates only need to cover the top of the similarity
  *    range.
  *
  * Both ladders also pin the measurement to the closed-form random-pair
  * model fraction = 1 − (1 − (1+nbits)/2^nbits)^tables (radius-1
  * multiprobe on one side), so a banding bug that silently changed the
  * candidate geometry would break the agreement band, not just drift a
  * trend.
  *
  * Measurement shape: the fraction is a per-PAIR collision probability,
  * so it is estimated over anchors × a hash-sampled corpus slice — the
  * geometry (nbits, tables) still comes from the FULL n, but only the
  * sampled rows are sketched and joined. That is what lets the ladder
  * reach 2²⁰ logical rows in unit-test time without materializing an n²
  * pair set (8.4M pair trials per rung bound the estimator's relative
  * error below 1%).
  */
class CandidateFractionSpec extends SparkSpec {

  private val dim = 64
  private val nAnchors = 128
  private val maxSample = 65536L

  /** Deterministic pseudo-random corpus: components ~uniform in [−1, 1]
    * from xxhash64(id, i) — reproducible at any n with no driver-side
    * generation. */
  private def corpus(ids: DataFrame): DataFrame =
    ids.select(
      col("id").as("vec_id"),
      transform(
        sequence(lit(1), lit(dim)),
        i =>
          (pmod(xxhash64(col("id"), i), lit(1000003L)).cast("double") / lit(500001.5) - 1.0)
            .cast("float")
      ).as("embedding")
    )

  /** Mean fraction of the corpus in one anchor's candidate set — the
    * q107/q31 candidate geometry (radius-1 multiprobe on the anchor
    * side, exact buckets on the corpus side, distinct pairs), estimated
    * as anchor × sampled-corpus collision probability. Anchors are
    * excluded from the sampled side so the trial count is exact. */
  private def measuredFraction(n: Long, nbits: Int, tables: Int): Double = {
    val d = math.max(1L, n / maxSample)
    val ids = spark
      .range(n)
      .toDF()
      .filter(col("id") < nAnchors || (col("id") >= nAnchors && pmod(col("id"), lit(d)) === 0))
    val idx = Similarity
      .bucketIndex(corpus(ids), "vec_id", "embedding", nbits, tables, dim)
      .persist(StorageLevel.MEMORY_AND_DISK)
    idx.count() // eager: both join sides share this cache
    val probed = array(
      (col("bucket") +: (0 until nbits).map(j => col("bucket").bitwiseXOR(lit(1L << j)))).toIndexedSeq: _*
    )
    val aSide = idx
      .filter(col("vec_id") < nAnchors)
      .select(col("tbl"), explode(probed).as("bucket"), col("vec_id").as("anchor"))
    val bSide = idx.filter(col("vec_id") >= nAnchors).select(col("tbl"), col("bucket"), col("vec_id").as("other"))
    val nTrialIds = bSide.select(col("other")).distinct().count()
    val nCands = bSide
      .join(broadcast(aSide), Seq("tbl", "bucket"))
      .select(col("anchor"), col("other"))
      .distinct()
      .count()
    idx.unpersist()
    nCands.toDouble / (nAnchors.toDouble * nTrialIds.toDouble)
  }

  /** Random-pair collision model: P(Hamming(sketch_a, sketch_b) ≤ 1 in
    * some table) for a pair at cosine ≈ 0 (each sign bit agrees w.p.
    * 1/2). Finite dim spreads pair cosines around 0 (σ ≈ 1/√dim), and
    * collision probability is convex in the cosine, so measurements run
    * somewhat ABOVE this model — the agreement band below allows for
    * that margin (≈1.1–1.4× at dim 64), not for geometry bugs. */
  private def modelFraction(nbits: Int, tables: Int): Double = {
    val pRand = (1.0 + nbits) / math.pow(2.0, nbits)
    1.0 - math.pow(1.0 - pRand, tables)
  }

  private def ladder(targetCosine: Double, ns: Seq[Long]): Seq[(Long, Int, Int, Double, Double)] =
    ns.map { n =>
      val (nbits, tables) = Similarity.lshParams(n, targetCosine, probeHamming = 1)
      val got = measuredFraction(n, nbits, tables)
      val model = modelFraction(nbits, tables)
      info(f"cos=$targetCosine n=$n%7d (nbits=$nbits%2d, tables=$tables%2d): measured=$got%.4f model=$model%.4f")
      (n, nbits, tables, got, model)
    }

  test("q107 regime (cos 0.4): candidate fraction shrinks with n as the model predicts") {
    val rungs = ladder(0.4, Seq(2048L, 16384L, 131072L))
    // nbits must actually grow along the ladder (the policy's point)
    assert(rungs.map(_._2) == rungs.map(_._2).sorted && rungs.map(_._2).distinct.size == rungs.size)
    // the fraction strictly shrinks even though tables grow to hold recall
    val fracs = rungs.map(_._4)
    assert(fracs.zip(fracs.tail).forall { case (a, b) => b < a },
      s"candidate fraction must shrink with n, got $fracs")
    // and tracks the closed-form model (measured sits above cos≈0 model
    // by the finite-dim convexity margin, never below half of it)
    rungs.foreach { case (n, _, _, got, model) =>
      assert(got > model * 0.5 && got < model * 2.0,
        s"n=$n: measured $got vs model $model outside [0.5x, 2x]")
    }
  }

  test("high-cosine regime (cos 0.7): candidate fraction collapses below 5%") {
    val rungs = ladder(0.7, Seq(2048L, 16384L, 131072L, 1048576L))
    val fracs = rungs.map(_._4)
    assert(fracs.zip(fracs.tail).forall { case (a, b) => b < a },
      s"candidate fraction must shrink with n, got $fracs")
    assert(fracs.last < 0.05,
      s"top rung (n=2^20) must score <5% of the corpus per anchor, got ${fracs.last}")
    rungs.foreach { case (n, _, _, got, model) =>
      assert(got > model * 0.5 && got < model * 2.0,
        s"n=$n: measured $got vs model $model outside [0.5x, 2x]")
    }
  }
}
