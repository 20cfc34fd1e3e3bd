package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source-mixture policy operators — the "how much of each source goes
  * into the training set" decisions every published LLM corpus makes:
  * temperature-scaled sampling rates (mC4's alpha-sampling, Conneau &
  * Lample's p_i^α rebalancing) and UniMax-style epoch-capped uniform
  * budget allocation (Chung et al. 2023): spread a token budget as
  * evenly as possible across sources, never taking more than `k` epochs
  * of any one source.
  *
  * Both operators follow the bounded-model-state discipline (the IVF
  * centroid class): the per-source statistics frame is |sources| rows —
  * a scalar-sized driver collect — while every per-document decision
  * (sample membership) stays distributed. Cross-engine exactness:
  *  - temperature α = 1/2 is computed with `sqrt`, which IEEE-754
  *    requires to be CORRECTLY ROUNDED (unlike `pow`, whose last ulp is
  *    implementation-defined libm behavior) — so per-source weights are
  *    bit-identical in any conforming engine;
  *  - the weight normalizer folds in source-name order (an ordered left
  *    fold, not an unordered SUM), so the double sum is associativity-
  *    proof: Scala's fold and DuckDB's `list_reduce` land on the same
  *    bits;
  *  - budget water-filling is pure integer arithmetic — no floats at
  *    all.
  */
object Mixture {

  /** Per-source temperature-sampling plan at α = 1/2: sampling
    * probability p_i = sqrt(c_i) / Σ_j sqrt(c_j) (sqrt flattens the
    * source-size distribution — the standard low-resource upweighting),
    * target row counts for a corpus-half budget, and the deterministic
    * sample membership: per source, the `target` docs with the smallest
    * (portableHash(id), id) — a keyed pseudo-random draw that any
    * engine can replay with a rank window.
    *
    * Returns (plan, sampled): `plan` is |sources| rows of policy;
    * `sampled` is the distributed membership frame. The per-source rank
    * uses [[Rank.rankWithin]]'s range-binned two-pass, so no source —
    * however large at 100 TB — ever funnels through a single window
    * task; the oracle replays the plain `row_number()` definition the
    * two-pass provably equals.
    */
  def temperaturePlan(
      docs: DataFrame,
      idCol: String,
      sourceCol: String
  ): (DataFrame, DataFrame) = {
    val s = docs.sparkSession
    import s.implicits._
    val counts = docs
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"))
      .select(col(sourceCol).cast("string"), col("n_docs"))
      .as[(String, Long)]
      .collect()
      .sortBy(_._1) // source-name order defines the normalizer fold
    val total = counts.map(_._2).sum
    val budget = total / 2
    // ordered left fold — the parenthesization IS the contract
    val norm = counts.foldLeft(0.0) { case (acc, (_, c)) => acc + math.sqrt(c.toDouble) }
    val plan = counts.map { case (src, c) =>
      val p = math.sqrt(c.toDouble) / norm
      val target = math.floor(budget.toDouble * p).toLong
      (src, c, math.floor(p * 1000000.0).toLong, target)
    }
    val planDf = s
      .createDataset(plan.toSeq)
      .toDF(sourceCol, "n_docs", "p_ppm", "target_n")
    val ranked = Rank.rankWithin(
      docs.select(col(idCol), col(sourceCol)),
      Seq(sourceCol),
      TextStats.portableHash(col(idCol)),
      col(idCol),
      "__rk"
    )
    val sampled = ranked
      .join(broadcast(planDf.select(col(sourceCol), col("target_n"))), Seq(sourceCol))
      .filter(col("__rk") <= col("target_n"))
      .drop("target_n")
    (planDf, sampled)
  }

  /** UniMax water-filling in EXACT INTEGER arithmetic: allocate token
    * budget B across sources as uniformly as possible, subject to
    * alloc_i ≤ cap_i. Sources too small to absorb the uniform share
    * saturate at their cap; the leftover re-levels across the rest.
    * The classic closed form over sources sorted by cap ascending:
    * the saturated set is the largest prefix where
    * cap_j · (remaining sources) ≤ remaining budget; everyone after
    * the prefix gets the integer level, with the division remainder
    * granted one extra token each to the first sources in cap order
    * (fully deterministic — no floats, no randomness).
    *
    * `caps` is |sources| rows — computed by one distributed aggregate,
    * water-filled driver-side (bounded model state), result broadcast
    * back by the caller. Requires B ≤ Σ cap (else the plan is "take
    * everything" and the level path is undefined); callers derive B
    * from Σ cap so this holds by construction.
    */
  def waterfill(caps: Seq[(String, Long)], budget: Long): Seq[(String, Long, Long, Boolean)] = {
    require(caps.nonEmpty, "waterfill needs at least one source")
    val sorted = caps.sortBy { case (src, cap) => (cap, src) }
    val n = sorted.size
    var remaining = budget
    var level = 0L
    var rem = 0L
    var cut = n // first non-saturated index
    var i = 0
    var found = false
    while (i < n && !found) {
      val left = n - i
      if (sorted(i)._2 * left <= remaining) {
        remaining -= sorted(i)._2
        i += 1
      } else {
        cut = i
        level = remaining / left
        rem = remaining % left
        found = true
      }
    }
    if (!found) cut = n // budget >= sum of caps: everyone saturates
    sorted.zipWithIndex.map { case ((src, cap), j) =>
      if (j < cut) (src, cap, cap, true)
      else {
        val extra = if ((j - cut) < rem) 1L else 0L
        (src, cap, level + extra, false)
      }
    }
  }

  /** Per-source token budget plan: token counts from one distributed
    * aggregate, B = ⌊0.9 · Σ tokens⌋, cap = 1 epoch (a source's own
    * size), water-filled by [[waterfill]]. Output in integer units plus
    * an epochs-ppm rider (exact integer division — engine-portable).
    */
  def tokenBudgetPlan(docs: DataFrame, textCol: String, sourceCol: String): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = docs
      .groupBy(col(sourceCol))
      .agg(sum(size(TextStats.tokens(col(textCol))).cast("long")).as("n_tokens"))
      .select(col(sourceCol).cast("string"), col("n_tokens"))
      .as[(String, Long)]
      .collect()
      .toSeq
    val totalTokens = toks.map(_._2).sum
    val budget = totalTokens * 9L / 10L
    val alloc = waterfill(toks, budget)
    s.createDataset(alloc.map { case (src, cap, a, sat) =>
      // BigInt: a·1e6 overflows Long past ~9.2e12 tokens/source — this is
      // |sources|-row driver arithmetic, so exactness costs nothing
      (src, cap, budget, a, sat, (BigInt(a) * 1000000 / BigInt(cap)).toLong)
    }).toDF(sourceCol, "n_tokens", "budget", "allocated", "saturated", "epochs_ppm")
  }
}
