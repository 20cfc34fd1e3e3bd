package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear-classifier TRAINING via gradient aggregation —
  * the fastText-style quality/language-filter pattern the published
  * curation pipelines (CCNet, DCLM) train over corpus surface
  * statistics, expressed Spark-first: each full-batch gradient-descent
  * iteration is ONE map-side partial aggregate (a fixed-width vector of
  * per-feature gradient sums) reduced to the driver, and the model
  * state broadcast back into the next job as literals. That is the
  * canonical `treeAggregate` shape — gradient width is constant (4
  * doubles here), so at 100 TB each iteration is one scan-speed pass
  * with a scalar-sized shuffle, and the driver holds only the weight
  * vector (bounded model state, the IVF-centroid class).
  *
  * Cross-engine exactness (what makes the training REPLAYABLE by the
  * DuckDB oracle, zero-literal, like the q95 BPE re-train):
  *  - the squashing function is the rational "fast sigmoid"
  *    σ̂(z) = 0.5 + z / (2·(1+|z|)) — add/mul/div/abs only, every step
  *    correctly rounded under IEEE-754, so per-row probabilities are
  *    bit-identical in any conforming engine (no libm exp() whose last
  *    ulp varies across implementations);
  *  - per-row gradient contributions are QUANTIZED to an integer grid,
  *    `floor(g·1e6 + 0.5)` as BIGINT, so the per-iteration sums are
  *    exact integers — associative, partitioning- and engine-
  *    independent (the q96 decimal-sum discipline, in integer form);
  *  - weight updates are one fixed-parenthesization double expression
  *    from those exact sums, so the weight trajectory is bit-equal to
  *    the oracle's CTE-chained replay.
  */
object Classifier {

  val LR = 0.5
  val Quant = 1000000.0

  /** Surface-statistics features only (inference shape — no label):
    * x0 bias, x1 uniq-token ratio, x2 stopword ratio, x3 capped length
    * ratio. All exact-integer numerators over the token count with one
    * double division each — bit-replayable.
    */
  def withFeatures(df: DataFrame, textCol: String): DataFrame = {
    val toks = TextStats.tokens(col(textCol))
    df.withColumn("__toks", toks)
      .withColumn("x0", lit(1.0))
      .withColumn(
        "x1",
        size(array_distinct(col("__toks"))).cast("double") / size(col("__toks")).cast("double")
      )
      .withColumn(
        "x2",
        size(filter(col("__toks"), t => t.isin(TextStats.stopwords: _*))).cast("double") /
          size(col("__toks")).cast("double")
      )
      .withColumn("x3", least(size(col("__toks")).cast("double") / lit(200.0), lit(1.0)))
      .drop("__toks")
  }

  /** Training frame: [[withFeatures]] + label y ∈ {0,1} from
    * `langCol == 'en'` (the language-filter target).
    */
  def features(df: DataFrame, textCol: String, langCol: String): DataFrame =
    withFeatures(df, textCol)
      .withColumn("y", when(col(langCol) === "en", lit(1.0)).otherwise(lit(0.0)))

  /** Left-associated score chain — parenthesization is part of the
    * cross-engine contract (`a + b + c + d` in SQL folds the same way).
    */
  def zExpr(w: Array[Double]): Column =
    lit(w(0)) * col("x0") + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") + lit(w(3)) * col("x3")

  /** Rational fast-sigmoid σ̂(z) = 0.5 + z/(2·(1+|z|)) — IEEE-exact. */
  def probExpr(z: Column): Column =
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  /** Integer-grid quantization of a per-row gradient term. */
  private def quantized(c: Column): Column = floor(c * lit(Quant) + lit(0.5))

  /** Full-batch GD: `iters` scans, each one aggregate of 4 exact
    * integer gradient sums; weights updated driver-side (4 doubles).
    * The feature frame should be persisted by the caller when iters>1.
    */
  def fit(feats: DataFrame, iters: Int): Array[Double] = {
    val n = feats.count().toDouble
    var w = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 0 until iters) {
      val err = probExpr(zExpr(w)) - col("y")
      val sums = feats
        .select((0 to 3).map(k => sum(quantized(err * col(s"x$k"))).as(s"g$k")): _*)
        .head()
      w = (0 to 3).map(k => w(k) - LR * (sums.getLong(k).toDouble / Quant / n)).toArray
    }
    w
  }

  /** Exact quantized Brier-score sum Σ floor((p−y)²·1e6 + 0.5) for a
    * weight vector — the convergence verdict's integer form (order-
    * independent, so both engines agree to the bit).
    */
  def brierQSum(feats: DataFrame, w: Array[Double]): Long = {
    val p = probExpr(zExpr(w))
    val sq = (p - col("y")) * (p - col("y"))
    feats.select(sum(quantized(sq)).as("b")).head().getLong(0)
  }
}
