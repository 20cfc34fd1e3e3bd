package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the engine's native expressions for SQL
  * use (`SELECT cosine_sim(a, b) ...`). Installed by graft.Sessions via
  * `builder.withExtensions(new GraftExtensions)`; external users can set
  * `spark.sql.extensions=graft.expr.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (
        FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(classOf[CosineSimilarity].getCanonicalName, "cosine_sim"),
        (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("hll_distinct"),
        new ExpressionInfo(classOf[HllSketch].getCanonicalName, "hll_distinct"),
        (exprs: Seq[Expression]) => HllSketch(exprs.head).toAggregateExpression()
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("hll_registers"),
        new ExpressionInfo(classOf[HllRegisters].getCanonicalName, "hll_registers"),
        (exprs: Seq[Expression]) => HllRegisters(exprs.head).toAggregateExpression()
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("bloom_agg"),
        new ExpressionInfo(classOf[BloomSketch].getCanonicalName, "bloom_agg"),
        (exprs: Seq[Expression]) => BloomSketch(exprs.head).toAggregateExpression()
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("might_contain"),
        new ExpressionInfo(classOf[BloomMightContain].getCanonicalName, "might_contain"),
        (exprs: Seq[Expression]) => BloomMightContain(exprs(0), exprs(1))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("bounded_levenshtein"),
        new ExpressionInfo(classOf[BoundedLevenshtein].getCanonicalName, "bounded_levenshtein"),
        (exprs: Seq[Expression]) => BoundedLevenshtein(exprs(0), exprs(1), exprs(2))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("jaro_winkler"),
        new ExpressionInfo(classOf[JaroWinkler].getCanonicalName, "jaro_winkler"),
        (exprs: Seq[Expression]) => JaroWinkler(exprs(0), exprs(1))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("jump_hash"),
        new ExpressionInfo(classOf[JumpHash].getCanonicalName, "jump_hash"),
        (exprs: Seq[Expression]) => JumpHash(exprs(0), exprs(1))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("deflate_ratio"),
        new ExpressionInfo(classOf[DeflateRatio].getCanonicalName, "deflate_ratio"),
        (exprs: Seq[Expression]) => DeflateRatio(exprs.head)
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("heavy_hitters"),
        new ExpressionInfo(classOf[MisraGries].getCanonicalName, "heavy_hitters"),
        (exprs: Seq[Expression]) => MisraGries(exprs(0), exprs(1)).toAggregateExpression()
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("tdigest_quantile"),
        new ExpressionInfo(classOf[TDigestQuantile].getCanonicalName, "tdigest_quantile"),
        (exprs: Seq[Expression]) => TDigestQuantile(exprs(0), exprs(1)).toAggregateExpression()
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("count_min"),
        new ExpressionInfo(classOf[CountMinSketch].getCanonicalName, "count_min"),
        (exprs: Seq[Expression]) =>
          CountMinSketch(exprs(0), exprs(1), exprs(2)).toAggregateExpression()
      )
    )
    // whole-operator extension (graft.plans.AnnTopKJoin): logical node →
    // physical plan mapping + the degenerate-operator folding rule
    e.injectPlannerStrategy(_ => graft.plans.AnnTopKJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.DegenerateAnnTopK)
  }
}
