package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Classifier

/** STREAMING deployment of the trained quality/language filter
  * (ops.Classifier): score every incoming document with a FITTED
  * weight vector and keep rows at or above a threshold — how a
  * curation pipeline actually ships a trained filter: train offline
  * (q128's gradient aggregation), then gate ingest online.
  *
  * The model is 4 doubles baked into the plan as literals, so the gate
  * is a STATELESS per-row projection — no shuffle, no state store,
  * append mode — and runs identically on a batch or streaming frame.
  * Score parity is BIT-exact by construction: the gate evaluates the
  * same [[Classifier.probExpr]]∘[[Classifier.zExpr]] column tree over
  * the same [[Classifier.withFeatures]] columns the trainer scored
  * with (rational fast-sigmoid — IEEE-exact arithmetic only), which
  * the parity spec pins across micro-batch boundaries.
  */
object StreamingClassifier {

  /** Append gate output: input rows (id/text pass-through) + `score`,
    * filtered to score ≥ minScore.
    */
  def gate(docs: DataFrame, textCol: String, w: Array[Double], minScore: Double): DataFrame =
    Classifier
      .withFeatures(docs, textCol)
      .withColumn("score", Classifier.probExpr(Classifier.zExpr(w)))
      .drop("x0", "x1", "x2", "x3")
      .filter(col("score") >= minScore)
}
