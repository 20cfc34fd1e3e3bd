package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Classifier.fit units: the q128 oracle certifies cross-engine weight
  * parity; these pin the training law itself — separable data is
  * learned, the trajectory is partitioning-invariant, and the Brier
  * verdict moves the right way.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // y = 'en' iff the doc repeats tokens (low uniq ratio) — a separable
  // surface signal for x1
  private def sepDocs(n: Int) =
    (0 until n).map { i =>
      val en = i % 2 == 0
      val text = if (en) "a a a a b b b b" else "q w e r t y u i"
      (i.toLong, text, if (en) "en" else "de")
    }.toDF("doc_id", "text", "lang")

  test("fit separates a separable corpus and improves the Brier sum") {
    val feats = Classifier.features(sepDocs(100), "text", "lang").cache()
    feats.count()
    val w = Classifier.fit(feats, iters = 6)
    val b0 = Classifier.brierQSum(feats, Array(0.0, 0.0, 0.0, 0.0))
    val bt = Classifier.brierQSum(feats, w)
    assert(bt < b0, s"Brier did not improve: $bt >= $b0")
    val p = Classifier.probExpr(Classifier.zExpr(w))
    val acc = feats
      .select((((p >= 0.5) === (col("y") === 1.0)).cast("int")).as("ok"))
      .agg(avg(col("ok")))
      .head()
      .getDouble(0)
    assert(acc == 1.0, s"separable corpus not separated: acc=$acc")
  }

  test("weight trajectory is bit-identical under repartitioning") {
    val d = sepDocs(64)
    val f1 = Classifier.features(d, "text", "lang").cache()
    val f2 = Classifier.features(d.repartition(17), "text", "lang").cache()
    f1.count(); f2.count()
    val w1 = Classifier.fit(f1, iters = 4)
    val w2 = Classifier.fit(f2, iters = 4)
    assert(
      w1.toSeq.map(java.lang.Double.doubleToLongBits) ==
        w2.toSeq.map(java.lang.Double.doubleToLongBits),
      s"trajectory depends on partitioning: ${w1.toSeq} vs ${w2.toSeq}"
    )
  }

  test("zero iterations leave the zero model: p = 0.5 everywhere") {
    val feats = Classifier.features(sepDocs(10), "text", "lang")
    val w = Classifier.fit(feats, iters = 0)
    assert(w.toSeq == Seq(0.0, 0.0, 0.0, 0.0))
    val ps = feats
      .select(Classifier.probExpr(Classifier.zExpr(w)).as("p"))
      .as[Double].collect().toSeq
    assert(ps.forall(_ == 0.5))
  }
}
