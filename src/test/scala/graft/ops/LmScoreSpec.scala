package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LmScore against a hand-computed corpus: 2 reference docs + 2
  * held-out docs small enough to evaluate the add-one bigram law by
  * hand (well, by scala.math.log in the test — the CLOSED FORM, not a
  * reimplementation of the operator's plan).
  */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("add-one bigram nll and oov rate match the closed form on a tiny corpus") {
    // reference (ids 0, 10): "a b a", "b a"
    //   bigrams: (a,b) (b,a) (b,a) -> c(a,b)=1, c(b,a)=2
    //   contexts: c(a)=1, c(b)=2; vocabulary V = {a, b} = 2
    // held-out: id 1 "a b x" -> (a,b): seen, (b,x): unseen context-w
    //           id 2 "x y"   -> (x,y): unseen context entirely
    val docs = Seq(
      (0L, "a b a"),
      (10L, "b a"),
      (1L, "a b x"),
      (2L, "x y")
    ).toDF("doc_id", "text")

    val got = LmScore
      .scoreHeldOut(docs, "doc_id", "text", refPred = col("doc_id") % 10 === 0)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)]
      .collect()

    def nll(cuw: Long, cu: Long, v: Long): Double =
      -math.log((cuw + 1).toDouble / (cu + v).toDouble)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    // doc 1: (a,b): (1+1)/(1+2); (b,x): (0+1)/(2+2)
    val d1 = r6((nll(1, 1, 2) + nll(0, 2, 2)) / 2)
    // doc 2: (x,y): (0+1)/(0+2)
    val d2 = r6(nll(0, 0, 2))

    assert(got.map(_._1).toSeq == Seq(1L, 2L))
    assert(got(0)._2 == 2L && got(1)._2 == 1L)
    assert(got(0)._3 == d1, s"${got(0)._3} vs $d1")
    assert(got(1)._3 == d2, s"${got(1)._3} vs $d2")
    assert(got(0)._4 == 0.5 && got(1)._4 == 1.0) // oov rates
  }

  test("reference docs are never scored; all held-out docs with >= 1 bigram are") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
    val out = LmScore.scoreHeldOut(docs, "doc_id", "text", col("doc_id") % 10 === 0)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.forall(_ % 10 != 0))
    val held = docs.filter(col("doc_id") % 10 =!= 0).count()
    assert(ids.size == held) // every held-out doc in this corpus has bigrams
  }
}
