package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The prefix lemma's completeness claim, proved against brute force:
  * for thresholds 1/2, 3/5, 4/5 the prefix-filtered join returns
  * EXACTLY the pairs whose token-set Jaccard clears the threshold —
  * no false negatives (the lemma) and no false positives (the exact
  * verify stage).
  */
class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  // deterministic corpus: overlapping token sets of varying sizes
  private val vocab = ('a' to 'z').map(_.toString)
  private def corpus = {
    val rnd = new scala.util.Random(41)
    val random = (1 to 120).map { i =>
      val n = 3 + rnd.nextInt(10)
      val toks = (0 until n).map(_ => vocab(rnd.nextInt(vocab.length))).distinct
      (i.toLong, toks.mkString(" "))
    }
    // planted high-similarity cluster so the t=4/5 rung can't go
    // vacuous: 5 shared tokens ± one edit → J ∈ {1, 5/6, …}
    val planted = Seq(
      (201L, "a b c d e"), (202L, "a b c d e f"), (203L, "e d c b a"),
      (204L, "a b c d g")
    )
    random ++ planted
  }

  private def brute(num: Int, den: Int): Set[(Long, Long)] = {
    val sets = corpus.map { case (id, t) => id -> t.split("\\s+").toSet }
    (for {
      (ia, sa) <- sets
      (ib, sb) <- sets
      if ia < ib
      inter = (sa & sb).size
      uni = (sa | sb).size
      if inter * den >= uni * num
    } yield (ia, ib)).toSet
  }

  test("prefix join equals brute force for t = 1/2, 3/5, 4/5") {
    val df = corpus.toDF("doc_id", "text")
    for ((num, den) <- Seq((1, 2), (3, 5), (4, 5))) {
      val got = PrefixJoin
        .jaccardSelfJoin(df, "doc_id", "text", num, den)
        .select($"id_a", $"id_b")
        .as[(Long, Long)]
        .collect()
        .toSet
      assert(got === brute(num, den), s"t=$num/$den")
      assert(got.nonEmpty, s"vacuous corpus at t=$num/$den")
    }
  }

  test("identical sets always survive any threshold; jaccard_ppm is exact") {
    val df = Seq(
      (1L, "x y z"), (2L, "z y x"), (3L, "x y q"), (4L, "p q r s")
    ).toDF("doc_id", "text")
    val rows = PrefixJoin
      .jaccardSelfJoin(df, "doc_id", "text", 4, 5)
      .select($"id_a", $"id_b", $"jaccard_ppm")
      .as[(Long, Long, Long)]
      .collect()
      .toSet
    assert(rows === Set((1L, 2L, 1000000L))) // (1,3) is J=1/2 < 4/5
  }
}
