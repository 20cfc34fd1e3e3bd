package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("applyMerge fuses left-to-right without overlap") {
    val df = Seq(
      (Seq("a", "a", "a"), "aaa"),
      (Seq("a", "a", "a", "a"), "aaaa"),
      (Seq("b", "a", "a"), "baa")
    ).toDF("tokens", "tag")
    val got = df
      .select($"tag", Bpe.applyMerge($"tokens", "a", "a").as("m"))
      .as[(String, Seq[String])]
      .collect()
      .toMap
    // greedy non-overlapping: aaa -> [aa, a]; aaaa -> [aa, aa]
    assert(got("aaa") === Seq("aa", "a"))
    assert(got("aaaa") === Seq("aa", "aa"))
    assert(got("baa") === Seq("b", "aa"))
  }

  test("applyMerges folds in merge order (later merges see earlier fusions)") {
    val df = Seq(Seq("a", "b", "c")).toDF("tokens")
    val fused = df
      .select(Bpe.applyMerges($"tokens", Seq(("a", "b"), ("ab", "c"))).as("m"))
      .as[Seq[String]]
      .head()
    assert(fused === Seq("abc"))
    // the second merge depends on the first having fired; reversed
    // order leaves the tokens unfused past step 1
    val rev = df
      .select(Bpe.applyMerges($"tokens", Seq(("ab", "c"), ("a", "b"))).as("m"))
      .as[Seq[String]]
      .head()
    assert(rev === Seq("ab", "c"))
  }

  test("encode law: applyMerges on char-split words reproduces the trainer's final state") {
    val docs = Seq("the cat sat on the mat", "the cat ran", "a cat sat")
      .toDF("text")
    val (merges, finalWords) = Bpe.trainMerges(docs, "text", 5)
    val seq = merges.map(m => (m._2, m._3))
    val reEncoded = finalWords
      .select($"word", Bpe.applyMerges(split($"word", ""), seq).as("enc"))
      .as[(String, Seq[String])]
      .collect()
      .toMap
    val trained = finalWords
      .select($"word", $"tokens")
      .as[(String, Seq[String])]
      .collect()
      .toMap
    assert(reEncoded === trained)
  }

  test("trainMerges reproduces the classic low/lower/lowest merge order") {
    val docs = Seq("low low low lower lowest").toDF("text")
    val (merges, _) = Bpe.trainMerges(docs, "text", 4)
    // pair counts round 1: (l,o)=5, (o,w)=5, others <=2; tie breaks to
    // (l,o) on left asc. Then (lo,w)=5, (low,e)=2, (lowe,r)=1 (right
    // asc beats (lowe,s)).
    assert(merges === Seq(
      (1, "l", "o", 5L),
      (2, "lo", "w", 5L),
      (3, "low", "e", 2L),
      (4, "lowe", "r", 1L)
    ))
  }

  test("trainMerges stops when no adjacent pairs remain") {
    val docs = Seq("ab ab ab").toDF("text")
    val (merges, finalWords) = Bpe.trainMerges(docs, "text", 5)
    assert(merges === Seq((1, "a", "b", 3L)))
    val toks = finalWords.select($"tokens").as[Seq[String]].collect()
    assert(toks.forall(_ == Seq("ab")))
  }

  test("greedy invariant: residual pairs never out-count the last merge") {
    val docs = Seq("the cat sat on the mat", "the cat ran", "a cat sat")
      .toDF("text")
    val (merges, finalWords) = Bpe.trainMerges(docs, "text", 3)
    val residual = Bpe
      .pairCounts(finalWords, "tokens", "weight")
      .agg(coalesce(max($"freq"), lit(0L)))
      .head()
      .getLong(0)
    assert(merges.nonEmpty)
    assert(residual <= merges.last._4)
  }
}
