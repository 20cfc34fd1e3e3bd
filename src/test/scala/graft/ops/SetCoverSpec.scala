package graft.ops

import graft.SparkSpec

/** Property-pins [[SetCover.greedy]] against a SEQUENTIAL reference
  * fold on randomized corpora: same picks, same gains, same vocab
  * census — including tie-heavy corpora (tiny vocabularies make many
  * docs share the max gain, exercising the lowest-doc-id tie rule) and
  * exhausted universes (rounds > distinct coverage left, where the max
  * gain is 0 and the tie rule alone decides). This is the third
  * implementation of the greedy (Spark distributed, DuckDB oracle
  * replay in q276, and this fold) — the two-engine oracle certifies
  * one corpus; the fold certifies the rule on many.
  */
class SetCoverSpec extends SparkSpec {
  import spark.implicits._

  /** The sequential definition: per round, argmax of |bigrams \ covered|
    * with ties to the lowest doc id.
    */
  private def referenceGreedy(
      docs: Seq[(Long, String)],
      rounds: Int
  ): (Seq[(Long, Long)], Long) = {
    def bigrams(text: String): Set[String] = {
      val ts = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      (0 until math.max(ts.length - 1, 0)).map(i => ts(i) + " " + ts(i + 1)).toSet
    }
    val sets = docs.map { case (id, t) => (id, bigrams(t)) }
    val vocab = sets.flatMap(_._2).toSet.size.toLong
    var covered = Set.empty[String]
    val picks = (1 to rounds).map { _ =>
      val (id, gain) = sets
        .map { case (id, s) => (id, (s -- covered).size.toLong) }
        .minBy { case (id, g) => (-g, id) }
      covered = covered ++ sets.find(_._1 == id).get._2
      (id, gain)
    }
    (picks, vocab)
  }

  private def sparkGreedy(docs: Seq[(Long, String)], rounds: Int): (Seq[(Long, Long)], Long) = {
    val df = docs.toDF("doc_id", "text")
    SetCover.greedy(spark, SetCover.bigramSets(df, "doc_id", "text"), "doc_id", rounds)
  }

  test("random corpora: distributed greedy ≡ sequential fold (picks, gains, vocab)") {
    val rnd = new scala.util.Random(1337)
    // tiny vocabularies on purpose: maximal tie pressure
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    for (trial <- 1 to 6) {
      val nDocs = 5 + rnd.nextInt(20)
      val vocabSlice = 2 + rnd.nextInt(words.length - 2)
      val docs = (1L to nDocs).map { id =>
        val len = 2 + rnd.nextInt(12)
        val text = Seq.fill(len)(words(rnd.nextInt(vocabSlice))).mkString(" ")
        (id, text)
      }
      val rounds = 1 + rnd.nextInt(5)
      val expect = referenceGreedy(docs, rounds)
      val got = sparkGreedy(docs, rounds)
      assert(got == expect, s"trial $trial (nDocs=$nDocs rounds=$rounds): $got != $expect")
    }
  }

  test("exhausted universe: zero-gain rounds fall back to the id tie rule") {
    // one doc covers everything; later rounds all gain 0 and must pick
    // ascending-by-id among the zero-gain docs... which is ALL of them,
    // so round 2 picks the lowest id overall (doc 1 again if distinct
    // picks are not enforced — the operator deliberately allows it,
    // matching the oracle's unconstrained argmax replay)
    val docs = Seq((1L, "x y x y"), (2L, "x y"), (3L, "y x"))
    val (picks, vocab) = sparkGreedy(docs, 3)
    assert(vocab == 2) // {"x y", "y x"}
    assert(picks == referenceGreedy(docs, 3)._1.map(p => (p._1, p._2)))
    assert(picks.head._2 == 2 && picks.tail.forall(_._2 == 0))
    assert(picks.tail.forall(_._1 == 1L)) // zero-gain argmax = lowest id
  }

  test("single-token and empty docs contribute no bigrams but stay pickable") {
    val docs = Seq((7L, "solo"), (8L, ""), (9L, "a b"))
    val (picks, vocab) = sparkGreedy(docs, 2)
    assert(vocab == 1)
    assert(picks == referenceGreedy(docs, 2)._1)
    assert(picks.head == ((9L, 1L)))
  }
}
