package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Content-defined chunking laws: exact cover (every char in exactly
  * one chunk), short-doc degeneration to one chunk, identical texts →
  * identical chunk hashes, and boundary INSERTION-STABILITY — a prefix
  * edit leaves the suffix's chunking aligned (the property fixed-size
  * chunking lacks).
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(texts: Seq[(Long, String)], w: Int = 4, m: Int = 4) =
    Cdc
      .chunks(texts.toDF("doc_id", "text"), "doc_id", "text", w, m)
      .as[(Long, Int, Int, String)]
      .collect()
      .toSeq

  test("chunks exactly cover the text, in order, no gaps") {
    val text = "the quick brown fox jumps over the lazy dog and runs away"
    val ch = chunksOf(Seq((1L, text))).sortBy(_._2)
    assert(ch.head._2 === 1, s"first chunk must start at 1: $ch")
    ch.sliding(2).foreach {
      case Seq((_, s1, l1, _), (_, s2, _, _)) =>
        assert(s2 === s1 + l1, s"gap/overlap between chunks: $ch")
      case _ => ()
    }
    assert(ch.map(_._3).sum === text.length, s"cover law broken: $ch")
  }

  test("doc shorter than the window is one whole chunk") {
    val ch = chunksOf(Seq((1L, "ab")))
    assert(ch === Seq((1L, 1, 2, ch.head._4)), s"got $ch")
  }

  test("identical texts produce identical chunk hash multisets") {
    val text = "some repeated content block that chunks the same way twice"
    val ch = chunksOf(Seq((1L, text), (2L, text)))
    val h1 = ch.filter(_._1 == 1L).map(c => (c._2, c._3, c._4)).sorted
    val h2 = ch.filter(_._1 == 2L).map(c => (c._2, c._3, c._4)).sorted
    assert(h1 === h2)
  }

  test("a prefix edit realigns: suffix chunks keep their hashes") {
    val suffix = "zzz common tail content that should keep chunking identically onwards"
    val a = chunksOf(Seq((1L, "X" + suffix)))
    val b = chunksOf(Seq((1L, "completely different and longer prefix material " + suffix)))
    // every chunk fully inside the shared suffix (not touching the last,
    // length-forced boundary) should appear in both chunkings
    def interior(ch: Seq[(Long, Int, Int, String)], prefixLen: Int, total: Int) =
      ch.filter(c => c._2 > prefixLen + 4 && c._2 + c._3 - 1 < total).map(_._4).toSet
    val ia = interior(a, 1, 1 + suffix.length)
    val ib = interior(b, 48, 48 + suffix.length)
    assert(ia.nonEmpty, "test text too short to have interior chunks")
    assert(ia.subsetOf(ib), s"suffix chunks not stable under prefix edit: $ia vs $ib")
  }
}
