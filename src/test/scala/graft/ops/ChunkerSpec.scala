package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Chunker.tokenChunks]]' boundary law on the edges the corpus
  * never exercises: sub-window docs, exact-window docs, one-past-window
  * docs, stride-boundary docs, and the stride == window (no overlap)
  * configuration.
  */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int): (Long, String) = (n.toLong, (1 to n).map(i => s"t$i").mkString(" "))

  private def chunksOf(n: Int, window: Int, stride: Int): Seq[(Int, Long, String)] =
    Chunker
      .tokenChunks(Seq(doc(n)).toDF("doc_id", "text"), "doc_id", "text", window, stride)
      .orderBy(col("chunk_id"))
      .collect()
      .map(r => (r.getAs[Int]("chunk_id"), r.getAs[Long]("n_chunk_tokens"), r.getAs[String]("chunk")))
      .toSeq

  test("sub-window doc: one chunk, the whole doc") {
    assert(chunksOf(3, window = 8, stride = 4) == Seq((0, 3L, "t1 t2 t3")))
  }

  test("exact-window doc: every in-doc start emits, no empty trailing window") {
    val c = chunksOf(8, window = 8, stride = 4)
    // starts 0 and 4 are both < n: chunk 1 is the half-window tail —
    // the standard stride rule (a start inside the doc always emits);
    // start 8 would be an EMPTY window and must not appear
    assert(c.map(x => (x._1, x._2)) == Seq((0, 8L), (1, 4L)))
    assert(c(1)._3 == "t5 t6 t7 t8")
  }

  test("one-past-window: the overlap tail carries the last token") {
    val c = chunksOf(9, window = 8, stride = 4)
    assert(c.map(x => (x._1, x._2)) == Seq((0, 8L), (1, 5L), (2, 1L)))
    assert(c.last._3 == "t9")
  }

  test("stride == window: disjoint cover, token-count conservation") {
    val c = chunksOf(20, window = 8, stride = 8)
    assert(c.map(_._2).sum == 20L) // no overlap: chunks partition the doc
    assert(c.map(x => (x._1, x._2)) == Seq((0, 8L), (1, 8L), (2, 4L)))
  }

  test("overlap accounting: sum of chunk tokens = n + overlap x interior starts") {
    val (window, stride, n) = (32, 24, 100)
    val c = chunksOf(n, window, stride)
    // starts 0,24,48,72,96 → lens 32,32,32,28,4
    assert(c.map(_._2) == Seq(32L, 32L, 32L, 28L, 4L))
    val interiorOverlap = c.init.zip(c.tail).map { case (a, b) =>
      math.max(0L, a._2 - stride) // tokens chunk i shares with chunk i+1
    }.sum
    assert(c.map(_._2).sum == n + interiorOverlap)
  }

  test("chunk text is the exact slice (re-joinable against the source)") {
    val c = chunksOf(10, window = 4, stride = 3)
    val toks = (1 to 10).map(i => s"t$i")
    c.foreach { case (ci, len, text) =>
      assert(text == toks.slice(ci * 3, ci * 3 + len.toInt).mkString(" "))
    }
  }
}
