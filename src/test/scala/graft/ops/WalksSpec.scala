package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic-walk laws: corpus shape (steps+1 rows per walker),
  * single-out-edge graphs walk the forced path, dead ends absorb, and
  * the choice rule is replayable (two runs agree).
  */
class WalksSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(
      edges: Seq[(Long, Long)],
      starts: Seq[Long],
      steps: Int): Seq[(Long, Long, Int)] =
    Walks
      .deterministicWalks(edges.toDF("src", "dst"), starts.toDF("node"), steps)
      .select(col("walker"), col("node"), col("step"))
      .as[(Long, Long, Int)]
      .collect()
      .toSeq

  test("forced path: a chain is walked in order") {
    val got = corpus(Seq((1L, 2L), (2L, 3L), (3L, 4L)), Seq(1L), 3)
      .sortBy(_._3)
      .map(_._2)
    assert(got === Seq(1L, 2L, 3L, 4L))
  }

  test("dead end absorbs: walker stays put once out-edges run out") {
    val got = corpus(Seq((1L, 2L)), Seq(1L), 4).sortBy(_._3).map(_._2)
    assert(got === Seq(1L, 2L, 2L, 2L, 2L))
  }

  test("corpus has exactly steps+1 rows per walker") {
    val got = corpus(Seq((1L, 2L), (2L, 1L), (5L, 6L), (6L, 5L)), Seq(1L, 5L), 6)
    assert(got.size === 2 * 7)
    assert(got.groupBy(_._1).values.forall(_.map(_._3).sorted == (0 to 6)))
  }

  test("replayable: two runs produce the identical corpus") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 1L), (3L, 1L), (3L, 2L))
    val a = corpus(edges, Seq(1L, 2L, 3L), 5).sorted
    val b = corpus(edges, Seq(1L, 2L, 3L), 5).sorted
    assert(a === b)
  }

  test("branching choice depends on the step index (hash mixes s)") {
    // from node 1 with out-edges to 2 and 3 both returning to 1, an
    // 8-step walk oscillates by hash — it must visit BOTH neighbors
    // at least once across steps (astronomically unlikely otherwise
    // unless the step index were ignored and the walk were periodic)
    val got = corpus(Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)), Seq(1L), 8)
    val visited = got.map(_._2).toSet
    assert(visited === Set(1L, 2L, 3L), s"got $visited")
  }
}
