package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MEASURED scaling ladder for the Borůvka/single-link family (VERDICT
  * r9 task 4): q283/q292 are the registry's heaviest new shape and
  * shipped with correctness rungs (BoruvkaSpec) but no measured scaling
  * law. Prove the two claims the operator's 100 TB story rests on, the
  * way SparseCandidateSpec proved the df-cap and AnnTopKJoinScaleSpec
  * proved heap pruning:
  *
  *  1. COMPONENT HALVING — after r rounds every surviving component
  *     holds ≥ 2^r nodes (each round every component merges across its
  *     minimum incident edge), so on a connected n-node graph the live
  *     component count is ≤ ⌈n/2^r⌉ and the hook frame (one chosen
  *     pointer per component) shrinks at least as fast. Deterministic,
  *     asserted EXACTLY per round.
  *  2. LINEAR PER-ROUND WORK — at a fixed round count the work is
  *     rounds × O(|E|) (two label joins + one min-struct agg per
  *     round), so a 4× edge ladder must show a far-sub-quadratic
  *     wall-clock slope. The bound is deliberately loose (10× for a 4×
  *     rung, quadratic signature = 16×) so GC/JIT noise cannot flake
  *     the suite while an accidental O(|E|²) candidate explosion still
  *     fails it hard; the measured slopes ride in the assert message.
  *
  * Corpus: a deterministic path graph i —— i+1 with multiplicative-hash
  * weights — connected (so halving never stalls on exhausted
  * components) and reproducible to the bit.
  */
class BoruvkaScaleSpec extends SparkSpec {
  import spark.implicits._

  private def pathGraph(n: Int): DataFrame =
    (0L until (n - 1).toLong)
      .map(i => (i, i + 1, ((i * 2654435761L) % 1000003L + 1000003L) % 1000003L))
      .toDF("src", "dst", "w")

  private def compCount(labels: DataFrame): Long =
    labels.select($"comp").distinct().count()

  test("component count halves per round on a connected path graph") {
    val n = 4096
    val e = pathGraph(n)
    (1 to 3).foreach { r =>
      val (_, labels) = Boruvka.forestWithLabels(e, rounds = r)
      val c = compCount(labels)
      info(f"rounds=$r components=$c%5d bound=${n / (1 << r)}%5d")
      assert(c <= n / (1 << r),
        s"after $r rounds $c components remain — halving law broken (bound ${n / (1 << r)})")
    }
    // and full rounds produce the spanning tree: n-1 edges, 1 component
    val (forest, labels) = Boruvka.forestWithLabels(e, rounds = 12)
    assert(forest.count() == (n - 1).toLong)
    assert(compCount(labels) == 1L)
  }

  test("1x/2x/4x edge ladder at fixed rounds: wall-clock slope stays far under quadratic") {
    val rounds = 4
    def run(n: Int): Double = {
      val e = pathGraph(n).cache()
      e.count() // materialize the input off the clock
      // warm + best-of-2: single-JVM wall measurements carry JIT/GC
      // noise; the min of two warm runs is stable enough for a 10x gate
      Boruvka.forestWithLabels(e, rounds)._2.count()
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val (f, l) = Boruvka.forestWithLabels(e, rounds)
        val nf = f.count(); val nc = l.select($"comp").distinct().count()
        assert(nf >= (n / 2 - 1).toLong) // rounds=4 merges ≥ 15/16 of nodes
        assert(nc <= (n / (1 << rounds)).toLong, s"halving law broken at n=$n ($nc comps)")
        (System.nanoTime() - t0) / 1e9
      }.min
      e.unpersist(blocking = false)
      t
    }
    val ns = Seq(1 << 12, 1 << 13, 1 << 14)
    val times = ns.map(run)
    ns.zip(times).foreach { case (n, t) => info(f"n=$n%6d wall=$t%6.2f s") }
    val slope = times(2) / times(0)
    assert(slope < 10.0,
      f"4x/1x wall ratio $slope%.2f (times ${times.map(t => f"$t%.2f").mkString("/")}) " +
        "suggests superlinear per-round work")
  }
}
