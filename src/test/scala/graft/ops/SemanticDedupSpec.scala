package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SemanticDedup: the shared-cell keep rule matches a brute-force
  * reference wherever the quantizer co-cells the pair, the kept set is
  * τ-separated within every cell, and soft assignment emits exactly m
  * cells per vector.
  */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  /** Planted clusters with exact duplicates: base direction per cluster,
    * members are tiny jitters of it — within-cluster cosine ≈ 1, across
    * clusters ≈ 0.
    */
  private def corpus(n: Int, k: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(11)
    (0 until n).map { i =>
      val c = i % k
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat * 0.01f)
      v(c) += 1f
      i.toLong -> v
    }
  }

  test("assignTopM emits exactly m cells per vector, all distinct") {
    val e = corpus(120, 4).toDF("vec_id", "embedding")
    val cents = Ivf.fitCentroids(e, k = 4, iters = 3)
    val a = Ivf.assignTopM(e, cents, m = 2)
    val per = a.groupBy("vec_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("cluster_id")).as("nd"))
      .agg(min("n"), max("n"), min("nd")).as[(Long, Long, Long)].head()
    assert(per == ((2L, 2L, 2L)), s"per-vector cell counts: $per")
  }

  test("keep rule: one representative survives per planted near-dup cluster") {
    val e = corpus(120, 4).toDF("vec_id", "embedding")
    val cents = Ivf.fitCentroids(e, k = 4, iters = 3)
    val assigned = Ivf.assignTopM(e, cents, m = 2)
    val out = SemanticDedup.assignReps(assigned, tau = 0.9).cache()
    // within a planted cluster all pairwise sims ≈ 1: the min id of each
    // residue class mod 4 is kept, everything else drops onto it
    val kept = out.filter(col("kept")).select("vec_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(0L, 1L, 2L, 3L)), s"kept: ${kept.mkString(",")}")
    val reps = out.filter(!col("kept"))
      .select(col("vec_id"), col("rep_id")).as[(Long, Long)].collect()
    reps.foreach { case (v, r) => assert(r == v % 4, s"vec $v rep $r") }
    assert(out.count() == 120)
  }

  test("kept set is tau-separated in every shared cell (violations = 0)") {
    val e = corpus(200, 8).toDF("vec_id", "embedding")
    val cents = Ivf.fitCentroids(e, k = 8, iters = 3)
    val assigned = Ivf.assignTopM(e, cents, m = 3)
    val out = SemanticDedup.assignReps(assigned, tau = 0.5)
    val viol = SemanticDedup
      .keptViolations(assigned, out, tau = 0.5)
      .as[Long]
      .head()
    assert(viol == 0L)
  }

  test("m = k keep rule equals a pure-Scala global brute force on random vectors") {
    // with m = k every vector shares every cell, so the shared-cell rule
    // must degenerate to the global rule: kept iff no lower-id vector
    // within tau anywhere; rep = the smallest such id
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 60).map(i => i.toLong -> Array.fill(8)(rnd.nextGaussian().toFloat))
    val tau = 0.2
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = vecs.map { case (id, v) =>
      val lower = vecs.filter { case (j, w) => j < id && cos(w, v) >= tau }.map(_._1)
      id -> (if (lower.isEmpty) id else lower.min)
    }.toMap
    val e = vecs.toDF("vec_id", "embedding")
    val k = 3
    val cents = Ivf.fitCentroids(e, k, iters = 2)
    val assigned = Ivf.assignTopM(e, cents, m = k)
    val got = SemanticDedup
      .assignReps(assigned, tau)
      .select(col("vec_id"), col("rep_id")).as[(Long, Long)]
      .collect()
      .toMap
    assert(got.size == 60)
    expected.foreach { case (id, rep) =>
      assert(got(id) == rep, s"vec $id: got rep ${got(id)}, expected $rep")
    }
  }

  test("hot-cell salting: degenerate one-cell quantizer, output unchanged, work spread") {
    // pathological quantizer: EVERY vector lands in one cell — the case
    // the adaptive salting exists for. With threshold 10 the cell is
    // hot; salt 4 must spread its pair work while changing nothing.
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 200).map(i => i.toLong -> Array.fill(8)(rnd.nextGaussian().toFloat))
    val assigned = vecs.map { case (id, v) => (0L, id, v) }.toDF("cluster_id", "vec_id", "embedding")
    val tau = 0.2
    val salted = SemanticDedup.assignReps(assigned, tau, hotCellThreshold = 10L, salt = 4)
    val unsalted = SemanticDedup.assignReps(assigned, tau) // default threshold ≫ 200: no salting
    assert(salted.count() == 200)
    assert(salted.except(unsalted).isEmpty && unsalted.except(salted).isEmpty,
      "salted output must equal the unsalted join exactly")
    // the probe side of a hot cell partitions by pmod(xxhash64(id), salt):
    // assert the deterministic salt actually spreads this corpus (every
    // reducer sees ≤ 2·c/salt probe rows → ≤ 2·c²/salt pair work, not c²)
    val buckets = assigned
      .groupBy(pmod(xxhash64(col("vec_id")), lit(4)).as("s"))
      .count().select("count").as[Long].collect()
    assert(buckets.length == 4 && buckets.max <= 2 * 200 / 4, s"skewed salt: ${buckets.mkString(",")}")
    // violations audit runs the same salted join shape — still exact
    val viol = SemanticDedup
      .keptViolations(assigned, salted, tau, hotCellThreshold = 10L, salt = 4)
      .as[Long].head()
    assert(viol == 0L)
  }

  test("agrees with brute force when pairs share cells (soft m covers the corpus)") {
    val e = corpus(80, 2).toDF("vec_id", "embedding")
    val cents = Ivf.fitCentroids(e, k = 2, iters = 3)
    // m = k: every vector in every cell — the rule must equal brute force
    val assigned = Ivf.assignTopM(e, cents, m = 2)
    val out = SemanticDedup.assignReps(assigned, tau = 0.9)
    val kept = out.filter(col("kept")).select("vec_id").as[Long].collect().sorted
    // brute force: per residue class mod 2, only the min id survives
    assert(kept.sameElements(Array(0L, 1L)), s"kept: ${kept.mkString(",")}")
  }
}
