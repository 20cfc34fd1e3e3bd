package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental digest maintenance: hand-checkable diffs (add / remove /
  * change / MOVE), vanished-group edge, and the congruence law over the
  * fixture corpus.
  */
class CorpusDeltaSpec extends SparkSpec {
  import spark.implicits._

  private val M = ExportPlan.DigestModulus

  test("hand diff: add, remove, change, and a group move are attributed correctly") {
    val before = Seq(
      (1L, "a", 100L), // unchanged
      (2L, "a", 200L), // changed in place
      (3L, "a", 300L), // removed
      (4L, "b", 400L), // moves a→... stays b? no: moves to group c
      (5L, "b", 500L)  // b's only survivor
    ).toDF("id", "g", "d")
    val after = Seq(
      (1L, "a", 100L),
      (2L, "a", 222L),
      (4L, "c", 400L), // the move: b → c, digest unchanged
      (5L, "b", 500L),
      (6L, "a", 600L)  // added
    ).toDF("id", "g", "d")
    val out = CorpusDelta
      .deltaDigest(before, after, "id", "g", "d")
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap

    val a = out("a")
    assert(a.getAs[Long]("n_added") === 1L)    // doc 6
    assert(a.getAs[Long]("n_removed") === 1L)  // doc 3
    assert(a.getAs[Long]("n_changed") === 1L)  // doc 2
    assert(a.getAs[Long]("digest_sum_before") === 600L) // 100+200+300
    assert(a.getAs[Long]("digest_sum_after") === 922L)  // 100+222+600

    val b = out("b")
    assert(b.getAs[Long]("n_removed") === 1L) // the move OUT of b
    assert(b.getAs[Long]("n_added") === 0L)
    assert(b.getAs[Long]("digest_sum_before") === 900L)
    assert(b.getAs[Long]("digest_sum_after") === 500L)

    val c = out("c")
    assert(c.getAs[Long]("n_added") === 1L)   // the move INTO c
    assert(c.getAs[Long]("n_before") === 0L)
    assert(c.getAs[Long]("digest_sum_after") === 400L)

    out.values.foreach(r => assert(r.getAs[Boolean]("law_holds"), s"law broke for ${r.getString(0)}"))
  }

  test("a group that fully vanishes still gets a row with a holding law") {
    val before = Seq((1L, "gone", 7L), (2L, "kept", 9L)).toDF("id", "g", "d")
    val after = Seq((2L, "kept", 9L)).toDF("id", "g", "d")
    val out = CorpusDelta
      .deltaDigest(before, after, "id", "g", "d")
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    val gone = out("gone")
    assert(gone.getAs[Long]("n_after") === 0L)
    assert(gone.getAs[Long]("n_removed") === 1L)
    assert(gone.getAs[Long]("digest_sum_after") === 0L)
    // delta for 'gone' is (-7) mod M, and 7 + (M - 7) ≡ 0 (mod M)
    assert(gone.getAs[Long]("delta_sum") === M - 7L)
    out.values.foreach(r => assert(r.getAs[Boolean]("law_holds")))
  }

  test("congruence law holds for every source over the fixture-derived snapshots") {
    val out = graft.Queries.q124DeltaDigest(spark, "/root/testdata/sf0.01").collect()
    assert(out.length >= 20)
    out.foreach(r => assert(r.getAs[Boolean]("law_holds"), s"law broke for ${r.getString(0)}"))
    // the derivation predicates really produced every diff kind
    assert(out.map(_.getAs[Long]("n_added")).sum > 0)
    assert(out.map(_.getAs[Long]("n_removed")).sum > 0)
    assert(out.map(_.getAs[Long]("n_changed")).sum > 0)
  }
}
