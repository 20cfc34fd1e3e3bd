package graft.ops

import graft.SparkSpec

/** q31 (adaptive LSH near-dups) recall vs the exact q45 baseline. */
class Q31RecallCheck extends SparkSpec {
  import spark.implicits._

  test("q31 adaptive parameterization holds recall >= 0.85 vs exact q45, zero false positives") {
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { dir =>
      val approx = graft.Queries.q31EmbedNearDups(spark, dir)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val exact = graft.Queries.q45EmbedNearDupsExact(spark, dir)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val falsePos = approx.diff(exact)
      val recall = approx.intersect(exact).size.toDouble / exact.size
      assert(falsePos.isEmpty, s"$dir: ${falsePos.size} false positives")
      assert(recall >= 0.85, s"$dir: recall $recall (exact=${exact.size}, found=${approx.size})")
    }
  }
}
