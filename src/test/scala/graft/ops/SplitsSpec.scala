package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** componentSplit units (the q127 oracle covers the full surface; these
  * pin the leak-free law and the singleton path directly).
  */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"src${i % 3}")).toDF("doc_id", "source")

  test("cluster members always share a split; singletons key by own id") {
    // components: {0,1,2}, {5,6}; singletons 3,4,7..19
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Splits.componentSplit(docs(20), pairs, "doc_id")
      .select("doc_id", "split_key", "split")
      .as[(Long, Long, String)]
      .collect()
      .map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(Seq(0L, 1L, 2L).map(out(_)._2).distinct.size == 1, "cluster {0,1,2} split apart")
    assert(Seq(5L, 6L).map(out(_)._2).distinct.size == 1, "cluster {5,6} split apart")
    assert(Seq(0L, 1L, 2L).forall(out(_)._1 == 0L), "min-label key expected for {0,1,2}")
    assert(out(3L)._1 == 3L && out(4L)._1 == 4L, "singletons must key by own id")
  }

  test("assignment is invariant under input partitioning") {
    val pairs = Seq((0L, 1L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val d = docs(50)
    val s1 = Splits.componentSplit(d, pairs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().sorted.toSeq
    val s2 = Splits.componentSplit(d.repartition(13), pairs.repartition(7), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().sorted.toSeq
    assert(s1 == s2)
  }

  test("cross-split leak count over the pair set is zero by construction") {
    val pairs = (0 until 40).map(i => (i.toLong, (i + 40).toLong)).toDF("id_a", "id_b")
    val assigned = Splits.componentSplit(docs(100), pairs, "doc_id")
    val leaks = pairs
      .join(assigned.select(col("doc_id").as("id_a"), col("split").as("sa")), Seq("id_a"))
      .join(assigned.select(col("doc_id").as("id_b"), col("split").as("sb")), Seq("id_b"))
      .filter(col("sa") =!= col("sb"))
      .count()
    assert(leaks == 0L)
  }
}
