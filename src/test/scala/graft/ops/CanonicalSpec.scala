package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ops/Canonical: quality-argmax survivor selection over near-dup
  * clusters — survivor laws on a hand graph, singleton handling, and
  * the upgrade-vs-min-id distinction that separates this from
  * dedupAssignments' label convention.
  */
class CanonicalSpec extends SparkSpec {
  import spark.implicits._

  test("one survivor per cluster, quality argmax with id tiebreak, singletons survive") {
    val scored = Seq(
      (1L, 0.5), (2L, 0.9), (3L, 0.7), // cluster {1,2,3} → survivor 2
      (10L, 0.4), (11L, 0.4), // cluster {10,11}, tied score → survivor 10
      (20L, 0.1) // singleton → survives
    ).toDF("doc_id", "score")
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Canonical.survivors(scored, edges, "doc_id")
    val surv = out.filter(col("is_survivor")).select("doc_id").as[Long].collect().toSet
    assert(surv == Set(2L, 10L, 20L))
    // exactly one survivor per component
    val perComp = out
      .groupBy("component")
      .agg(sum(col("is_survivor").cast("long")).as("s"))
      .select("s")
      .as[Long]
      .collect()
    assert(perComp.forall(_ == 1L))
    // singleton's component is its own id
    assert(
      out.filter(col("doc_id") === 20L).select("component").as[Long].collect()(0) == 20L
    )
  }

  test("upgrade detection: survivor differs from min-id rep exactly when a better doc exists") {
    val scored = Seq((1L, 0.2), (2L, 0.9), (5L, 0.9), (6L, 0.1)).toDF("doc_id", "score")
    val edges = Seq((1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Canonical.survivors(scored, edges, "doc_id")
    val s = out
      .filter(col("is_survivor"))
      .select("component", "doc_id")
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(s(1L) == 2L) // upgrade: 2 beats min-id 1
    assert(s(5L) == 5L) // no upgrade: min-id is also best
  }
}
