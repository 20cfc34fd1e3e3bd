package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EntityResSpec extends SparkSpec {
  import spark.implicits._

  private val a = Seq(
    (1L, "ana", "1234"),
    (2L, "bob", "9999"),
    (3L, Option.empty[String].orNull, "7777")
  ).toDF("a_id", "a_name", "a_ph")
  private val b = Seq(
    (10L, "ana", "1234"),   // blocks on both passes — must appear ONCE
    (11L, "ana", "0000"),   // name pass only
    (12L, "zed", "9999"),   // phone pass only
    (13L, Option.empty[String].orNull, "7777") // phone pass; null name must not block
  ).toDF("b_id", "b_name", "b_ph")

  private def cand = EntityRes.blockedCandidates(
    a, b, "a_id", "b_id",
    Seq((col("a_name"), col("b_name")), (col("a_ph"), col("b_ph"))))

  test("multi-pass blocking: union of passes, deduped on the id pair") {
    val pairs = cand.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 10L), (1L, 11L), (2L, 12L), (3L, 13L)))
    // (1,10) blocks on BOTH passes but is one candidate
    assert(cand.count() === 4)
  }

  test("null keys never block (no null mega-block)") {
    // a_id=3 and b_id=13 share a null name; they meet only via the
    // phone pass — a null-name cross-block would add (3, 10..12)
    val withNull = cand.where(col("a_id") === 3).select("b_id").as[Long].collect().toSet
    assert(withNull === Set(13L))
  }

  test("clusters labels every matched id with its component size") {
    val matches = Seq((1L, 10L), (1L, 11L), (2L, 12L)).toDF("a_id", "b_id")
    val cl = EntityRes.clusters(matches, "a_id", "b_id")
    val sizes = cl.select("id", "cluster_size").as[(Long, Long)].collect().toMap
    assert(sizes(1L) === 3 && sizes(10L) === 3 && sizes(11L) === 3)
    assert(sizes(2L) === 2 && sizes(12L) === 2)
  }
}
