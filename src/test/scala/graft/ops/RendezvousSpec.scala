package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the HRW laws q151's re-shard delta plan is built on:
  * MINIMAL MOVEMENT (adding shard N can only move a doc TO shard N —
  * every other assignment is decided by an argmax whose candidate set
  * is unchanged), expected movement ≈ 1/(N+1), rough balance, and
  * determinism of the 60-bit md5 scoring.
  */
class RendezvousSpec extends SparkSpec {
  import spark.implicits._

  private val n = 4000
  private def ids = (1 to n).map(i => s"doc-$i").toDF("id")

  test("minimal movement: N -> N+1 moves docs only TO the new shard") {
    for (shards <- Seq(3, 8)) {
      val both = ids.select(
        col("id"),
        Rendezvous.assign(col("id"), shards).as("a"),
        Rendezvous.assign(col("id"), shards + 1).as("b"))
      val moved = both.filter(col("a") =!= col("b"))
      // the defining HRW property — no lateral moves between old shards
      assert(moved.filter(col("b") =!= (shards.toLong)).count() == 0)
      // expected movement 1/(N+1); allow a generous band around it
      val frac = moved.count().toDouble / n
      val exp = 1.0 / (shards + 1)
      assert(frac > exp * 0.6 && frac < exp * 1.6,
        s"shards $shards->${shards + 1}: moved fraction $frac vs expected $exp")
    }
  }

  test("balance: each shard holds roughly 1/N of the corpus") {
    val shards = 5
    val counts = ids
      .select(Rendezvous.assign(col("id"), shards).as("s"))
      .groupBy("s").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0L until shards.toLong).toSet)
    val (lo, hi) = (n / shards * 0.8, n / shards * 1.2)
    counts.values.foreach(c => assert(c >= lo && c <= hi, s"imbalanced: $counts"))
  }

  test("determinism: same ids, same assignment, run to run") {
    val a = ids.select(col("id"), Rendezvous.assign(col("id"), 7).as("s")).collect().toSet
    val b = ids.select(col("id"), Rendezvous.assign(col("id"), 7).as("s")).collect().toSet
    assert(a == b)
  }
}
