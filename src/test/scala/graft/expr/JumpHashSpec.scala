package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Jump consistent hash: the paper's three guarantees (balance,
  * minimality, zero memory) checked directly on the scalar, plus the
  * SQL registration and null contract q267 rides on.
  */
class JumpHashSpec extends SparkSpec {
  import spark.implicits._

  test("n = 1 sends every key to bucket 0") {
    (0L until 1000L).foreach(k => assert(JumpHash.bucket(k, 1) === 0))
  }

  test("balance: 10k keys over 10 buckets, each within 20% of uniform") {
    val counts = (0L until 10000L).map(JumpHash.bucket(_, 10)).groupBy(identity)
    assert(counts.size === 10)
    counts.foreach { case (b, ks) =>
      assert(ks.size > 800 && ks.size < 1200, s"bucket $b holds ${ks.size}")
    }
  }

  test("minimality: growing n -> n+1 only ever moves keys INTO bucket n") {
    for (n <- 1 until 24; k <- 0L until 2000L) {
      val before = JumpHash.bucket(k, n)
      val after = JumpHash.bucket(k, n + 1)
      assert(after == before || after == n, s"key $k, $n->${n + 1}: $before -> $after")
    }
  }

  test("move fraction n -> n+1 is ~1/(n+1)") {
    val n = 16
    val moved = (0L until 20000L).count(k => JumpHash.bucket(k, n) != JumpHash.bucket(k, n + 1))
    val expected = 20000.0 / (n + 1)
    assert(moved > expected * 0.7 && moved < expected * 1.3, s"moved=$moved expected~$expected")
  }

  test("SQL registration: jump_hash matches the scalar; n < 1 is null") {
    val rows = spark
      .range(0, 500)
      .selectExpr("id", "jump_hash(id, 7) AS b", "jump_hash(id, 0) AS z")
      .as[(Long, Option[Int], Option[Int])]
      .collect()
    rows.foreach { case (id, b, z) =>
      assert(b.contains(JumpHash.bucket(id, 7)))
      assert(z.isEmpty)
    }
  }
}
