package graft.ops

import graft.SparkSpec

class IvmSpec extends SparkSpec {
  import spark.implicits._

  test("maintain: births, deaths, updates, and null keys in one changelog") {
    val old = Seq(
      (Option("a"), 2L, 10L),
      (Option("b"), 1L, 5L),
      (Option.empty[String], 3L, 9L)
    ).toDF("k", "cnt", "sm")
    val changes = Seq(
      (Option("a"), 1L, 7L),   // update: a -> (3, 17)
      (Option("b"), -1L, 5L),  // death: b count hits 0, row must vanish
      (Option("c"), 1L, 4L),   // birth: c appears as (1, 4)
      (Option.empty[String], -1L, 3L) // null key must merge, not fork
    ).toDF("k", "w", "v")
    val got = Ivm
      .maintain(old, changes, Seq("k"))
      .as[(Option[String], Long, Long)]
      .collect()
      .map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(got === Map(
      Option("a") -> ((3L, 17L)),
      Option("c") -> ((1L, 4L)),
      Option.empty[String] -> ((2L, 6L))
    ))
  }

  test("retraction of a never-seen key cannot resurrect as a negative group") {
    val old = Seq(("a", 1L, 1L)).toDF("k", "cnt", "sm")
    val changes = Seq(("ghost", -1L, 99L)).toDF("k", "w", "v")
    val got = Ivm.maintain(old, changes, Seq("k")).as[(String, Long, Long)].collect()
    assert(got.toSeq === Seq(("a", 1L, 1L)))
  }

  test("idempotent on an empty changelog") {
    val old = Seq(("a", 2L, 3L), ("b", 1L, 1L)).toDF("k", "cnt", "sm")
    val changes = Seq.empty[(String, Long, Long)].toDF("k", "w", "v")
    val got = Ivm.maintain(old, changes, Seq("k")).as[(String, Long, Long)].collect().toSet
    assert(got === Set(("a", 2L, 3L), ("b", 1L, 1L)))
  }
}
