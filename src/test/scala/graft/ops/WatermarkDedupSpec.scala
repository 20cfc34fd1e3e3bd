package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

/** J2/T2 semantics (reference app/main.py:209-237): strict `>`, fail-open
  * on missing cursor, in-batch running-max behavior, monotonicity.
  */
class WatermarkDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val cursors = Seq(
    ("st1", "pm25", ts("2024-01-01 12:00:00"))
  ).toDF("station_id", "pollutant", "last_observed_at")

  test("strictly newer passes, equal is dropped (strict >, app/main.py:234)") {
    val incoming = Seq(
      ("st1", "pm25", ts("2024-01-01 12:00:01"), 1.0), // newer → keep
      ("st1", "pm25", ts("2024-01-01 12:00:00"), 2.0), // equal → drop
      ("st1", "pm25", ts("2024-01-01 11:59:59"), 3.0)  // older → drop
    ).toDF("station_id", "pollutant", "ts", "value")
    val out = WatermarkDedup.filterNew(incoming, cursors, Seq("station_id", "pollutant"), "ts")
    assert(out.select("value").as[Double].collect().toSeq == Seq(1.0))
  }

  test("missing cursor key passes (fail-open, app/main.py:223-231)") {
    val incoming = Seq(
      ("st9", "o3", ts("2020-01-01 00:00:00"), 7.0) // unknown key, ancient ts → keep
    ).toDF("station_id", "pollutant", "ts", "value")
    val out = WatermarkDedup.filterNew(incoming, cursors, Seq("station_id", "pollutant"), "ts")
    assert(out.count() == 1)
  }

  test("re-running on the same input against advanced cursors yields nothing (monotone)") {
    val incoming = Seq(
      ("st1", "pm25", ts("2024-01-01 13:00:00"), 1.0),
      ("st1", "pm25", ts("2024-01-01 14:00:00"), 2.0)
    ).toDF("station_id", "pollutant", "ts", "value")
    val passed = WatermarkDedup.filterNew(incoming, cursors, Seq("station_id", "pollutant"), "ts")
    assert(passed.count() == 2)
    val advanced = Upsert.greatestMerge(
      cursors,
      Rollup.maxTsPerKey(passed, Seq("station_id", "pollutant"), "ts"),
      Seq("station_id", "pollutant"),
      "last_observed_at"
    )
    val second = WatermarkDedup.filterNew(incoming, advanced, Seq("station_id", "pollutant"), "ts")
    assert(second.count() == 0)
  }

  test("null timestamp fails open even when a cursor exists; never advances the cursor") {
    // reference appends records with unparseable timestamps without
    // comparing (app/main.py _filter_new_measurements) — they must pass
    // the cursor filter AND stay out of cursor advancement.
    val incoming = Seq(
      ("st1", "pm25", Some(ts("2024-01-01 13:00:00")), 1.0), // newer → keep
      ("st1", "pm25", None: Option[Timestamp], 2.0), // unparseable ts → keep (fail-open)
      ("st1", "pm25", Some(ts("2024-01-01 11:00:00")), 3.0) // behind cursor → drop
    ).toDF("station_id", "pollutant", "ts", "value")
    val out = WatermarkDedup.filterNew(incoming, cursors, Seq("station_id", "pollutant"), "ts")
    assert(out.select("value").as[Double].collect().toSeq.sorted == Seq(1.0, 2.0))
    // cursor advancement (per-key max) ignores the null-ts row
    val adv = Rollup.maxTsPerKey(out, Seq("station_id", "pollutant"), "ts").collect()
    assert(adv.length == 1 && adv.head.getTimestamp(2) == ts("2024-01-01 13:00:00"))
  }

  test("in-batch composite keeps earliest arrival per (key, ts) then applies cursor") {
    val incoming = Seq(
      ("st1", "pm25", ts("2024-01-01 13:00:00"), 1L, 10.0), // first arrival → keep
      ("st1", "pm25", ts("2024-01-01 13:00:00"), 2L, 20.0), // same key+ts, later arrival → drop
      ("st1", "pm25", ts("2024-01-01 11:00:00"), 3L, 30.0)  // behind cursor → drop
    ).toDF("station_id", "pollutant", "ts", "arrival", "value")
    val out = WatermarkDedup.filterNewWithInBatch(
      incoming, cursors, Seq("station_id", "pollutant"), "ts", "arrival")
    assert(out.select("value").as[Double].collect().toSeq == Seq(10.0))
  }
}
