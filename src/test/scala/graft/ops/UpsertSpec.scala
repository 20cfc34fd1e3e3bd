package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

/** A4/A5 merge semantics (reference ON CONFLICT clauses,
  * app/main.py:636-645 and 257-270).
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("coalesceMerge: new non-null wins, null update keeps old, new keys insert") {
    val base = Seq(
      ("s1", Some("cityA"), Some(1.0)),
      ("s2", Some("cityB"), Some(2.0))
    ).toDF("station_id", "city", "lat")
    val updates = Seq(
      ("s1", None: Option[String], Some(9.0)), // null city keeps cityA, lat updates
      ("s3", Some("cityC"), None: Option[Double]) // new key inserts
    ).toDF("station_id", "city", "lat")
    val out = Upsert
      .coalesceMerge(base, updates, "station_id")
      .orderBy("station_id")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out.toSeq == Seq(
      ("s1", Some("cityA"), Some(9.0)),
      ("s2", Some("cityB"), Some(2.0)),
      ("s3", Some("cityC"), None)
    ))
  }

  test("coalesceMerge is idempotent") {
    val base = Seq(("s1", Some("x"), Some(1.0))).toDF("station_id", "city", "lat")
    val once = Upsert.coalesceMerge(base, base, "station_id")
    val twice = Upsert.coalesceMerge(once, base, "station_id")
    assert(twice.collect().toSeq == once.collect().toSeq)
  }

  test("greatestMerge: watermark only advances; one-sided keys survive") {
    def ts(s: String) = Timestamp.valueOf(s)
    val base = Seq(
      ("a", ts("2024-01-01 10:00:00")),
      ("b", ts("2024-01-01 10:00:00"))
    ).toDF("k", "last")
    val updates = Seq(
      ("a", ts("2024-01-01 09:00:00")), // older → must NOT regress
      ("c", ts("2024-01-01 11:00:00"))  // new key
    ).toDF("k", "last")
    val out = Upsert
      .greatestMerge(base, updates, Seq("k"), "last")
      .orderBy("k")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1)))
    assert(out.toSeq == Seq(
      ("a", ts("2024-01-01 10:00:00")),
      ("b", ts("2024-01-01 10:00:00")),
      ("c", ts("2024-01-01 11:00:00"))
    ))
  }

  test("applyCdc: D removes, U updates, I inserts, U-on-absent upserts, D-on-absent no-ops") {
    val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      (1L, "a", 10.0, "D"), // delete present
      (2L, "b", 99.0, "U"), // update present
      (4L, "d", 40.0, "I"), // insert fresh
      (5L, "e", 50.0, "U"), // update absent → upsert-inserts
      (6L, "f", 0.0, "D") // delete absent → no-op
    ).toDF("k", "name", "bal", "op")
    val out = Upsert
      .applyCdc(snap, changes, "k", "op")
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (2L, "b", 99.0),
      (3L, "c", 30.0),
      (4L, "d", 40.0),
      (5L, "e", 50.0)
    ))
  }
}
