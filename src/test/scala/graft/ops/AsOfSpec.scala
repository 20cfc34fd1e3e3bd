package graft.ops

import java.sql.Timestamp
import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), Some(100.0), "q1"),
    ("A", ts("2024-01-01 11:00:00"), None: Option[Double], "q2"), // null payload field
    ("A", ts("2024-01-01 12:00:00"), Some(120.0), "q3"),
    ("B", ts("2024-01-01 10:30:00"), Some(50.0), "q4")
  ).toDF("k", "qts", "price", "quote_id")

  private val trades = Seq(
    (1L, "A", ts("2024-01-01 10:30:00")), // after q1
    (2L, "A", ts("2024-01-01 11:00:00")), // exactly at q2 (inclusive <=)
    (3L, "A", ts("2024-01-01 13:00:00")), // after q3
    (4L, "B", ts("2024-01-01 10:00:00")), // before any B quote → nulls
    (5L, "C", ts("2024-01-01 10:00:00"))  // key with no right rows → nulls
  ).toDF("trade_id", "k", "tts")

  test("ties on (key, ts) resolve deterministically to the max payload struct") {
    // several right rows share (key, ts): without a payload tiebreak the
    // carried row depends on sort instability. The struct-ordered
    // tiebreak must always pick the max (price, quote_id) struct.
    val dupQuotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), Some(99.0), "qa"),
      ("A", ts("2024-01-01 10:00:00"), Some(101.0), "qb"),
      ("A", ts("2024-01-01 10:00:00"), Some(100.0), "qc")
    ).toDF("k", "qts", "price", "quote_id")
    val oneTrade = Seq((1L, "A", ts("2024-01-01 10:30:00"))).toDF("trade_id", "k", "tts")
    (1 to 5).foreach { _ =>
      val r = AsOf
        .joinAsOf(oneTrade, dupQuotes.repartition(7), "k", "tts", "qts", Seq("price", "quote_id"))
        .collect()
        .head
      assert(r.getDouble(3) == 101.0 && r.getString(4) == "qb")
    }
  }

  test("as-of join picks the latest right row at or before each left ts") {
    val out = AsOf
      .joinAsOf(trades, quotes, "k", "tts", "qts", Seq("quote_id", "price"))
      .orderBy("trade_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(3)), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(out.toSeq == Seq(
      (1L, Some("q1"), Some(100.0)),
      (2L, Some("q2"), None), // struct carry: price stays null WITH q2, not mixed from q1
      (3L, Some("q3"), Some(120.0)),
      (4L, None, None),
      (5L, None, None)
    ))
  }
}
