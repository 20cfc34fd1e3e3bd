package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PII redaction and stratified-sampling units (the oracle batteries
  * q21-q26, q52, q53 cover the full surfaces; these pin edge cases).
  */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii: multiple emails and phones, clean text untouched") {
    val rows = Seq(
      "write a@b.io or c.d_e@mail-srv.co.uk today",
      "call +49 30 123456 or 555-123-4567 now",
      "no pii here at all",
      "mixed-case John.Doe@Example.COM leaks otherwise"
    ).toDF("t")
    val out = rows.select(TextStats.redactPii(col("t")).as("r")).as[String].collect().toSeq
    assert(out(0) == "write <EMAIL> or <EMAIL> today")
    assert(out(1) == "call <PHONE> or <PHONE> now")
    assert(out(2) == "no pii here at all")
    assert(out(3) == "mixed-case <EMAIL> leaks otherwise")
  }

  test("stratifiedSample: exact quota per group, deterministic across runs") {
    val df = (0 until 300).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "id")
    val s1 = TextStats.stratifiedSample(df, "g", "id", 7)
      .select("g", "id").as[(String, Long)].collect().sorted.toSeq
    val s2 = TextStats.stratifiedSample(df.repartition(13), "g", "id", 7)
      .select("g", "id").as[(String, Long)].collect().sorted.toSeq
    assert(s1 == s2, "sample changed with partitioning")
    assert(s1.groupBy(_._1).forall(_._2.size == 7))
  }
}
