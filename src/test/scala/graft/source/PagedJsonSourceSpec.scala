package graft.source

import java.nio.file.{Files, Paths}
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSv2 paged source: partition-per-page planning, filter pushdown into
  * the reader, column pruning, catalog-refresh integration.
  */
class PagedJsonSourceSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("pages").toString
    // 3 pages of station rows (the reference's paged catalog GETs)
    Files.writeString(
      Paths.get(d, "page-0001.jsonl"),
      """{"station_id":"DE1","source":"de","city":"Berlin","lat":52.5,"lon":13.4}
        |{"station_id":"DE2","source":"de","city":"Hamburg","lat":53.6,"lon":10.0}
        |""".stripMargin
    )
    Files.writeString(
      Paths.get(d, "page-0002.jsonl"),
      """{"station_id":"NL1","source":"luchtmeetnet","city":"Amsterdam","lat":52.4,"lon":4.9}
        |{"station_id":"NL2","source":"luchtmeetnet","city":null,"lat":null,"lon":4.5}
        |""".stripMargin
    )
    Files.writeString(
      Paths.get(d, "page-0003.jsonl"),
      """{"station_id":"PL1","source":"gios","city":"Warszawa","lat":52.2,"lon":21.0}
        |""".stripMargin
    )
    d
  }

  private def read() =
    spark.read
      .format("graft.source.PagedJsonSource")
      .schema(PagedJsonSource.defaultSchema)
      .option("path", dir)
      .load()

  test("scans all pages; one partition per page") {
    val df = read()
    assert(df.count() == 5)
    assert(df.rdd.getNumPartitions == 3)
  }

  test("equality filter is pushed into the source (reader-level filtering)") {
    val df = read().filter(col("source") === "de")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(source,de)"), s"pushed filter missing in:\n$plan")
    assert(df.count() == 2)
  }

  test("column pruning reaches the scan") {
    val df = read().select("station_id")
    val scanLine = df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("PagedJsonScan")).getOrElse("")
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("DE1", "DE2", "NL1", "NL2", "PL1"))
    assert(df.schema.fieldNames.toSeq == Seq("station_id"))
    assert(scanLine.nonEmpty)
  }

  test("L2 request budget: scan plans only the first N pages and truncates, not fails") {
    // reference semantics at NL_REQUEST_LIMIT (app/main.py:416, 460-470):
    // budget reached → return what was fetched so far
    val df = spark.read
      .format("graft.source.PagedJsonSource")
      .schema(PagedJsonSource.defaultSchema)
      .option("path", dir)
      .option("requestBudget", "2")
      .load()
    assert(df.rdd.getNumPartitions == 2)
    assert(df.select("station_id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("DE1", "DE2", "NL1", "NL2"))
  }

  test("T7 backoff: a 429 burst below maxRetries is retried to success") {
    val d = Files.createTempDirectory("pages429").toString
    Files.writeString(
      Paths.get(d, "page-0001.jsonl"),
      """{"station_id":"A1","source":"de","city":"X","lat":1.0,"lon":2.0}
        |""".stripMargin
    )
    Files.writeString(Paths.get(d, "page-0001.jsonl.429"), "2")
    val before = PageReader.retried429.get()
    val df = spark.read
      .format("graft.source.PagedJsonSource")
      .schema(PagedJsonSource.defaultSchema)
      .option("path", d)
      .option("maxRetries", "5")
      .option("backoffBaseMs", "1")
      .option("backoffStepMs", "1")
      .option("paceMs", "1")
      .load()
    assert(df.count() == 1) // two simulated 429s, then success
    assert(PageReader.retried429.get() - before == 2)
  }

  test("T7 backoff: a 429 burst past maxRetries fails the read (reference re-raises)") {
    val d = Files.createTempDirectory("pages429x").toString
    Files.writeString(
      Paths.get(d, "page-0001.jsonl"),
      """{"station_id":"A1","source":"de","city":"X","lat":1.0,"lon":2.0}
        |""".stripMargin
    )
    Files.writeString(Paths.get(d, "page-0001.jsonl.429"), "7")
    val df = spark.read
      .format("graft.source.PagedJsonSource")
      .schema(PagedJsonSource.defaultSchema)
      .option("path", d)
      .option("maxRetries", "2")
      .option("backoffBaseMs", "1")
      .option("backoffStepMs", "0")
      .load()
    val e = intercept[Exception] { df.count() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("429")), s"unexpected failure: $e")
  }

  test("feeds the catalog-refresh job end-to-end (null island dropped)") {
    val out = Files.createTempDirectory("cat").toString + "/stations"
    val n = graft.jobs.Jobs.catalogRefresh(spark, read(), out)
    assert(n == 4) // NL2 has null lat → dropped by P4
    val kept = spark.read.parquet(out).select("station_id").collect().map(_.getString(0)).sorted
    assert(kept.toSeq == Seq("DE1", "DE2", "NL1", "PL1"))
  }
}
