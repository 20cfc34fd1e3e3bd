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

  test("feeds the catalog-refresh job end-to-end (null island dropped)") {
    val out = Files.createTempDirectory("cat").toString + "/stations"
    val n = graft.jobs.Jobs.catalogRefresh(spark, read(), out)
    assert(n == 4) // NL2 has null lat → dropped by P4
    val kept = spark.read.parquet(out).select("station_id").collect().map(_.getString(0)).sorted
    assert(kept.toSeq == Seq("DE1", "DE2", "NL1", "PL1"))
  }
}
