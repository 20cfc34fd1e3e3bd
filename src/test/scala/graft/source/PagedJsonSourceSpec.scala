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

  // ---------------------------------------------------------------- seam
  /** The r10 verdict's Fetcher-seam contract: the SAME scan, budget,
    * pushdown, and 429/backoff discipline must run against both the
    * file transport (always, zero egress) and a real HTTP transport
    * when sockets are permitted — identical rows. The stub server is
    * the JDK's own httpserver on a localhost ephemeral port; if the
    * sandbox forbids even loopback sockets, the HTTP tests cancel
    * (assume) rather than fail.
    */
  private def withStubServer(test429: Boolean)(body: String => Unit): Unit = {
    val server =
      try {
        com.sun.net.httpserver.HttpServer
          .create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      } catch {
        case e: Exception =>
          assume(false, s"loopback sockets unavailable: $e"); return
      }
    val pages = Map(
      "page-0001.jsonl" ->
        """{"station_id":"DE1","source":"de","city":"Berlin","lat":52.5,"lon":13.4}
          |{"station_id":"DE2","source":"de","city":"Hamburg","lat":53.6,"lon":10.0}
          |""".stripMargin,
      "page-0002.jsonl" ->
        """{"station_id":"NL1","source":"luchtmeetnet","city":"Amsterdam","lat":52.4,"lon":4.9}
          |""".stripMargin
    )
    // live 429 burst: the server answers 429 twice for page-0002, then 200
    val remaining429 = new java.util.concurrent.atomic.AtomicInteger(if (test429) 2 else 0)
    server.createContext(
      "/",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val name = ex.getRequestURI.getPath.stripPrefix("/")
        val resp: Either[Int, String] = name match {
          case "index.txt" => Right(pages.keys.toSeq.sorted.mkString("\n"))
          case p if pages.contains(p) =>
            if (p == "page-0002.jsonl" && remaining429.getAndDecrement() > 0) Left(429)
            else Right(pages(p))
          case _ => Left(404)
        }
        resp match {
          case Right(bodyTxt) =>
            val bytes = bodyTxt.getBytes("UTF-8")
            ex.sendResponseHeaders(200, bytes.length)
            ex.getResponseBody.write(bytes)
          case Left(code) => ex.sendResponseHeaders(code, -1)
        }
        ex.close()
      }
    )
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("HTTP transport: same rows as the file transport through the same scan") {
    withStubServer(test429 = false) { base =>
      val http = spark.read
        .format("graft.source.PagedJsonSource")
        .schema(PagedJsonSource.defaultSchema)
        .option("path", base)
        .option("transport", "http")
        .load()
      assert(http.rdd.getNumPartitions == 2) // partition-per-page holds over HTTP
      val got = http.select("station_id").collect().map(_.getString(0)).sorted.toSeq
      assert(got == Seq("DE1", "DE2", "NL1"))
      // pushdown reaches the HTTP reader exactly like the file reader
      val filtered = http.filter(col("source") === "de")
      assert(filtered.queryExecution.executedPlan.toString.contains("EqualTo(source,de)"))
      assert(filtered.count() == 2)
    }
  }

  test("HTTP transport: live 429s feed the shared backoff loop to success") {
    withStubServer(test429 = true) { base =>
      val before = PageReader.retried429.get()
      val df = spark.read
        .format("graft.source.PagedJsonSource")
        .schema(PagedJsonSource.defaultSchema)
        .option("path", base)
        .option("transport", "http")
        .option("maxRetries", "5")
        .option("backoffBaseMs", "1")
        .option("backoffStepMs", "1")
        .load()
      assert(df.count() == 3) // two live 429s on page-0002, then success
      assert(PageReader.retried429.get() - before == 2)
    }
  }

  test("feeds the catalog-refresh job end-to-end (null island dropped)") {
    val out = Files.createTempDirectory("cat").toString + "/stations"
    val n = graft.jobs.Jobs.catalogRefresh(spark, read(), out)
    assert(n == 4) // NL2 has null lat → dropped by P4
    val kept = spark.read.parquet(out).select("station_id").collect().map(_.getString(0)).sorted
    assert(kept.toSeq == Seq("DE1", "DE2", "NL1", "PL1"))
  }
}
