package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Runnable demo of the DSv2 paged source (SURVEY §2.1 S1-S6): writes
  * page fixtures, scans them through spark.read.format(...), shows the
  * pushed filter in the physical plan, and feeds the catalog-refresh job.
  */
object SourceDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(4)
    val d = Files.createTempDirectory("pages_demo").toString
    Files.writeString(
      Paths.get(d, "page-0001.jsonl"),
      """{"station_id":"DE1","source":"de","city":"Berlin","lat":52.5,"lon":13.4}
        |{"station_id":"NL1","source":"luchtmeetnet","city":"Amsterdam","lat":52.4,"lon":4.9}
        |""".stripMargin
    )
    Files.writeString(
      Paths.get(d, "page-0002.jsonl"),
      """{"station_id":"DE2","source":"de","city":null,"lat":null,"lon":10.0}
        |""".stripMargin
    )
    def read(path: String) = spark.read
      .format("graft.source.PagedJsonSource")
      .schema(graft.source.PagedJsonSource.defaultSchema)
      .option("path", path)
      .load()

    val df = read(d)
    println(s"rows=${df.count()} partitions=${df.rdd.getNumPartitions}")
    val de = df.filter(col("source") === "de")
    val pushedLine = de.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("PagedJsonScan"))
      .getOrElse("")
    println(s"scan: ${pushedLine.trim.take(140)}")
    println(s"de_rows=${de.count()}")
    val out = Files.createTempDirectory("cat_demo").toString + "/stations"
    val kept = jobs.Jobs.catalogRefresh(spark, df, out)
    println(s"catalog_kept=$kept")
    // probe: empty directory → empty result, no crash
    val empty = Files.createTempDirectory("pages_empty").toString
    println(s"empty_dir_rows=${read(empty).count()}")
    spark.stop()
  }
}
