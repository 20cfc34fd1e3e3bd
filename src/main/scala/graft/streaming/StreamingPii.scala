package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING PII telemetry: the q226 per-source pattern counters run
  * on an ingest stream. Every counter is an ASSOCIATIVE sum of
  * map-side per-row regex counts, so Spark's stateful streaming
  * aggregation is the whole implementation — state per source is six
  * longs, constant in stream length, each micro-batch contributing
  * map-side partials only. A compliance pipeline emits this next to
  * its sink to alarm on PII-bearing sources as they land rather than
  * in a day-later batch audit.
  *
  * Patterns are the engine's canonical PII classes (Java-regex ∩ RE2
  * subset — DuckDB oracles replay them verbatim; q226 is the batch
  * certificate). Parity law (StreamingPiiSpec): streamed
  * complete-mode output after N micro-batches equals the batch
  * aggregate over the union of those batches, value-for-value.
  */
object StreamingPii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val IpRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val SsnRe = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
  val UrlRe = "https?://[A-Za-z0-9./_-]+"

  /** Works identically on a batch or streaming (groupCol, textCol)
    * frame — the parity spec runs THIS function on both sides.
    */
  def perGroupCounts(docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    def cnt(re: String) =
      size(regexp_extract_all(col(textCol), lit(re), lit(0))).cast("long")
    docs
      .select(
        col(groupCol),
        cnt(EmailRe).as("e"),
        cnt(PhoneRe).as("p"),
        cnt(IpRe).as("i"),
        cnt(SsnRe).as("n"),
        cnt(UrlRe).as("u"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("e")).as("n_emails"),
        sum(col("p")).as("n_phones"),
        sum(col("i")).as("n_ips"),
        sum(col("n")).as("n_ssns"),
        sum(col("u")).as("n_urls"))
  }
}
