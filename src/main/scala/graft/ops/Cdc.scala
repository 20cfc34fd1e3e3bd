package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CONTENT-DEFINED CHUNKING — the rolling-hash boundary rule behind
  * dedup storage systems (LBFS/rsync lineage: Muthitacharoen et al.
  * SOSP'01) and chunk-level corpus dedup: a chunk boundary falls after
  * position p iff the hash of the w-char window ending at p selects
  * (hash mod m = 0), so boundaries are INSERTION-STABLE — editing one
  * region shifts only that region's boundaries, unlike fixed-size
  * chunking where one inserted byte reshuffles every chunk. Chunk
  * identity (md5 of the chunk text) then makes cross-document
  * duplicated REGIONS visible even when whole-doc fingerprints (q23)
  * and shingle spans (q80) are framed differently.
  *
  * The window hash here is md5 of the window substring (the repo's
  * replayable-hash discipline) rather than a true O(1) rolling
  * polynomial — same boundaries, O(w) per position; the Gear/Rabin
  * rolling form is the constant-factor optimization at 100 TB, not a
  * semantic change. Scale shape: position explode is map-side (w·len
  * work per doc, linear in corpus), the only shuffle is the per-doc
  * boundary sort window — keyed by doc, never global.
  */
object Cdc {

  /** Chunks (doc_id, start, chunk_len, chunk_hash), 1-based start,
    * covering each doc's text exactly (the final chunk always closes
    * at length(text); docs shorter than `w` become one chunk).
    */
  def chunks(docs: DataFrame, idCol: String, textCol: String, w: Int, modulus: Int): DataFrame = {
    val d = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("n", length(col("text")))
      .where(col("n") >= 1)
    val bounds = d
      .select(
        col("doc_id"),
        col("text"),
        col("n"),
        explode(sequence(lit(w), greatest(col("n"), lit(w)))).as("p"))
      .where(col("p") <= col("n"))
      .where(
        expr(s"CAST(conv(substr(md5(substr(text, p - ${w - 1}, $w)), 1, 8), 16, 10) AS BIGINT) % $modulus = 0"))
      .select(col("doc_id"), col("p"))
    val ends = bounds
      .unionByName(d.select(col("doc_id"), col("n").as("p")))
      .distinct()
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    ends
      .withColumn("start", coalesce(lag(col("p"), 1).over(byDoc) + 1, lit(1)))
      .join(d.select(col("doc_id"), col("text")), Seq("doc_id"))
      .select(
        col("doc_id"),
        col("start"),
        (col("p") - col("start") + 1).as("chunk_len"),
        md5(expr("substr(text, start, p - start + 1)")).as("chunk_hash"))
  }
}
