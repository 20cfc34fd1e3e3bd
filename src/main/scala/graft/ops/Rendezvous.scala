package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) shard assignment — the
  * consistent-hashing answer to "what happens to my export when the
  * shard count changes": under modulo placement, going N → N+1 moves
  * ~N/(N+1) of all documents (nearly everything re-uploads); under HRW,
  * exactly the documents whose new-shard score wins move — 1/(N+1) in
  * expectation, the provable minimum for a balanced scheme. That
  * stability is what makes incremental exports (q124's delta digests,
  * q135's deletion plans) cheap to maintain when capacity changes.
  *
  * Engine-portable scoring: score(doc, shard) is the 60-bit integer
  * from the md5 hex prefix of `"id:shard"` (the contentDigest60
  * recipe — Spark `conv`, DuckDB `'0x' ||` cast), so any engine
  * reproduces the argmax bit-for-bit; ties are impossible in practice
  * (60-bit) and broken by the higher shard id by the same law on both
  * sides. Cost is O(N) hashes per row — fine for real shard counts
  * (hundreds); at many thousands of shards the standard fix is
  * hierarchical HRW (two-level argmax), which changes constants, not
  * the stability law.
  */
object Rendezvous {

  /** 60-bit positive HRW score of (id, shard). */
  def score(idCol: Column, shard: Int): Column =
    conv(
      substring(md5(concat(idCol.cast("string"), lit(":"), lit(shard.toString))), 1, 15),
      16,
      10
    ).cast("long")

  /** HRW shard assignment over shards 0..n-1: argmax score, ties to the
    * higher shard id (max-struct ordering).
    */
  def assign(idCol: Column, n: Int): Column = {
    val candidates = array((0 until n).map { s =>
      struct(score(idCol, s).as("sc"), lit(s.toLong).as("sh"))
    }: _*)
    array_max(candidates).getField("sh")
  }
}
