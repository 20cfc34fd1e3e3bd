package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-export SHARD PLANNER: deterministic global shuffle + token-
  * budgeted shard assignment — the step between a curated corpus and
  * the sharded files a trainer actually reads. Two requirements that
  * fight each other at 100 TB:
  *
  *  1. the order must be a reproducible global PSEUDO-SHUFFLE (so every
  *     rerun, engine, and cluster size yields byte-identical shards —
  *     `rand()` fails all three), and
  *  2. shard assignment needs a GLOBAL running token total in that
  *     order — and the naive form (one window over a global ORDER BY)
  *     collapses the whole corpus into a single partition.
  *
  * The operator solves (1) with the engine-portable multiplicative hash
  * ([[TextStats.portableHash]], the q85 split key) and (2) with the
  * textbook two-pass distributed prefix sum over RANGE BUCKETS of the
  * hash space:
  *
  *  - pass 1: each doc lands in bucket ⌊h/width⌋; a per-bucket window
  *    (shuffle on `bucket`, the only full-data exchange) computes the
  *    WITHIN-bucket running total in (h, id) order;
  *  - pass 2: per-bucket totals — `buckets` rows, bounded by the knob,
  *    not the data — get a driver-scale prefix scan and broadcast back
  *    as offsets. cum_before = bucket offset + local running total −
  *    own weight; shard = ⌊cum_before / budget⌋.
  *
  * At 1000 executors, `buckets` scales to O(10⁵) so each bucket's
  * window fits one task comfortably; the offset frame stays kilobytes.
  * This is exactly how RDD.zipWithIndex computes global indexes — here
  * expressed declaratively so Catalyst keeps the scan pruned.
  *
  * Docs are never split across shards (cum_before, not cum_after,
  * picks the shard — a doc bigger than the budget overflows its own
  * shard, the standard packing convention; cf. the greedy packer q57).
  */
object ExportPlan {

  private val HashSpace = 1000003L

  /** Per-doc shard assignment in deterministic pseudo-shuffle order.
    *
    * @param weightCol integer token/byte weight per row
    * @param budget    target weight per shard
    * @param buckets   prefix-sum fan-out (the scale knob; any value
    *                  yields identical output — asserted in the spec)
    * @return input id + (h, wt, cum_before, shard_id)
    */
  def assignShards(
      docs: DataFrame,
      idCol: String,
      weightCol: Column,
      budget: Long,
      buckets: Int = 64
  ): DataFrame = {
    val width = (HashSpace + buckets - 1) / buckets
    val d = docs.select(
      col(idCol).as("id"),
      weightCol.cast("long").as("wt"),
      TextStats.portableHash(col(idCol)).as("h")
    )
    val withBucket = d.withColumn("bucket", (col("h") / lit(width)).cast("long"))
    val local = Window.partitionBy(col("bucket")).orderBy(col("h"), col("id"))
    val cum = withBucket.withColumn("local_cum", sum(col("wt")).over(local))
    // pass 2: per-bucket totals → exclusive prefix. `buckets` rows by
    // construction — the single-partition window here is over the KNOB,
    // not the data (same bounded-scalar posture as Components' count).
    val offsets = withBucket
      .groupBy(col("bucket"))
      .agg(sum(col("wt")).as("btot"))
      .withColumn(
        "boffset",
        coalesce(
          sum(col("btot")).over(
            Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select(col("bucket"), col("boffset"))
    cum
      .join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum_before", col("boffset") + col("local_cum") - col("wt"))
      .withColumn("shard_id", (col("cum_before") / lit(budget)).cast("long"))
      .select(col("id"), col("h"), col("wt"), col("cum_before"), col("shard_id"))
  }

  /** Shard manifest: one row per planned shard with its doc count,
    * weight total, hash range, and fill against the budget.
    *
    * `fill_ppm` is an INTEGER — parts-per-million of the budget,
    * floor-divided. Round 6 shipped this as round(double, 6) and the
    * driver's DuckDB flagged a hash mismatch that local DuckDB could
    * not reproduce: double-rounding tie behavior is an engine-version
    * artifact, so the manifest now carries no rounded double at all
    * (integer units for checked outputs — the q92/q97 discipline).
    */
  def shardManifest(assigned: DataFrame, budget: Long): DataFrame =
    assigned
      .groupBy(col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("wt")).as("n_tokens"),
        min(col("h")).as("h_lo"),
        max(col("h")).as("h_hi")
      )
      .withColumn("fill_ppm", expr(s"n_tokens * 1000000L div ${budget}L"))

  /** 2^61 - 1 (Mersenne): digest sums are reduced mod a prime well above
    * any single 60-bit digest so the residue keeps full discriminating
    * power, while the decimal(38,0) accumulator keeps the sum itself
    * exact at any corpus size.
    */
  val DigestModulus = 2305843009213693951L

  /** Per-shard CONTENT digests — the integrity half of the export
    * contract (shardManifest is the layout half): a trainer (or a
    * re-run on different hardware / cluster size) recomputes these two
    * numbers per shard and compares. Both digests are ASSOCIATIVE
    * aggregations of the per-doc 60-bit digest ([[TextStats
    * .contentDigest60]]) — sum mod 2^61-1 and bit_xor — so they
    * map-side combine and never materialize an ordered fold; shard
    * membership (not intra-shard order) is what they certify, which is
    * exactly the invariant assignShards' (h, doc_id) pseudo-shuffle
    * makes reproducible. The digest join is id-keyed: at 100 TB the
    * digest side is 16 bytes/doc — the text never travels.
    *
    * A doc with NO digest row must poison its shard's digests, not
    * silently shrink them (round-7 advice: the old inner join dropped
    * such docs from n_docs AND both digests — an integrity certifier
    * that under-counted membership without a trace). Left join: the doc
    * stays in n_docs, and any null digest nulls the whole shard's
    * digest_sum/digest_xor — a loud, comparison-failing signal instead
    * of a plausible wrong digest.
    *
    * @param assigned output of [[assignShards]]
    * @param digests  (id, digest) — digest a nonneg long < 2^60
    */
  def shardDigests(assigned: DataFrame, digests: DataFrame): DataFrame =
    assigned
      .join(digests, Seq("id"), "left")
      .groupBy(col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        when(
          max(col("digest").isNull.cast("int")) === 1,
          lit(null).cast("long")
        ).otherwise(
          (sum(col("digest").cast("decimal(38,0)")) % lit(DigestModulus)).cast("long")
        ).as("digest_sum"),
        when(max(col("digest").isNull.cast("int")) === 1, lit(null).cast("long"))
          .otherwise(expr("bit_xor(digest)"))
          .as("digest_xor")
      )

  /** STRATIFIED shard assignment — the mixture-balancing complement of
    * [[assignShards]] (which packs a token budget in one global
    * pseudo-shuffle order and lets the source mix fall where it may).
    * Training runs that stream shards sequentially want every shard to
    * be an unbiased mini-corpus: each source's docs are ranked in
    * within-source pseudo-shuffle order ([[TextStats.portableHash]],
    * then doc id — deterministic and engine-portable) and dealt
    * round-robin: shard = (rank-1) mod nShards. By construction each
    * source's shard counts differ by at most one — the balance verdict
    * the output carries per row and the spec/oracle pin.
    *
    * Scale shape: the rank comes from [[Rank.rankWithin]] (two-pass,
    * no per-source single-task window); the mod is a projection; the
    * count aggregate is one (shard, source) shuffle of bounded output
    * (nShards × |sources| rows). No global order, no budget pass —
    * this planner is one exchange cheaper than assignShards because
    * balance, not fill, is the contract.
    */
  def stratifiedShards(
      docs: DataFrame,
      idCol: String,
      groupCol: String,
      nShards: Int
  ): DataFrame = {
    val ranked = Rank.rankWithin(
      docs.select(col(idCol).as("id"), col(groupCol).as("src"),
        TextStats.portableHash(col(idCol)).as("h")),
      Seq("src"),
      col("h"),
      col("id"),
      "rn",
      bins = 64
    )
    ranked.withColumn("shard_id", ((col("rn") - 1) % nShards).cast("long"))
  }

  /** Per-(shard, source) manifest for [[stratifiedShards]] with the
    * balance verdict: `src_balanced` is TRUE when the source's shard
    * counts differ by at most one across ALL nShards shards (a source
    * with fewer docs than shards leaves empty shards — min 0, so it is
    * balanced iff its max is 1).
    */
  def stratifiedManifest(assigned: DataFrame, nShards: Int): DataFrame = {
    val counts = assigned
      .groupBy(col("shard_id"), col("src"))
      .agg(count(lit(1)).as("n_docs"))
    val bySrc = counts
      .groupBy(col("src"))
      .agg(
        max(col("n_docs")).as("max_n"),
        min(col("n_docs")).as("min_n"),
        count(lit(1)).as("shards_used")
      )
      .withColumn(
        "src_balanced",
        (col("max_n") - when(col("shards_used") < nShards, lit(0L)).otherwise(col("min_n"))) <= 1L
      )
      .select(col("src"), col("src_balanced"))
    counts.join(broadcast(bySrc), Seq("src"))
      .select(col("shard_id"), col("src"), col("n_docs"), col("src_balanced"))
  }

  /** Per-shard ORDER digest — the other half of the reproducibility
    * contract. [[shardDigests]] certifies MEMBERSHIP (its sum/xor are
    * order-blind by design: swap two docs' digest values within a
    * shard and both digests hold). This digest certifies the
    * (h, doc_id) pseudo-shuffle ORDER a trainer will actually read:
    * Σ pos·digest mod 2^61-1, where pos is the doc's 1-based position
    * within its shard. Any intra-shard reordering of docs with
    * distinct digests changes the sum.
    *
    * Scale shape: pos comes from [[Rank.rankWithin]] (two-pass, no
    * per-shard single-task window); each row reduces to
    * (pos·digest) mod M BEFORE summing, so the running sum stays under
    * 19 digits per row and the decimal(38,0) accumulator is exact past
    * 10^19 rows per shard. Missing digest rows poison the shard's
    * order_digest to NULL (same loud-failure posture as
    * [[shardDigests]]).
    */
  /** GROUPED two-pass prefix sum: `cum_before` = running weight total
    * in deterministic (h, id) pseudo-shuffle order WITHIN each group —
    * [[assignShards]]'s distributed prefix sum generalized from one
    * global sequence to one sequence per group (per source, per
    * language, …). Same two passes: a per-(group, bucket) window is the
    * only full-data exchange; the offset frame is |groups|·`buckets`
    * rows, and its prefix scan windows over `bucket` WITHIN each group
    * — partitioned by group, so no single global-order task exists
    * anywhere in the plan. The epoch planner (q154) uses this to walk
    * each source in hash order until its token allocation is spent.
    *
    * @return grpCol + (id, h, wt, cum_before)
    */
  def groupedPrefixSum(
      docs: DataFrame,
      idCol: String,
      weightCol: Column,
      grpCol: String,
      buckets: Int = 64
  ): DataFrame = {
    val width = (HashSpace + buckets - 1) / buckets
    val d = docs.select(
      col(grpCol),
      col(idCol).as("id"),
      weightCol.cast("long").as("wt"),
      TextStats.portableHash(col(idCol)).as("h")
    )
    val withBucket = d.withColumn("bucket", (col("h") / lit(width)).cast("long"))
    val local = Window.partitionBy(col(grpCol), col("bucket")).orderBy(col("h"), col("id"))
    val cum = withBucket.withColumn("local_cum", sum(col("wt")).over(local))
    val offsets = withBucket
      .groupBy(col(grpCol), col("bucket"))
      .agg(sum(col("wt")).as("btot"))
      .withColumn(
        "boffset",
        coalesce(
          sum(col("btot")).over(
            Window
              .partitionBy(col(grpCol))
              .orderBy(col("bucket"))
              .rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select(col(grpCol), col("bucket"), col("boffset"))
    cum
      .join(broadcast(offsets), Seq(grpCol, "bucket"))
      .withColumn("cum_before", col("boffset") + col("local_cum") - col("wt"))
      .select(col(grpCol), col("id"), col("h"), col("wt"), col("cum_before"))
  }

  def shardOrderDigests(assigned: DataFrame, digests: DataFrame): DataFrame = {
    val joined = assigned.join(digests, Seq("id"), "left")
    Rank
      .rankWithin(joined, Seq("shard_id"), col("h"), col("id"), "pos", bins = 64)
      .withColumn(
        "term",
        (col("pos").cast("decimal(19,0)") * col("digest").cast("decimal(19,0)")) %
          lit(DigestModulus)
      )
      .groupBy(col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        when(max(col("digest").isNull.cast("int")) === 1, lit(null).cast("long"))
          .otherwise((sum(col("term")) % lit(DigestModulus)).cast("long"))
          .as("order_digest")
      )
  }
}
