package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim
import graft.expr.{BloomMightContain, BloomSketch}

/** Bloom-prefiltered join — a hand-rolled runtime filter.
  *
  * Build a Bloom filter over the build side's join keys (one OR-mergeable
  * 2^log2bits-bit aggregate), broadcast the single-row result, and drop
  * probe rows whose key is DEFINITELY absent BEFORE the probe side
  * shuffles. The exact join afterwards removes Bloom false positives, so
  * the result is row-identical to the plain join; the win is shuffle
  * volume — at 1% join selectivity the probe shuffle shrinks ~100×.
  *
  * This is what Spark's own InjectRuntimeFilter does for eligible
  * shuffle-join plans; owning the primitive makes the same trick usable
  * where the optimizer won't plant it (semantic filters, pre-aggregation
  * reduction, multi-stage pipelines that reuse the filter).
  *
  * Scale notes:
  *  - the filter is CONSTANT-SIZE state (128 KiB at log2bits=20) built
  *    with one partial+final aggregate over the build side — no driver
  *    collect, merged as byte-wise OR;
  *  - size log2bits ≈ log2(10·n_build) for ~1% false positives at k=7;
  *  - the probe-side filter is a map-side codegen'd expression
  *    (graft.expr.BloomMightContain) — zero extra shuffles.
  */
object BloomJoin {

  def bloomAgg(key: Column, log2bits: Int = 20, k: Int = 7): Column =
    GraftShim.column(
      BloomSketch(GraftShim.expression(key), log2bits, k).toAggregateExpression())

  def mightContain(bloom: Column, key: Column, k: Int = 7): Column =
    GraftShim.column(
      BloomMightContain(GraftShim.expression(bloom), GraftShim.expression(key), k))

  /** Drop `probe` rows whose `probeKey` is definitely not in
    * `build.buildKey`. Output is a superset of the semi join (Bloom
    * false positives survive) — compose with the exact join for exact
    * results.
    *
    * EAGER: the one-row filter aggregate is collected to the driver and
    * planted as a BinaryType literal (2^log2bits/8 bytes — 128 KiB at
    * the default — the same broadcast-scale constant class as the LSH
    * hyperplanes / IVF centroids). The column-reference alternative
    * (crossJoin a one-row frame) makes codegen's bound reference COPY
    * the whole filter per probe row — ~0.7 TB of allocation over a 6M-
    * row probe at default size. Spark's own runtime-filter rewrite
    * caches the deserialized filter for the same reason.
    */
  def prefilter(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      log2bits: Int = 20,
      k: Int = 7
  ): DataFrame = {
    val bf = build
      .agg(bloomAgg(col(buildKey), log2bits, k).as("__bf"))
      .collect()(0)
      .getAs[Array[Byte]](0)
    probe.filter(mightContain(lit(bf), col(probeKey), k))
  }

  /** Exact inner join with the Bloom prefilter planted on the probe side
    * — row-identical to `probe.join(build, probe(probeKey) ===
    * build(buildKey))`, minus the shuffled false-negative-free rows.
    */
  def join(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      log2bits: Int = 20,
      k: Int = 7
  ): DataFrame = {
    val filtered = prefilter(probe, build, probeKey, buildKey, log2bits, k)
    filtered.join(build, filtered(probeKey) === build(buildKey))
  }

  /** Exact ANTI join with a Bloom BYPASS — the incremental-ingest dedup
    * shape: rows whose key is DEFINITELY absent from `right` (no false
    * negatives, by construction) are keepers that skip the anti-join
    * shuffle entirely; only the "maybe present" sliver (true matches +
    * false positives, ~match-rate + fpr of the batch) shuffles into the
    * exact anti join that removes Bloom false positives. Row-identical
    * to `left.join(right, ..., "left_anti")`; at a 1% duplicate rate
    * the anti-join exchange carries ~1% of the batch.
    */
  def antiJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      log2bits: Int = 20,
      k: Int = 7
  ): DataFrame = {
    val bf = right
      .agg(bloomAgg(col(rightKey), log2bits, k).as("__bf"))
      .collect()(0)
      .getAs[Array[Byte]](0)
    // null-safe: a NULL key makes mightContain NULL, and both NOT NULL
    // and NULL filters would drop the row — but a plain left_anti KEEPS
    // null-key left rows (null never equals anything), so they must
    // land in the bypass
    val probeHit = coalesce(mightContain(lit(bf), col(leftKey), k), lit(false))
    val definitelyNew = left.filter(!probeHit)
    val maybe = left.filter(probeHit)
    definitelyNew.unionByName(
      maybe.join(right, maybe(leftKey) === right(rightKey), "left_anti")
    )
  }
}
