package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for the training-data pipeline extension:
  * exact (hash groupBy), MinHash+LSH banding, SimHash, n-gram Jaccard.
  *
  * Scale design (the 100 TB posture):
  *  - signatures are pure map-side expression work (codegen'd, no UDFs);
  *  - candidate generation is ONE shuffle keyed on (band, band-signature)
  *    — the LSH banding trick — never an O(n²) cross join;
  *  - verification touches only candidate pairs (a self-join on the
  *    band buckets), each verified with an exact Jaccard on the
  *    deduplicated token sets.
  */
object TextDedup {

  private val PRIME = 2147483647L // 2^31 - 1, Mersenne

  /** Deterministic (a, b) coefficients for the MinHash permutation family
    * h_i(x) = (a_i * x + b_i) mod PRIME, seeded so plans are stable
    * across runs and sessions.
    */
  private def coeffs(numHashes: Int, seed: Long): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numHashes)((rnd.nextInt(Int.MaxValue - 1).toLong + 1L, rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Distinct-token set column (the near-dup unit for this corpus). */
  def tokenSet(c: Column): Column = array_distinct(split(trim(c), "\\s+"))

  /** Word n-gram shingles (distinct). */
  def shingles(c: Column, n: Int): Column = {
    val toks = split(trim(c), "\\s+")
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))
      )
    )
  }

  /** MinHash signature: array of `numHashes` minima over the permuted
    * murmur3 hashes of the elements of `setCol`.
    */
  def minhashSignature(setCol: Column, numHashes: Int = 64, seed: Long = 1337L): Column = {
    val base = transform(setCol, t => hash(t).cast("long"))
    array(
      coeffs(numHashes, seed).map { case (a, b) =>
        array_min(transform(base, h => pmod(lit(a) * h + lit(b), lit(PRIME))))
      }.toIndexedSeq: _*
    )
  }

  /** Exact Jaccard between two array columns (on their distinct sets). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")

  /** LSH candidate pairs: explode each doc's signature into `bands` band
    * keys (`rows` hashes concatenated), self-join on the band key.
    * Returns distinct (id_a, id_b) with id_a < id_b.
    *
    * The self-join on (band, sig) is the scalable form: Spark shuffles
    * both sides by the band key, so bucket joins are partition-local.
    */
  def lshCandidates(
      df: DataFrame,
      idCol: String,
      setCol: String,
      bands: Int = 8,
      rows: Int = 8,
      seed: Long = 1337L
  ): DataFrame = {
    val sig = minhashSignature(col(setCol), bands * rows, seed)
    val banded = df
      .select(col(idCol), sig.as("sig"))
      .select(
        col(idCol),
        explode(
          array((0 until bands).map { b =>
            struct(
              lit(b).as("band"),
              concat_ws("_", transform(slice(col("sig"), b * rows + 1, rows), _.cast("string"))).as("bsig")
            )
          }.toIndexedSeq: _*)
        ).as("bk")
      )
      .select(col(idCol), col("bk.band"), col("bk.bsig"))
    val l = banded.select(col("band"), col("bsig"), col(idCol).as("id_a"))
    val r = banded.select(col("band"), col("bsig"), col(idCol).as("id_b"))
    l.join(r, Seq("band", "bsig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Full MinHash near-dup pipeline: candidates via LSH banding, verified
    * with exact token-set Jaccard >= `threshold`.
    */
  def nearDupsMinhash(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      bands: Int = 8,
      rows: Int = 8
  ): DataFrame = {
    val sets = df.select(col(idCol), tokenSet(col(textCol)).as("toks"))
    val cands = lshCandidates(sets, idCol, "toks", bands, rows)
    val a = sets.select(col(idCol).as("id_a"), col("toks").as("toks_a"))
    val b = sets.select(col(idCol).as("id_b"), col("toks").as("toks_b"))
    cands
      .join(a, "id_a")
      .join(b, "id_b")
      .select(col("id_a"), col("id_b"), jaccard(col("toks_a"), col("toks_b")).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** 64-bit SimHash over the token set: per bit, majority vote of the
    * token hashes' bits (+1/-1), folded into one long. Pure nested
    * higher-order-function expression — no UDF, fully distributed.
    */
  def simhash64(setCol: Column): Column =
    aggregate(
      transform(
        sequence(lit(0), lit(63)),
        b =>
          when(
            aggregate(
              // xxhash64, not murmur3-32: all 64 signature bits carry signal
              transform(setCol, t => xxhash64(t)),
              lit(0L),
              // shiftright/shiftleft via call_function: the Scala API wants
              // an Int literal but the bit index is a lambda variable.
              (acc, h) =>
                acc + when(call_function("shiftright", h, b).bitwiseAND(lit(1L)) === 1L, 1L)
                  .otherwise(-1L)
            ) > 0,
            call_function("shiftleft", lit(1L), b)
          ).otherwise(lit(0L))
      ),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x)
    )

  /** Hamming distance between two simhash longs. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("int")

  /** N-gram Jaccard near-dups with block-local pairing: pairs are only
    * formed inside `blockCol` groups (e.g. source), keeping the join
    * partition-local instead of O(n²) global.
    */
  def nearDupsNgram(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      n: Int,
      threshold: Double
  ): DataFrame = {
    val sets = df.select(col(blockCol), col(idCol), shingles(col(textCol), n).as("sh"))
    val a = sets.select(col(blockCol), col(idCol).as("id_a"), col("sh").as("sh_a"))
    val b = sets.select(col(blockCol), col(idCol).as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq(blockCol))
      .filter(col("id_a") < col("id_b"))
      .select(col(blockCol), col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jac"))
      .filter(col("jac") >= threshold)
  }
}
