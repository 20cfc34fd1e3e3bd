package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding search — the MEMORY story at
  * 100 TB: a 64-dim float vector is 256 bytes; its PQ code is `m` small
  * integers (here 8 × 4 bits = 4 bytes packed, 32–64× smaller), so the
  * whole corpus index fits where the raw vectors never could, and an
  * approximate scan reads codes, not floats. Public-literature design
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search"):
  * split each vector into `m` subvectors, k-means each subspace into
  * `ksub` codewords, store each vector as its per-subspace codeword ids;
  * search scores a query against codes via ADC (asymmetric distance
  * computation) — the query's exact subvectors against the corpus's
  * quantized ones.
  *
  * Everything is map-side DataFrame algebra against codebook CONSTANTS
  * (m × ksub × dsub floats — the same broadcast class as LSH planes and
  * IVF centroids):
  *  - fitting: Lloyd iterations per subspace where assignment is an
  *    argmin fold over a scored struct array (zero shuffle, the
  *    Ivf.assign shape with L2 instead of cosine) and the update is
  *    posexplode → per-(code, dim) mean;
  *  - encoding: one corpus pass, no shuffle — `m` argmin folds;
  *  - ADC search: score = Σ_s dot(q_sub_s, codeword(code_s)) computed
  *    as `m` dot products against element_at lookups into the codebook
  *    literal; on L2-normalized inputs this approximates cosine.
  * At 100 TB the codebooks are fit on a sample, the encode pass is the
  * only full scan, and ADC composes with IVF cells (q35) so a probe
  * scores ~nprobe/k of the codes.
  */
object Pq {

  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, v) => acc + v)

  /** L2-normalize an array<float> column to array<double>. */
  def normalize(v: Column): Column = {
    val n = sqrt(aggregate(transform(v, x => x.cast("double") * x), lit(0.0d), (acc, x) => acc + x))
    transform(v, x => x.cast("double") / n)
  }

  /** Deterministic per-subspace Lloyd's k-means. Input must already be
    * the sliced subspace (array column of length dsub). Returns
    * (code_id, codeword array<double>) — ksub rows. Init = first ksub
    * rows by id (deterministic; sample-based init is the production
    * note, as in Ivf.fitCentroids).
    */
  def fitCodebook(
      sub: DataFrame,
      ksub: Int,
      iters: Int,
      idCol: String,
      vecCol: String
  ): DataFrame = {
    val spark = sub.sparkSession
    val init = sub
      .orderBy(col(idCol))
      .limit(ksub)
      .select(transform(col(vecCol), _.cast("double")).as("cw"))
      .collect()
      .zipWithIndex
      .map { case (r, i) => org.apache.spark.sql.Row(i, r.getSeq[Double](0)) }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "code_id", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField(
        "cw",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType),
        nullable = true)
    ))
    var codebook = spark.createDataFrame(java.util.Arrays.asList(init: _*), schema)
    for (_ <- 1 to iters) {
      val cws = codebookArrays(codebook)
      val assigned = sub.select(
        col(vecCol),
        argminCode(col(vecCol), cws).as("code_id")
      )
      codebook = assigned
        .select(col("code_id"), posexplode(col(vecCol)))
        .groupBy(col("code_id"), col("pos"))
        .agg(avg(col("col").cast("double")).as("m"))
        .groupBy(col("code_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pairs"))
        .select(col("code_id"), transform(col("pairs"), p => p.getField("m")).as("cw"))
    }
    codebook
  }

  /** Materialize one subspace codebook as plan constants (ksub × dsub
    * doubles — broadcast class, not a data collect). */
  def codebookArrays(codebook: DataFrame): Array[(Int, Array[Double])] =
    codebook
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)

  /** Zero-shuffle argmin: nearest codeword id by L2, smaller id wins
    * ties (array_min over (dist, code) structs). */
  private def argminCode(sub: Column, cws: Array[(Int, Array[Double])]): Column = {
    val scored = array(cws.map { case (cid, cw) =>
      val cwCol = array(cw.map(v => lit(v)).toIndexedSeq: _*)
      struct(sqDist(sub, cwCol).as("dist"), lit(cid).as("code"))
    }.toIndexedSeq: _*)
    array_min(scored).getField("code")
  }

  /** Fit all `m` subspace codebooks over a (normalized) corpus.
    * Returns the in-memory codebooks: codebooks(s)(code) = codeword. */
  def fit(
      corpus: DataFrame,
      m: Int,
      ksub: Int,
      iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "vec"
  ): Array[Array[(Int, Array[Double])]] = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    (0 until m).toArray.map { s =>
      val sub = corpus.select(col(idCol), slice(col(vecCol), s * dsub + 1, dsub).as(vecCol))
      codebookArrays(fitCodebook(sub, ksub, iters, idCol, vecCol))
    }
  }

  /** Encode every vector as its `m` codeword ids — one map-side pass,
    * no shuffle. Output: (idCol, codes array<int>). */
  def encode(
      corpus: DataFrame,
      codebooks: Array[Array[(Int, Array[Double])]],
      idCol: String = "vec_id",
      vecCol: String = "vec"
  ): DataFrame = {
    val m = codebooks.length
    val dsub = codebooks.head.head._2.length
    val codes = array((0 until m).map { s =>
      argminCode(slice(col(vecCol), s * dsub + 1, dsub), codebooks(s)).cast("int")
    }.toIndexedSeq: _*)
    corpus.select(col(idCol), codes.as("codes"))
  }

  /** ADC score of a query vector column against a codes column:
    * Σ_s dot(q_sub_s, codebooks(s)(code_s)). Each subspace lookup is an
    * element_at into a codebook literal — pure map-side arithmetic. */
  def adcScore(
      qvec: Column,
      codes: Column,
      codebooks: Array[Array[(Int, Array[Double])]]
  ): Column = {
    val m = codebooks.length
    val dsub = codebooks.head.head._2.length
    (0 until m).map { s =>
      val cbLit = array(codebooks(s).map { case (_, cw) =>
        array(cw.map(v => lit(v)).toIndexedSeq: _*)
      }.toIndexedSeq: _*)
      val cw = element_at(cbLit, element_at(codes, s + 1) + 1)
      aggregate(
        zip_with(slice(qvec, s * dsub + 1, dsub), cw, (a, b) => a * b),
        lit(0.0d),
        (acc, v) => acc + v
      )
    }.reduce(_ + _)
  }

  /** PQ-ADC top-k: score every (query, code) pair and keep each query's
    * k best — map-side scoring, one WindowGroupLimit-pruned shuffle for
    * the top-k (the q25 shape; compose with IVF cells to scan a subset
    * at 100 TB). Ties break toward the smaller neighbor id. */
  def adcTopK(
      queries: DataFrame,
      encoded: DataFrame,
      codebooks: Array[Array[(Int, Array[Double])]],
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "vec"
  ): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val e = encoded.select(col(idCol).as("neighbor_id"), col("codes"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    e.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        adcScore(col("qvec"), col("codes"), codebooks).as("score")
      )
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
