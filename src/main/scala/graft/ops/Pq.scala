package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding search — the MEMORY story at
  * 100 TB: a 64-dim float vector is 256 bytes; its PQ code is `m` small
  * integers (here 16 × 4 bits = 8 bytes packed, 32× smaller), so the
  * whole corpus index fits where the raw vectors never could, and an
  * approximate scan reads codes, not floats. Public-literature design
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search"):
  * split each vector into `m` subvectors, k-means each subspace into
  * `ksub` codewords, store each vector as its per-subspace codeword ids;
  * search scores a query against codes via ADC (asymmetric distance
  * computation) — the query's exact subvectors against the corpus's
  * quantized ones.
  *
  * Everything is map-side DataFrame algebra against ONE codebook
  * constant: the full m × ksub × dsub codebook travels as a single
  * nested-array `typedlit` (one Literal node — an unrolled
  * per-codeword form put thousands of literal nodes in every plan and
  * made Catalyst analysis the dominant cost), and assignment/scoring
  * loop over it with nested higher-order functions:
  *  - fitting: ONE job per Lloyd iteration — every subspace's argmin
  *    assignment in the same projection, one (subspace, code, pos)
  *    mean aggregate whose m·ksub·dsub-row result is the next codebook
  *    constant;
  *  - encoding: one corpus pass, no shuffle;
  *  - ADC search: Σ_s dot(q_sub_s, codeword(code_s)) as a fold over
  *    the codes array; on L2-normalized inputs this approximates
  *    cosine. The top-k is the only shuffle.
  * At 100 TB the codebooks are fit on a sample, the encode pass is the
  * only full scan, and ADC composes with IVF cells (q35) so a probe
  * scores ~nprobe/k of the codes.
  */
object Pq {

  /** L2-normalize an array<float> column to array<double>. */
  def normalize(v: Column): Column = {
    val n = sqrt(aggregate(transform(v, x => x.cast("double") * x), lit(0.0d), (acc, x) => acc + x))
    transform(v, x => x.cast("double") / n)
  }

  /** Dense (s)(code) → codeword form for the native expressions. */
  private def cbDense(codebooks: Array[Array[(Int, Array[Double])]]): Array[Array[Array[Double]]] =
    codebooks.map(_.sortBy(_._1).map(_._2))

  /** Native codegen'd per-subspace argmin codes (graft.expr.PqEncodeCodes
    * since round 5 — bit-identical to the interpreted HOF argmin it
    * replaced, which re-ran a lambda frame per (row, subspace, codeword);
    * see the expression's scaladoc for the accumulation-order contract).
    */
  private def codesNative(vec: Column, codebooks: Array[Array[(Int, Array[Double])]]): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(graft.expr.PqEncodeCodes(GraftShim.expression(vec), cbDense(codebooks)))
  }

  /** D²-weighted k-means++ seeding (Arthur & Vassilvitskii, SODA'07)
    * over an in-driver point sample — O(sample · k) scalar work on
    * codebook-sized data, deterministic for a fixed rng. (Restart
    * selection by sample potential was tried and measured WORSE on the
    * recall fixtures — the sample potential doesn't predict full-corpus
    * recall at these scales — so one seeding plus [[lloydOnSample]]
    * refinement is the kept design.) */
  private def kppInit(
      pts: Array[Array[Double]],
      k: Int,
      rnd: scala.util.Random
  ): Array[Array[Double]] = {
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val centers = scala.collection.mutable.ArrayBuffer(pts(rnd.nextInt(pts.length)))
    val minD2 = pts.map(p => d2(p, centers(0)))
    while (centers.length < k) {
      val total = minD2.sum
      val next =
        if (total <= 0) pts(rnd.nextInt(pts.length)) // all-duplicate sample: any point
        else {
          val target = rnd.nextDouble() * total
          var acc = 0.0; var idx = 0
          while (idx < pts.length - 1 && acc + minD2(idx) < target) { acc += minD2(idx); idx += 1 }
          // fp accumulation can run the scan off the end onto a
          // zero-weight (already-selected) point; D² seeding must never
          // pick one while positive mass remains — take the farthest
          // point instead (a duplicate codeword wastes a cell)
          if (minD2(idx) <= 0.0) pts(minD2.indexOf(minD2.max)) else pts(idx)
        }
      centers += next
      var i = 0
      while (i < pts.length) { minD2(i) = math.min(minD2(i), d2(pts(i), next)); i += 1 }
    }
    centers.toArray
  }

  /** Driver-side Lloyd refinement of an initial codebook ON THE SAMPLE
    * (the faiss-style "train on a sample" shape): cheap scalar work on
    * ≤ initSample points that hands the distributed iterations a
    * near-converged codebook, so the expensive full-corpus passes spend
    * their budget polishing, not recovering from a raw seeding. Empty
    * cells keep their codeword (standard k-means). Deterministic. */
  private def lloydOnSample(
      pts: Array[Array[Double]],
      init: Array[Array[Double]],
      iters: Int
  ): Array[Array[Double]] = {
    val dsub = init.head.length
    var centers = init
    for (_ <- 1 to iters) {
      val sums = Array.fill(centers.length, dsub)(0.0)
      val counts = Array.fill(centers.length)(0L)
      pts.foreach { p =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < centers.length) {
          var d = 0.0; var i = 0
          while (i < dsub) { val x = p(i) - centers(c)(i); d += x * x; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dsub) { sums(best)(i) += p(i); i += 1 }
        counts(best) += 1
      }
      centers = centers.zipWithIndex.map { case (cw, c) =>
        if (counts(c) == 0) cw else sums(c).map(_ / counts(c))
      }
    }
    centers
  }

  /** Fit all `m` subspace codebooks over a (normalized) corpus in ONE
    * Spark job per Lloyd iteration (plus one init job). Deterministic
    * init: seeded k-means++ per subspace on a hash-ordered sample of
    * `initSample` rows (the D² seeding avoids the first-rows
    * degeneracy — adjacent ids are often near-duplicates, which seeds
    * colliding codewords and wastes cells). The sample order is total
    * (xxhash64 with an id tie-break), so the init — and therefore the
    * whole fit — is reproducible across partitionings. Returns
    * codebooks(s)(code) = codeword. */
  def fit(
      corpus: DataFrame,
      m: Int,
      ksub: Int,
      iters: Int,
      idCol: String = "vec_id",
      vecCol: String = "vec",
      seed: Long = 0x9e3779b9L,
      initSample: Int = 512
  ): Array[Array[(Int, Array[Double])]] = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    var codebooks: Array[Array[(Int, Array[Double])]] = {
      val rows = corpus
        .orderBy(xxhash64(col(idCol)), col(idCol))
        .limit(math.max(ksub, initSample))
        .select(transform(col(vecCol), _.cast("double")).as("v"))
        .collect()
        .map(_.getSeq[Double](0).toArray)
      require(rows.length >= ksub,
        s"corpus has ${rows.length} rows < ksub=$ksub codewords; " +
          "shrink ksub or enlarge the fit sample")
      val rnd = new scala.util.Random(seed)
      (0 until m).toArray.map { s =>
        val pts = rows.map(_.slice(s * dsub, (s + 1) * dsub))
        lloydOnSample(pts, kppInit(pts, ksub, rnd), iters = 8)
          .zipWithIndex
          .map { case (cw, i) => i -> cw }
      }
    }
    for (_ <- 1 to iters) {
      // per-row codes from the native expression (computed ONCE per row
      // in its own projection), then the per-subspace explode reads them
      // by index — the HOF argmin used to re-run interpreted per cell
      val cells = transform(
        sequence(lit(0), lit(m - 1)),
        s => struct(
          s.as("s"),
          element_at(col("__codes"), s + 1).as("code"),
          slice(col(vecCol), s * dsub + 1, lit(dsub)).as("sv")
        )
      )
      val updated = corpus
        .select(col(vecCol), codesNative(col(vecCol), codebooks).as("__codes"))
        .select(explode(cells).as("c"))
        .select(col("c.s").as("s"), col("c.code").as("code"), posexplode(col("c.sv")))
        .groupBy(col("s"), col("code"), col("pos"))
        // decimal-accumulated mean, not avg(): double partial-state
        // merges are fetch-order-dependent, and a last-ulp codebook
        // difference can flip a near-tie code assignment and drift the
        // recorded self-audit figures run to run
        .agg((sum(col("col").cast("decimal(38,12)")).cast("double") /
          count(lit(1))).as("mval"))
        .collect() // m·ksub·dsub rows — the next codebook CONSTANT
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      codebooks = (0 until m).toArray.map { s =>
        val bySub = updated.filter(_._1 == s)
        (0 until ksub).toArray.map { code =>
          val cw = bySub.filter(_._2 == code).sortBy(_._3).map(_._4)
          // empty cell keeps its previous codeword (standard k-means)
          code -> (if (cw.nonEmpty) cw else codebooks(s)(code)._2)
        }
      }
    }
    codebooks
  }

  /** Encode every vector as its `m` codeword ids — one map-side pass,
    * no shuffle. Output: (idCol, codes array<int>). */
  def encode(
      corpus: DataFrame,
      codebooks: Array[Array[(Int, Array[Double])]],
      idCol: String = "vec_id",
      vecCol: String = "vec"
  ): DataFrame =
    corpus.select(col(idCol), codesNative(col(vecCol), codebooks).as("codes"))

  /** ADC score of a query vector column against a codes column:
    * Σ_s dot(q_sub_s, codebooks(s)(code_s)) — a fold over the codes
    * array against the codebook constant, pure map-side arithmetic. */
  def adcScore(
      qvec: Column,
      codes: Column,
      codebooks: Array[Array[(Int, Array[Double])]]
  ): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(
      graft.expr.PqAdcScore(
        GraftShim.expression(qvec),
        GraftShim.expression(codes),
        cbDense(codebooks)
      )
    )
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
