package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(13)

  /** Clustered corpus: `nClusters` centers in dim-d, members = center +
    * small noise. Near neighbors are intra-cluster by construction. */
  private def corpus(n: Int, dim: Int, nClusters: Int) = {
    val centers = Array.fill(nClusters, dim)(rnd.nextGaussian())
    (0 until n).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, c.map(v => (v + 0.15 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("encode: every code is a valid codebook index") {
    val df = corpus(200, 16, 4).select($"vec_id", Pq.normalize($"embedding").as("vec"))
    val cbs = Pq.fit(df, m = 4, ksub = 8, iters = 1)
    val bad = Pq.encode(df, cbs)
      .select(explode($"codes").as("c"))
      .filter($"c" < 0 || $"c" >= 8)
      .count()
    assert(bad === 0L)
  }

  test("adcScore equals the dot product against the reconstructed vector") {
    val df = corpus(100, 16, 4).select($"vec_id", Pq.normalize($"embedding").as("vec"))
    val cbs = Pq.fit(df, m = 4, ksub = 8, iters = 1)
    val enc = Pq.encode(df, cbs)
    val joined = df.join(enc, "vec_id")
    // manual reconstruction in Scala for 5 rows
    val rows = joined.select($"vec_id", $"vec", $"codes")
      .orderBy($"vec_id").limit(5)
      .as[(Long, Seq[Double], Seq[Int])].collect()
    val scored = joined
      .select($"vec_id", Pq.adcScore($"vec", $"codes", cbs).as("s"))
      .as[(Long, Double)].collect().toMap
    rows.foreach { case (id, vec, codes) =>
      val recon = codes.zipWithIndex.flatMap { case (c, s) => cbs(s)(c)._2 }
      val expect = vec.zip(recon).map { case (a, b) => a * b }.sum
      assert(math.abs(scored(id) - expect) < 1e-9, s"vec $id")
    }
  }

  test("Lloyd iterations do not increase quantization error") {
    val df = corpus(300, 16, 4).select($"vec_id", Pq.normalize($"embedding").as("vec"))
    def mse(iters: Int): Double = {
      val cbs = Pq.fit(df, m = 4, ksub = 8, iters = iters)
      val enc = Pq.encode(df, cbs)
      df.join(enc, "vec_id")
        .select($"vec_id", $"vec", $"codes")
        .as[(Long, Seq[Double], Seq[Int])]
        .collect()
        .map { case (_, vec, codes) =>
          val recon = codes.zipWithIndex.flatMap { case (c, s) => cbs(s)(c)._2 }
          vec.zip(recon).map { case (a, b) => (a - b) * (a - b) }.sum
        }
        .sum
    }
    assert(mse(2) <= mse(0) + 1e-9)
  }

  test("k-means++ init: deterministic per seed, audit contract holds across seeds") {
    val df = corpus(300, 16, 4).select($"vec_id", Pq.normalize($"embedding").as("vec"))
      .persist()
    df.count()
    def mse(cbs: Array[Array[(Int, Array[Double])]]): Double =
      df.join(Pq.encode(df, cbs), "vec_id")
        .select($"vec", $"codes")
        .as[(Seq[Double], Seq[Int])]
        .collect()
        .map { case (vec, codes) =>
          val recon = codes.zipWithIndex.flatMap { case (c, s) => cbs(s)(c)._2 }
          vec.zip(recon).map { case (a, b) => (a - b) * (a - b) }.sum
        }
        .sum
    for (seed <- Seq(1L, 7L, 99L)) {
      val a = Pq.fit(df, m = 4, ksub = 8, iters = 1, seed = seed)
      val b = Pq.fit(df, m = 4, ksub = 8, iters = 1, seed = seed)
      // init-invariance of the contract: same seed → bit-identical fit
      assert(a.map(_.toSeq.map { case (i, v) => (i, v.toSeq) }).toSeq ==
        b.map(_.toSeq.map { case (i, v) => (i, v.toSeq) }).toSeq, s"seed $seed not deterministic")
      // and every seed yields a full, finite, usable codebook
      assert(a.forall(_.length == 8))
      assert(a.forall(_.forall(_._2.forall(d => !d.isNaN && !d.isInfinite))))
      assert(mse(a).isFinite)
    }
    df.unpersist()
  }

  test("ADC top-k finds intra-cluster neighbors on clustered data") {
    val df = corpus(400, 16, 8).select($"vec_id", Pq.normalize($"embedding").as("vec"))
      .persist()
    df.count()
    val cbs = Pq.fit(df, m = 4, ksub = 16, iters = 2)
    val enc = Pq.encode(df, cbs)
    val queries = df.filter($"vec_id" < 20)
    val top = Pq.adcTopK(queries, enc, cbs, k = 8)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect()
    // cluster id = vec_id % 8 by construction
    val intra = top.count { case (q, n) => q % 8 == n % 8 }
    assert(intra.toDouble / top.length > 0.8,
      s"intra-cluster fraction ${intra.toDouble / top.length}")
    df.unpersist()
  }
}
