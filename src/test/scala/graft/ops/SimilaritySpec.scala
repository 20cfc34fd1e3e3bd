package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Similarity search: cosine correctness against hand math, brute top-k
  * ordering, and ANN recall on planted clustered vectors.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine matches hand computation") {
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b"))).as[Double].collect().head
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(got - expected) < 1e-12)
  }

  test("brute top-k returns nearest planted neighbor first") {
    // query 0 ≈ vec 1 (same direction), vec 2 orthogonal, vec 3 opposite
    val corpus = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f)),
      (3L, Array(-1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val queries = Seq((0L, Array(0.9f, 0.1f, 0f))).toDF("vec_id", "embedding")
    val got = Similarity
      .bruteTopK(corpus, queries, k = 3)
      .orderBy("rank")
      .select("neighbor_id")
      .as[Long]
      .collect()
      .toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  /** Deterministic clustered corpus: 8 well-separated centroids (one-hot
    * blocks) + small deterministic noise; queries are near-centroid
    * vectors. ANN must recover most of the brute-force top-k.
    */
  private def clustered(n: Int, dim: Int = 64): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(99)
    (0 until n).map { i =>
      val c = i % 8
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat * 0.05f)
      v(c * 8) += 1f // strong cluster direction
      i.toLong -> v
    }
  }

  test("ANN LSH recall@5 >= 0.6 on clustered data") {
    val data = clustered(400)
    val corpus = data.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 8)
    val brute = Similarity
      .bruteTopK(corpus, queries, k = 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)]
      .collect()
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2).toSet)
      .toMap
    val ann = Similarity
      .annTopK(corpus, queries, k = 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)]
      .collect()
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2).toSet)
      .toMap
    val recalls = brute.map { case (q, bs) =>
      ann.get(q).map(as => as.intersect(bs).size.toDouble / bs.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall@5 = $mean")
  }

  test("embedding near-dups finds planted duplicate pair") {
    val data = clustered(100)
    // plant an exact duplicate of vec 0 with id 1000
    val corpus = (data :+ (1000L -> data.head._2)).toDF("vec_id", "embedding")
    val pairs = Similarity
      .nearDupsEmbedding(corpus, threshold = 0.95)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(pairs.contains((0L, 1000L)))
  }
}
