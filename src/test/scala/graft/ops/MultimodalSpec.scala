package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal plumbing: schema contracts, frame explode arithmetic,
  * fixed-dim features, and the mapPartitions batch seam.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "abcdefghij"),     // 10 bytes
    (2L, "0123456789abcdef") // 16 bytes
  ).toDF("doc_id", "text")

  private val media = Multimodal.asMedia(docs, "doc_id", "text", "image")

  test("asMedia: binary column + typed metadata struct") {
    val sch = media.schema
    assert(sch("bytes").dataType == BinaryType)
    val meta = sch("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSeq == Seq("n_bytes", "width", "height", "sample_rate"))
    val m = media.filter(col("media_id") === 1L).select("meta.n_bytes").as[Int].head()
    assert(m == 10)
  }

  test("frameSample: explode produces ceil((len-frame)/stride)+1 frames of frame size") {
    val frames = Multimodal.frameSample(media, frameBytes = 4, stride = 3)
    val counts = frames.groupBy("media_id").count().as[(Long, Long)].collect().toMap
    // len 10: floor((10-4)/3)+1 = 3 frames; len 16: floor(12/3)+1 = 5
    assert(counts(1L) == 3 && counts(2L) == 5)
    val lens = frames.select(length(col("frame_bytes")).cast("int")).as[Int].collect()
    assert(lens.forall(_ <= 4) && lens.count(_ == 4) >= 6)
  }

  test("featureExtract: fixed-dim float vector in [-1,1), deterministic") {
    val f1 = Multimodal.featureExtract(media, dim = 16).select("features").as[Seq[Float]].collect()
    val f2 = Multimodal.featureExtract(media, dim = 16).select("features").as[Seq[Float]].collect()
    assert(f1.forall(_.size == 16))
    assert(f1.flatten.forall(v => v >= -1f && v < 1f))
    assert(f1.map(_.toList).toSeq == f2.map(_.toList).toSeq) // deterministic
  }

  test("resizeStub: truncates bytes and updates metadata") {
    val r = Multimodal.resizeStub(media, targetBytes = 8)
    r.collect().foreach { row =>
      val n = row.getAs[Array[Byte]]("bytes").length
      assert(n <= 8)
      assert(row.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("n_bytes") == n)
    }
  }

  test("q54 media-dedup integration: identical payloads all found via the embedding path") {
    val r = graft.Queries.q54MediaDedup(spark, "/root/testdata/sf0.001").collect().head
    assert(r.getAs[Long]("n_exact") > 0, "corpus lost its identical payloads")
    assert(r.getAs[Double]("recall") == 1.0,
      s"identical media payloads (cosine 1.0, identical buckets) must all be found: $r")
  }

  test("frame-level dedup: shared frames across different media found by fingerprint join") {
    // two videos that share a middle segment + one unrelated
    val vids = Seq(
      (1L, "AAAABBBBCCCC"),
      (2L, "XXXXBBBBZZZZ"), // shares frame "BBBB" with 1
      (3L, "MMMMNNNNOOOO")
    ).toDF("doc_id", "text")
    val frames = Multimodal
      .frameSample(Multimodal.asMedia(vids, "doc_id", "text", "video"), frameBytes = 4, stride = 4)
      .select(col("media_id"), col("frame_idx"), md5(col("frame_bytes")).as("fp"))
    val a = frames.select(col("media_id").as("m_a"), col("frame_idx").as("i_a"), col("fp"))
    val b = frames.select(col("media_id").as("m_b"), col("frame_idx").as("i_b"), col("fp"))
    val shared = a
      .join(b, "fp")
      .filter(col("m_a") < col("m_b"))
      .select("m_a", "m_b", "i_a", "i_b")
      .as[(Long, Long, Int, Int)]
      .collect()
      .toSet
    assert(shared == Set((1L, 2L, 1, 1)), s"got $shared")
  }

  test("decodeBatchStub: per-partition batched kernel computes stable checksums") {
    val out = Multimodal.decodeBatchStub(media).collect().toMap
    assert(out(1L) == "abcdefghij".getBytes.map(_ & 0xff).map(_.toLong).sum)
    assert(out(2L) == "0123456789abcdef".getBytes.map(_ & 0xff).map(_.toLong).sum)
  }
}
