package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for the training-data pipeline extension: media as
  * opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / resize / frame-sample stages.
  *
  * The container has no image/audio codecs, so the DECODE KERNELS ARE
  * DETERMINISTIC STUBS (clearly marked below): they compute fake but
  * stable values from the bytes. Everything around them — the schema, the
  * binary column handling, the per-partition batching seam, the frame
  * explode, the fixed-dim feature vectors — is the real Spark plumbing a
  * production codec would slot into.
  *
  * Scale notes: all stages are map-side (no shuffles); frame sampling is a
  * generator (posexplode) so one 100 MB video row becomes many frame rows
  * without driver involvement; feature extraction emits fixed-dim vectors
  * ready for graft.ops.Similarity.
  */
object Multimodal {

  /** Wrap any payload column as a media row: opaque bytes + typed metadata
    * derived (deterministically) at ingest. Metadata travels as a struct —
    * the "typed metadata" half of the multimodal contract.
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      lit(kind).as("kind"),
      col(payloadCol).cast("binary").as("bytes")
    ).withColumn(
      "meta",
      struct(
        length(col("bytes")).cast("int").as("n_bytes"),
        // STUB: a real decoder reads the container header; we derive
        // stable fake dimensions from the byte length.
        (pmod(length(col("bytes")), lit(640)) + 32).cast("int").as("width"),
        (pmod(length(col("bytes")), lit(480)) + 32).cast("int").as("height"),
        lit(16000).cast("int").as("sample_rate")
      )
    )

  /** STUB image decode: a real implementation hands `bytes` to a codec
    * (e.g. libjpeg via JNI) inside this same column contract. The stub
    * emits a deterministic 8-value "pixel summary" from the bytes.
    */
  def decodeImageStub(media: DataFrame): DataFrame =
    media.withColumn(
      "pixels",
      transform(
        sequence(lit(0), lit(7)),
        i => pmod(xxhash64(col("bytes"), i), lit(256L)).cast("int")
      )
    )

  /** Fixed-dim float feature vector from the bytes (STUB featurizer: a
    * real model server / ONNX runtime slots in here; the column contract —
    * array<float> of fixed dim — is what downstream Similarity needs).
    */
  def featureExtract(media: DataFrame, dim: Int = 64): DataFrame =
    media.withColumn(
      "features",
      transform(
        sequence(lit(0), lit(dim - 1)),
        d => (pmod(xxhash64(col("bytes"), d), lit(2000L)).cast("double") / 1000.0 - 1.0).cast("float")
      )
    )

  /** Resize STUB: clamp/pad the payload to `targetBytes` (a real resize
    * re-encodes; the stub keeps the binary column contract + lengths).
    */
  def resizeStub(media: DataFrame, targetBytes: Int): DataFrame =
    media.withColumn("bytes", substring(col("bytes"), 1, targetBytes))
      .withColumn("meta", col("meta").withField("n_bytes", length(col("bytes")).cast("int")))

  /** Frame sampling: split the payload into fixed-size frames with a
    * stride and explode one row per frame — the generator shape of video
    * pipelines (each frame row carries its index + its own bytes).
    */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = greatest(
      floor((length(col("bytes")) - frameBytes).cast("double") / stride).cast("int") + 1,
      lit(1)
    )
    media.select(
      col("*"),
      posexplode(
        transform(
          sequence(lit(0), nFrames - 1),
          i => substring(col("bytes"), (i * stride + 1).cast("int"), lit(frameBytes))
        )
      ).as(Seq("frame_idx", "frame_bytes"))
    )
  }

  /** The mapPartitions seam: per-partition batched decode, the Scala
    * analogue of mapInPandas — a real codec would amortize native-lib
    * init across each partition's iterator exactly here. STUB kernel:
    * byte-sum checksum per row.
    */
  def decodeBatchStub(media: DataFrame): Dataset[(Long, Long)] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init happens ONCE (this is where a codec handle
        // or model session would be created)
        rows.map { case (id, bytes) =>
          var acc = 0L
          var i = 0
          while (i < bytes.length) { acc += bytes(i) & 0xff; i += 1 }
          (id, acc)
        }
      }
  }
}
