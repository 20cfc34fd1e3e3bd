package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CONTEXT-WINDOW CHUNKING — split each document into fixed-size token
  * windows with a stride (overlap = window − stride), the step every
  * training-data / retrieval pipeline runs between curation and
  * tokenization (and the text twin of [[Multimodal.frameSample]]'s
  * byte-stride frame generator). The reference has no analogue; this
  * is part of the LLM-pipeline surface the engine adds.
  *
  * Shape: pure in-row column algebra — per doc, chunk starts are
  * `{i·stride : i·stride < n}` (so every doc, even a sub-window one,
  * yields ≥1 chunk and no chunk is empty), exploded map-side with NO
  * shuffle; the chunk text itself is a token-array slice, so nothing
  * is re-tokenized and the only data movement is the output itself.
  * At 100 TB this is embarrassingly parallel and stays inside
  * whole-stage codegen.
  *
  * Chunk-boundary law (replayed verbatim by the DuckDB oracle):
  * chunk i covers tokens [i·stride + 1, i·stride + min(window, n −
  * i·stride)] (1-based, inclusive), i ∈ [0, (n−1) div stride].
  */
object Chunker {

  /** One row per chunk: (idCol, chunk_id, n_chunk_tokens, chunk text
    * columns). `window` > 0, 0 < `stride` ≤ `window`.
    */
  def tokenChunks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      stride: Int
  ): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val start: Column = col("chunk_id") * stride
    docs
      .select(col(idCol), TextStats.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      // last start index = (n-1) div stride — INTEGER division (the
      // Column `/` operator is double division; `div` is the exact one)
      .select(
        col(idCol),
        col("__toks"),
        col("__n"),
        explode(sequence(lit(0L), expr(s"cast(__n - 1 as bigint) div $stride")))
          .as("chunk_id"))
      .select(
        col(idCol),
        col("chunk_id").cast("int").as("chunk_id"),
        least(lit(window), col("__n") - start).cast("long").as("n_chunk_tokens"),
        array_join(slice(col("__toks"), (start + 1).cast("int"), lit(window)), " ").as("chunk")
      )
  }
}
