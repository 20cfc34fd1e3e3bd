package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.ops.Ivm
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class ChangeRow(k: String, w: Long, v: Long)

/** Streaming IVM ≡ batch laws:
  *  1. the streamed complete-mode view after two micro-batches equals
  *     viewOf over the union of the batches;
  *  2. viewOf over the union equals Ivm.maintain(viewOf(prefix),
  *     suffix) — the streaming state transition IS the changelog merge.
  * The changelog retracts every key's first insert in batch 2 and
  * fully kills one key, so the dead-group drop is exercised end to end.
  */
class StreamingIvmSpec extends SparkSpec {
  import spark.implicits._

  test("streamed view over two micro-batches equals batch view and the Ivm merge") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(3)
    val inserts = (1 to 400).map(i => ChangeRow(s"k${rnd.nextInt(20)}", 1L, rnd.nextInt(100).toLong))
    // retractions: undo the first 100 inserts; key "kill" dies entirely
    val prefix = inserts.take(300) ++ Seq(ChangeRow("kill", 1L, 7L))
    val suffix = inserts.drop(300) ++
      inserts.take(100).map(c => c.copy(w = -1L)) ++
      Seq(ChangeRow("kill", -1L, 7L))

    val input = MemoryStream[ChangeRow]
    val out = StreamingIvm.viewOf(input.toDF(), Seq("k"))
    val q = out.writeStream
      .format("memory")
      .queryName("ivm_stream")
      .outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("ivm_ckpt").toString)
      .start()
    try {
      input.addData(prefix.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(suffix.toIndexedSeq: _*)
      q.processAllAvailable()

      val streamed = spark
        .table("ivm_stream")
        .as[(String, Long, Long)]
        .collect()
        .toSet
      val union = (prefix ++ suffix).toDF()
      val batch = StreamingIvm.viewOf(union, Seq("k")).as[(String, Long, Long)].collect().toSet
      assert(streamed === batch)
      assert(!streamed.exists(_._1 == "kill"), "fully-retracted key must not appear")

      // law 2: streaming state transition == Ivm.maintain
      val oldAgg = StreamingIvm.viewOf(prefix.toDF(), Seq("k"))
      val merged = Ivm
        .maintain(oldAgg, suffix.toDF(), Seq("k"))
        .as[(String, Long, Long)]
        .collect()
        .toSet
      assert(merged === batch)
    } finally q.stop()
  }
}
