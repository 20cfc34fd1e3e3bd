object TimeQ {
  import org.apache.spark.sql.functions._
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.builder("local[32]", 32).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    (1 to 6).foreach { i =>
      val t0 = System.nanoTime()
      // replicate q27 but with eager materialization of the shared frames
      val df = graft.Tables.documents(s, "/root/testdata/sf0.1")
      val out = graft.ops.TextDedup.nearDupsMinhash(df, "doc_id", "text", 0.9, 16, 16)
        .select(col("id_a"), col("id_b"), round(col("jac"), 6).as("jac"))
        .orderBy(col("id_a"), col("id_b"))
      out.count()
      s.catalog.clearCache()
      println(f"TIMEQ q27#$i ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
  }
}
