package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graftshim.GraftShim
object NativeVsDecl {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val NQ = args.headOption.map(_.toInt).getOrElse(10)
    val e = Tables.embeddings(spark, dir).persist()
    e.count()
    val qs = graft.plans.AnnTopKJoin.queriesFrom(
      e.filter(col("vec_id") >= 10 && col("vec_id") < 10 + NQ), "vec_id", "embedding")
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f; val dt = (System.nanoTime() - t0) / 1e9
      require(n > 0); dt
    }
    def native(): Long =
      graft.plans.AnnTopKJoin.topK(e, "vec_id", "embedding", qs, k = 10).count()
    def decl(): Long = {
      val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      val q = e.filter(col("vec_id") >= 10 && col("vec_id") < 10 + NQ)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
      broadcast(q).crossJoin(c)
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("sim", round(GraftShim.column(graft.expr.CosineSimilarity(
          GraftShim.expression(col("cv")), GraftShim.expression(col("qv")))), 4))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10).count()
    }
    // warm both, then median-of-3 each
    native(); decl()
    val tn = Seq.fill(3)(time(native())).sorted.apply(1)
    val td = Seq.fill(3)(time(decl())).sorted.apply(1)
    println(f"NATIVE median $tn%.3f s   DECLARATIVE median $td%.3f s   ratio ${td / tn}%.2f x")
  }
}
