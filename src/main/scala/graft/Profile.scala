package graft

import org.apache.spark.sql.functions._
import graft.ops.{Similarity, TextDedup}

/** Ad-hoc profiling main for the heavy dedup queries (not part of the
  * driver contract). Times each stage of the minhash pipeline separately.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    val sets = docs.select(col("doc_id"), TextDedup.tokenSet(col("text")).as("toks"))
    time("token_sets_count")(sets.count())
    val sig = sets.select(col("doc_id"), TextDedup.minhashSignature(col("toks"), 256).as("sig"))
    time("signatures_256")(sig.count())
    // raw join volume before distinct
    val banded0 = sets
      .select(col("doc_id"), TextDedup.minhashSignature(col("toks"), 256).as("sig"), size(col("toks")).as("sz"))
    val bandedRows = banded0
      .select(col("doc_id"), col("sz"),
        explode(array((0 until 16).map { b =>
          xxhash64(slice(col("sig"), b * 16 + 1, 16)).as("bsig")
        }.toIndexedSeq: _*)).as("bsig"))
    bandedRows.cache(); time("banded_rows")(println("banded=" + bandedRows.count()))
    val l0 = bandedRows.select(col("bsig"), col("doc_id").as("id_a"))
    val r0 = bandedRows.select(col("bsig"), col("doc_id").as("id_b"))
    time("raw_join")(println("prejoin=" + l0.join(r0, "bsig").filter(col("id_a") < col("id_b")).count()))
    val cands = TextDedup.lshCandidates(sets, "doc_id", "toks", bands = 16, rows = 16, sizeRatio = 0.9)
    time("candidates_16x16")(println("cands=" + cands.count()))
    cands.cache(); cands.count()
    val a = sets.select(col("doc_id").as("id_a"), col("toks").as("toks_a"))
    val b = sets.select(col("doc_id").as("id_b"), col("toks").as("toks_b"))
    val verified = cands
      .join(a, "id_a")
      .join(b, "id_b")
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))).cast("double"))
      .select(col("id_a"), col("id_b"),
        (col("inter") / (col("sz_a") + col("sz_b") - col("inter"))).as("jac"))
      .filter(col("jac") >= 0.9)
    time("verify_only")(println("pairs=" + verified.count()))
    verified.explain("formatted")
    val full = TextDedup.nearDupsMinhash(docs, "doc_id", "text", 0.9, bands = 16, rows = 16)
    time("full_pipeline")(println("pairs=" + full.count()))
    spark.catalog.clearCache()
    // ---- q31 stages
    val e = Tables.embeddings(spark, dir)
    val dotOne = e.select(Similarity.dot(col("embedding"), col("embedding")).as("d"))
    time("self_dot_2000")(dotOne.agg(sum("d")).collect())
    val buckets = e.select(col("vec_id"),
      Similarity.lshBucket(col("embedding"), 6, 64, 7700).as("b"))
    time("one_table_buckets")(buckets.agg(countDistinct("b")).collect())
    val nde = Similarity.nearDupsEmbedding(e, threshold = 0.35)
    time("embed_neardups_full")(println("epairs=" + nde.count()))
    spark.stop()
  }
}
