package graft

import org.apache.spark.sql.functions._
import graft.ops.{Similarity, TextDedup}

/** Ad-hoc profiling main for the heavy dedup queries (not part of the
  * driver contract). Times each stage of the minhash pipeline separately.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("q78")) { profileQ78(args.drop(1)); return }
    if (args.headOption.contains("q94")) { profileQ94(args.drop(1)); return }
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

  /** Stage-by-stage q94 (PQ-ADC) profile: `runMain graft.Profile q94
    * [sfDir] [reps]` — separates normalize+cache, codebook fit, the ADC
    * top-k, the exact baseline, rerank scoring, and the final audit
    * assembly. */
  private def profileQ94(args: Array[String]): Unit = {
    import graft.ops.Pq
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    spark.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q94/$tag] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val (m, ksub, iters, nQ, k) = (16, 16, 2, 50, 10)
    val shortlist = 8 * k
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep")
      spark.catalog.clearCache()
      val e = Tables
        .embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"), Pq.normalize(col("embedding")).as("vec"))
        .persist(MEMORY_AND_DISK)
      time("normalize_cache")(e.count())
      val codebooks = time("fit")(Pq.fit(e.filter(pmod(col("vec_id"), lit(4)) === 0), m, ksub, iters))
      val encoded = Pq.encode(e, codebooks)
      val queries = e.filter(col("vec_id") < nQ)
      val pq = Pq.adcTopK(queries, encoded, codebooks, shortlist).persist(MEMORY_AND_DISK)
      time("adcTopK")(pq.count())
      val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qemb"))
      val wx = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("xscore").desc, col("neighbor_id"))
      val exact = e
        .join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          Similarity.cosine(col("qemb"), col("embedding")).as("xscore"))
        .withColumn("xrank", row_number().over(wx))
        .filter(col("xrank") <= k)
      time("exact_baseline")(exact.count())
      val scoredShortlist = pq
        .join(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nemb")), Seq("neighbor_id"))
        .join(broadcast(q), Seq("query_id"))
        .withColumn("rscore", Similarity.cosine(col("qemb"), col("nemb")))
        .persist(MEMORY_AND_DISK)
      time("rerank_score")(scoredShortlist.count())
      time("final_assembly")(SparkEntry.queries("q94_pq_adc")(spark, dir).count())
      e.unpersist(); pq.unpersist(); scoredShortlist.unpersist()
    }
    spark.stop()
  }

  /** Stage-by-stage q78 (semantic dedup) profile: `runMain graft.Profile
    * q78 [sfDir] [reps]` — separates quantizer fit, soft assignment,
    * dedup (incl. hot-cell census), and each audit aggregate, so a
    * regression can be attributed to a stage rather than re-guessed. */
  private def profileQ78(args: Array[String]): Unit = {
    import graft.ops.{Ivf, SemanticDedup}
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    spark.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q78/$tag] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val tau = 0.35
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep")
      spark.catalog.clearCache()
      val e = Tables.embeddings(spark, dir)
      val cents = time("fit")(Ivf.fitCentroids(e, k = 8, iters = 2))
      val assigned = Ivf.assignTopM(e, cents, m = 3).persist(MEMORY_AND_DISK)
      time("assignTopM")(assigned.count())
      val deduped = SemanticDedup.assignReps(assigned, tau).persist(MEMORY_AND_DISK)
      time("assignReps")(deduped.count())
      time("keptViolations")(SemanticDedup.keptViolations(assigned, deduped, tau).collect())
      time("repViol")(
        deduped.agg(sum(when(col("rep_id") > col("vec_id"), 1).otherwise(0))).collect())
      val cells = deduped.select(col("vec_id"), col("cells"))
      val va = e.filter(col("vec_id") < 500).join(cells, Seq("vec_id"))
        .select(col("vec_id").as("id_a"), col("embedding").as("va"), col("cells").as("ca"))
      val vb = e.join(cells, Seq("vec_id"))
        .select(col("vec_id").as("id_b"), col("embedding").as("vb"), col("cells").as("cb"))
      time("cocluster")(
        va.crossJoin(vb)
          .filter(col("id_a") < col("id_b"))
          .filter(Similarity.cosine(col("va"), col("vb")) >= tau)
          .agg(avg(when(arrays_overlap(col("ca"), col("cb")), 1.0).otherwise(0.0)))
          .collect())
      assigned.unpersist(); deduped.unpersist()
    }
    spark.stop()
  }
}
