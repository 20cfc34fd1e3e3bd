package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ExportPlanSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1L to 300L).map(i => (i, s"doc $i", (i % 17 + 3).toInt)).toDF("doc_id", "text", "wt")

  test("two-pass prefix sum equals the single global window (the semantic definition)") {
    val got = ExportPlan
      .assignShards(corpus, "doc_id", $"wt", budget = 100L, buckets = 16)
      .select($"id", $"cum_before")
    val globalW = Window.orderBy($"h", $"id").rowsBetween(Window.unboundedPreceding, -1)
    val want = corpus
      .select($"doc_id".as("id"), $"wt", TextStats.portableHash($"doc_id").as("h"))
      .withColumn("cum_before", coalesce(sum($"wt").over(globalW), lit(0L)))
      .select($"id", $"cum_before")
    assert(got.except(want).count() === 0 && want.except(got).count() === 0)
  }

  test("output is invariant to the bucket knob and to input partitioning") {
    val base = ExportPlan.assignShards(corpus, "doc_id", $"wt", 100L, buckets = 64).collect().toSet
    val b1 = ExportPlan.assignShards(corpus, "doc_id", $"wt", 100L, buckets = 1).collect().toSet
    val b7 = ExportPlan.assignShards(corpus.repartition(7), "doc_id", $"wt", 100L, buckets = 7).collect().toSet
    assert(b1 === base)
    assert(b7 === base)
  }

  test("shards fill to the budget; no shard except a doc-overflow exceeds budget + max doc") {
    val budget = 100L
    val assigned = ExportPlan.assignShards(corpus, "doc_id", $"wt", budget, buckets = 8)
    val man = ExportPlan.shardManifest(assigned, budget).collect()
    val maxDoc = 19L // wt in [3, 19]
    man.foreach { r =>
      val tokens = r.getAs[Long]("n_tokens")
      assert(tokens <= budget + maxDoc, s"shard ${r.getAs[Long]("shard_id")} overflows: $tokens")
    }
    // shard ids are contiguous from 0 and docs are exhaustive
    val ids = man.map(_.getAs[Long]("shard_id")).sorted
    assert(ids.head === 0L && ids.last === ids.length - 1L)
    assert(man.map(_.getAs[Long]("n_docs")).sum === 300L)
  }

  test("hash ranges of consecutive shards are non-overlapping (a true global order)") {
    val assigned = ExportPlan.assignShards(corpus, "doc_id", $"wt", 100L, buckets = 8)
    val man = ExportPlan.shardManifest(assigned, 100L).orderBy($"shard_id").collect()
    man.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("h_hi") <= b.getAs[Long]("h_lo"))
      case _ =>
    }
  }

  test("shard digests: partition-invariant, membership-sensitive, equal to a driver-side fold") {
    val digests = corpus.select($"doc_id".as("id"), TextStats.contentDigest60($"text").as("digest"))
    val assigned = ExportPlan.assignShards(corpus, "doc_id", $"wt", 100L, buckets = 8)
    val got = ExportPlan.shardDigests(assigned, digests).orderBy($"shard_id").collect()

    // invariant to input partitioning (associative aggregates only)
    val reparted = ExportPlan
      .shardDigests(
        ExportPlan.assignShards(corpus.repartition(13), "doc_id", $"wt", 100L, buckets = 5),
        digests.repartition(11)
      )
      .orderBy($"shard_id")
      .collect()
    assert(got.toSeq === reparted.toSeq)

    // equal to an independent driver-side fold of the same membership
    val byShard = assigned
      .join(digests, Seq("id"))
      .select($"shard_id", $"digest")
      .collect()
      .groupBy(_.getAs[Long]("shard_id"))
    got.foreach { r =>
      val ds = byShard(r.getAs[Long]("shard_id")).map(_.getAs[Long]("digest"))
      val wantSum = (ds.map(BigInt(_)).sum % BigInt(ExportPlan.DigestModulus)).toLong
      val wantXor = ds.reduce(_ ^ _)
      assert(r.getAs[Long]("digest_sum") === wantSum)
      assert(r.getAs[Long]("digest_xor") === wantXor)
      assert(r.getAs[Long]("n_docs") === ds.length.toLong)
    }

    // membership drift flips the digest: move one doc's digest value
    val tampered = digests.withColumn(
      "digest",
      when($"id" === 1L, $"digest" + 1L).otherwise($"digest")
    )
    val bad = ExportPlan.shardDigests(assigned, tampered).orderBy($"shard_id").collect()
    assert(bad.toSeq !== got.toSeq)
  }

  test("stratified shards: every source balanced within 1 across shards; tiny sources stay balanced") {
    val S = 8
    // three sources: big (40), exact multiple (16), smaller than S (3)
    val docs = ((1L to 40L).map(i => (i, "big")) ++
      (100L to 115L).map(i => (i, "mid")) ++
      (200L to 202L).map(i => (i, "tiny"))).toDF("doc_id", "source")
    val assigned = ExportPlan.stratifiedShards(docs, "doc_id", "source", S)
    // exhaustive: every doc assigned exactly once, shard in [0, S)
    assert(assigned.count() === 59L)
    assert(assigned.filter($"shard_id" < 0 || $"shard_id" >= S).count() === 0L)
    val man = ExportPlan.stratifiedManifest(assigned, S).collect()
    man.foreach(r => assert(r.getAs[Boolean]("src_balanced"), s"unbalanced: $r"))
    // per-source count law: 40/8 → all 5s; 16/8 → all 2s; 3 docs → three 1s
    val bySrc = man.groupBy(_.getAs[String]("src"))
    assert(bySrc("big").map(_.getAs[Long]("n_docs")).forall(_ === 5L))
    assert(bySrc("mid").map(_.getAs[Long]("n_docs")).forall(_ === 2L))
    assert(bySrc("tiny").map(_.getAs[Long]("n_docs")).toSeq.sorted === Seq(1L, 1L, 1L))

    // the within-source order is the plain single-window rank (Rank law)
    val want = docs
      .withColumn("h", TextStats.portableHash($"doc_id"))
      .withColumn(
        "rn",
        row_number().over(Window.partitionBy($"source").orderBy($"h", $"doc_id")).cast("long")
      )
      .withColumn("shard_id", (($"rn" - 1) % S).cast("long"))
      .select($"doc_id".as("id"), $"shard_id")
    val got = assigned.select($"id", $"shard_id")
    assert(got.except(want).count() === 0 && want.except(got).count() === 0)
  }

  test("order digest: equals a driver-side fold, catches reordering that membership digests miss") {
    val digests = corpus.select($"doc_id".as("id"), TextStats.contentDigest60($"text").as("digest"))
    val assigned = ExportPlan.assignShards(corpus, "doc_id", $"wt", 100L, buckets = 8)
    val got = ExportPlan.shardOrderDigests(assigned, digests).orderBy($"shard_id").collect()

    // independent driver-side fold over the same (h, id) order
    val rows = assigned
      .join(digests, Seq("id"))
      .select($"shard_id", $"h", $"id", $"digest")
      .collect()
      .groupBy(_.getAs[Long]("shard_id"))
    got.foreach { r =>
      val ds = rows(r.getAs[Long]("shard_id"))
        .sortBy(x => (x.getAs[Long]("h"), x.getAs[Long]("id")))
        .map(_.getAs[Long]("digest"))
      val want = ds.zipWithIndex
        .map { case (d, i) => BigInt(i + 1) * BigInt(d) % BigInt(ExportPlan.DigestModulus) }
        .sum % BigInt(ExportPlan.DigestModulus)
      assert(r.getAs[Long]("order_digest") === want.toLong)
      assert(r.getAs[Long]("n_docs") === ds.length.toLong)
    }

    // swap two same-shard docs' digest VALUES: the multiset is
    // unchanged, so the MEMBERSHIP digests hold — but the ORDER digest
    // must move (that's the whole point of this certifier)
    val twoSameShard = assigned
      .orderBy($"shard_id", $"h", $"id")
      .select($"id", $"shard_id")
      .collect()
      .groupBy(_.getLong(1))
      .values
      .find(_.length >= 2)
      .get
      .take(2)
      .map(_.getLong(0))
    val Array(idA, idB) = twoSameShard
    val swapped = digests.withColumn(
      "digest",
      when($"id" === idA, digests.filter($"id" === idB).head().getAs[Long]("digest"))
        .when($"id" === idB, digests.filter($"id" === idA).head().getAs[Long]("digest"))
        .otherwise($"digest")
    )
    val memGot = ExportPlan.shardDigests(assigned, digests).orderBy($"shard_id").collect()
    val memSwp = ExportPlan.shardDigests(assigned, swapped).orderBy($"shard_id").collect()
    assert(memGot.toSeq === memSwp.toSeq, "membership digests should be order-blind")
    val ordSwp = ExportPlan.shardOrderDigests(assigned, swapped).orderBy($"shard_id").collect()
    assert(got.toSeq !== ordSwp.toSeq, "order digest failed to catch the reorder")
  }

  test("a doc with no digest row poisons its shard's digests instead of shrinking them") {
    // round-7 advice: the old inner join silently dropped such docs
    // from n_docs AND both digests — an under-counting certifier
    val digests = corpus
      .filter($"doc_id" =!= 42L)
      .select($"doc_id".as("id"), TextStats.contentDigest60($"text").as("digest"))
    val assigned = ExportPlan.assignShards(corpus, "doc_id", $"wt", 100L, buckets = 8)
    val out = ExportPlan.shardDigests(assigned, digests).collect()
    // membership is still fully counted
    assert(out.map(_.getAs[Long]("n_docs")).sum === 300L)
    // the shard holding doc 42 reports NULL digests (loud), every
    // other shard's digests are intact
    val shard42 = assigned.filter($"id" === 42L).select($"shard_id").head().getLong(0)
    out.foreach { r =>
      val isPoisoned = r.getAs[Long]("shard_id") == shard42
      assert(r.isNullAt(r.fieldIndex("digest_sum")) === isPoisoned)
      assert(r.isNullAt(r.fieldIndex("digest_xor")) === isPoisoned)
    }
  }

  private def grouped =
    (1L to 300L).map(i => (i, s"g${i % 5}", (i % 17 + 3).toInt)).toDF("doc_id", "grp", "wt")

  test("grouped prefix sum equals the per-group single window and is knob/partitioning-invariant") {
    val want = grouped
      .select($"grp", $"doc_id".as("id"), $"wt", TextStats.portableHash($"doc_id").as("h"))
      .withColumn(
        "cum_before",
        coalesce(
          sum($"wt").over(
            Window.partitionBy($"grp").orderBy($"h", $"id").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select($"grp", $"id", $"h", $"wt".cast("long").as("wt"), $"cum_before")
      .collect()
      .toSet
    val base = ExportPlan.groupedPrefixSum(grouped, "doc_id", $"wt", "grp", buckets = 16)
    assert(base.collect().toSet === want)
    assert(ExportPlan.groupedPrefixSum(grouped, "doc_id", $"wt", "grp", 1).collect().toSet === want)
    assert(
      ExportPlan
        .groupedPrefixSum(grouped.repartition(7), "doc_id", $"wt", "grp", 7)
        .collect()
        .toSet === want)
  }
}
