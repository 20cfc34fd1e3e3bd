package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SparseSimSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // 1 and 2 share their whole 3-gram stream (near-identical docs)
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon eta"),
    // 3 is disjoint from everything
    (3L, "one two three four five six"),
    // 4 shares a single 3-gram with 1/2 — below any sane threshold
    (4L, "gamma delta epsilon other words here"),
    // 5 too short for a full 3-gram window after the >= n filter? no:
    // 3 tokens = exactly one 3-gram; shares nothing
    (5L, "lone pair token")
  ).toDF("doc_id", "text")

  test("near-identical docs score high; disjoint docs never pair") {
    val post = SparseSim.postings(docs, "doc_id", "text", n = 3, dfCap = lit(1000.0))
    val pairs = SparseSim
      .allPairs(post, "doc_id", threshold = 0.0)
      .as[(Long, Long, Long, Double)]
      .collect()
      .map(r => (r._1, r._2) -> r._4)
      .toMap
    assert(pairs.contains((1L, 2L)))
    // 3 of 4 grams shared — but the UNSHARED tail grams carry the
    // highest idf (df=1), so the idf-weighted score sits well below
    // the raw 3/4 overlap; what matters is the ordering
    assert(pairs((1L, 2L)) > 0.4)
    assert(pairs((1L, 4L)) < pairs((1L, 2L)))
    assert(pairs((1L, 4L)) < 0.4) // single shared (df=3, low-idf) gram
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
    assert(!pairs.keySet.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("df-cap drops high-df features and bounds pair work") {
    // a feature present in EVERY doc (df=4) vanishes under dfCap=3,
    // taking its pairs with it
    val shared = Seq(
      (1L, "x y z a b"),
      (2L, "x y z c d"),
      (3L, "x y z e f"),
      (4L, "x y z g h")
    ).toDF("doc_id", "text")
    val capped = SparseSim.postings(shared, "doc_id", "text", n = 3, dfCap = lit(3.0))
    // "x y z" has df=4 > 3: gone; remaining grams are all df=1
    assert(capped.filter($"feature" === "x y z").count() === 0)
    val pairs = SparseSim.allPairs(capped, "doc_id", threshold = 0.0).count()
    assert(pairs === 0) // no shared feature survives the cap
    val uncapped = SparseSim.postings(shared, "doc_id", "text", n = 3, dfCap = lit(1000.0))
    assert(SparseSim.allPairs(uncapped, "doc_id", threshold = 0.0).count() === 6) // C(4,2)
  }

  test("cosine is exact 1.0 for identical docs; all-df=N corpora drop cleanly") {
    // two identical docs ALONE have idf 0 everywhere (df = N = 2):
    // zero norms, undefined cosine — the operator must yield no pair,
    // not a NaN that passes the threshold
    val twinOnly = Seq((10L, "p q r s t"), (11L, "p q r s t")).toDF("doc_id", "text")
    assert(
      SparseSim
        .allPairs(SparseSim.postings(twinOnly, "doc_id", "text", n = 3, dfCap = lit(1000.0)), "doc_id", 0.0)
        .count() === 0
    )
    // with a third doc breaking the degeneracy, identical docs score 1
    val twin = Seq(
      (10L, "p q r s t"),
      (11L, "p q r s t"),
      (12L, "u v w x y")
    ).toDF("doc_id", "text")
    val got = SparseSim
      .allPairs(SparseSim.postings(twin, "doc_id", "text", n = 3, dfCap = lit(1000.0)), "doc_id", 0.0)
      .as[(Long, Long, Long, Double)]
      .head()
    assert(got._1 === 10L && got._2 === 11L)
    assert(got._4 === 1.0) // identical pruned vectors
  }

  test("scale-following dfCap column resolves against the n_docs cross-join") {
    val post = SparseSim.postings(
      docs, "doc_id", "text", n = 3,
      dfCap = greatest(lit(2.0), col("n_docs") / 100.0)
    )
    // grams shared by docs 1/2/4 have df up to 3 > cap 2 -> dropped;
    // df<=2 grams (incl. the 1-2 shared tail) survive
    assert(post.filter($"feature" === "gamma delta epsilon").count() === 0)
    assert(post.filter($"feature" === "alpha beta gamma").count() === 2)
  }
}
