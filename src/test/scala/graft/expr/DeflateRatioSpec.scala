package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** deflate_ratio: monotone-in-repetition signal, SQL registration,
  * null/type handling, codegen under CODEGEN_ONLY.
  */
class DeflateRatioSpec extends SparkSpec {
  import spark.implicits._

  test("repetitive text compresses far below high-entropy text") {
    val repetitive = Seq.fill(200)("spam").mkString(" ")
    val entropic = (0 until 200).map(i => s"w${i * 2654435761L % 99991}").mkString(" ")
    val Seq(rRep, rEnt) = Seq(repetitive, entropic)
      .toDF("text")
      .selectExpr("deflate_ratio(text)")
      .as[Double]
      .collect()
      .toSeq
    assert(rRep < 0.1, s"repeated text should deflate hard, got $rRep")
    assert(rEnt > rRep * 3, s"entropic $rEnt vs repetitive $rRep")
    assert(rRep > 0.0 && rEnt <= 2.0)
  }

  test("kernel is deterministic and handles empty/null") {
    val df = Seq(Some("abc abc abc"), Some(""), None).toDF("text")
    val r1 = df.selectExpr("deflate_ratio(text)").collect()
    val r2 = df.selectExpr("deflate_ratio(text)").collect()
    assert(r1.toSeq == r2.toSeq)
    assert(r1(1).getDouble(0) == 1.0) // empty → 1.0 by contract
    assert(r1(2).isNullAt(0)) // null in → null out
  }

  test("two instances in one projection compile under CODEGEN_ONLY") {
    val conf = spark.conf
    val prevFallback = conf.get("spark.sql.codegen.fallback", "true")
    val prevFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val r = Seq(("aa aa aa aa aa aa", "zq xv jk mn pw rt"))
        .toDF("a", "b")
        .selectExpr("deflate_ratio(a)", "deflate_ratio(b)")
        .as[(Double, Double)]
        .collect()
        .head
      assert(r._1 < r._2)
    } finally {
      conf.set("spark.sql.codegen.fallback", prevFallback)
      conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  test("non-string input is rejected at analysis time") {
    val e = intercept[Exception] {
      Seq(1L).toDF("x").selectExpr("deflate_ratio(x)").collect()
    }
    assert(e.getMessage.contains("string"))
  }
}
