package graft

/** Probe: which Spark 4.1 SQL surfaces are live in this build?
  * (Scratch utility, not part of the contract.)
  */
object FeatureProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(2)
    def tryq(name: String, sql: String): Unit =
      try {
        val r = spark.sql(sql).collect().mkString("; ")
        println(s"PROBE $name OK: $r")
      } catch {
        case e: Throwable => println(s"PROBE $name FAIL: ${e.getMessage.take(200)}")
      }
    tryq(
      "recursive_cte",
      "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM t WHERE n < 5) SELECT sum(n) FROM t")
    tryq("variant", """SELECT variant_get(parse_json('{"a": 7}'), '$.a', 'int') AS v""")
    tryq("collation", "SELECT count(DISTINCT c) FROM VALUES ('Ab'), ('aB'), ('cd') AS t(x) " +
      "LATERAL VIEW explode(array(collate(x, 'UTF8_LCASE'))) v AS c")
    tryq("collate_simple", "SELECT 'Ab' = collate('aB', 'UTF8_LCASE') AS eq")
    tryq("lateral_join", "SELECT * FROM VALUES (1),(2) AS t(a), LATERAL (SELECT a + 1 AS b)")
    tryq("try_divide", "SELECT try_divide(1, 0)")
    spark.stop()
  }
}
