package graft

import org.apache.spark.sql.functions._

/** Plan-quality audit: prints the physical plan facts that matter at
  * scale (pushed filters, read schemas, join strategies, codegen spans)
  * for the core queries. Not part of the driver contract.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.local(4)
    val interesting = Seq("q1_agg", "q2_filter", "q3_enrich", "q4_watermark", "q9_topk", "q16_join_parts", "q5_dedup", "q6_latest", "q43_range_join")
    interesting.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toList
      val schemas = "ReadSchema: [^\\n]*".r.findAllIn(plan).toList
      val joins = plan.linesIterator.filter(l => l.contains("Join")).map(_.trim.take(90)).toList
      val wsc = plan.linesIterator.count(_.contains("WholeStageCodegen"))
      println(s"=== $name")
      pushed.foreach(p => println(s"  $p"))
      schemas.foreach(s => println(s"  ${s.take(120)}"))
      joins.foreach(j => println(s"  JOIN: $j"))
      println(s"  wholestage_codegen_nodes=$wsc")
      println(s"  topk=" + plan.linesIterator.find(_.contains("TakeOrdered")).map(_.trim.take(90)).getOrElse("-"))
    }
    spark.stop()
  }
}
