package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J1: dimension-enrichment joins (SURVEY.md §2.3).
  *
  * The reference enriches each measurement with station metadata through a
  * memoized dict lookup (app/main.py:651-695, 790-823, 923-961) — the
  * build side of a broadcast hash join. Here the dimension side is
  * explicitly `broadcast()`-hinted: station/nation/region-class dims are
  * tiny relative to the fact table at any scale, so shipping them to every
  * executor avoids shuffling 100 TB of facts.
  */
object Enrich {

  /** customer ⋈ nation ⋈ region, dims broadcast. */
  def customerGeo(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))

  /** lineitem ⋈ part ⋈ supplier, dims broadcast. */
  def lineitemParts(lineitem: DataFrame, part: DataFrame, supplier: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part), lineitem("l_partkey") === part("p_partkey"))
      .join(broadcast(supplier), lineitem("l_suppkey") === supplier("s_suppkey"))

  /** Generic left-join enrichment on a key, dimension broadcast —
    * the exact shape of the reference's measurement×station lookup
    * (left join: measurements with unknown stations pass through with
    * nulls, matching the reference's `.get(...)` fallback-to-None).
    */
  def leftEnrich(fact: DataFrame, dim: DataFrame, key: String): DataFrame =
    fact.join(broadcast(dim), Seq(key), "left")
}
