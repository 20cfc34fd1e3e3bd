package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DISTRIBUTED TRIANGLE COUNTING — degree-ordered edge orientation
  * (the MapReduce-era standard from Suri & Vassilvitskii's "Counting
  * triangles and the curse of the last reducer", WWW'11):
  *
  *  1. canonicalize to undirected simple edges (u < v, no loops, no
  *     multi-edges);
  *  2. compute node degrees (one aggregate over the edge endpoints);
  *  3. orient every edge from its lower (degree, id) endpoint to the
  *     higher — a total order, so each triangle has exactly ONE node
  *     with two outgoing oriented edges (its lowest-order corner);
  *  4. wedges: self-join oriented edges on the source with an order
  *     predicate on the two destinations (each unordered destination
  *     pair forms once);
  *  5. close: equi-join each wedge's destination pair against the
  *     oriented edges — a wedge (u; a→b) plus edge (a, b) is one
  *     triangle, counted exactly once.
  *
  * Why degree-ordering and not min-id: a hub of degree d contributes
  * C(out-degree, 2) wedges; orienting toward HIGHER degree caps every
  * out-degree at O(√m), so total wedge volume is O(m^1.5) on any
  * graph — the min-id orientation lets one high-degree low-id hub emit
  * C(d, 2) wedges into a single task (the "last reducer"). Both joins
  * are plain equi shuffles on node ids; nothing iterates.
  */
object Triangles {

  /** Triangles as (u, v, w) rows, each triangle exactly once; node
    * order within a row follows the (degree, id) orientation.
    */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = edges
      .select(
        least(col(srcCol), col(dstCol)).as("cu"),
        greatest(col(srcCol), col(dstCol)).as("cv"))
      .where(col("cu") < col("cv"))
      .distinct()
    val deg = canon
      .select(col("cu").as("id"))
      .unionByName(canon.select(col("cv").as("id")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("deg"))
    def ord(d: Column, id: Column): Column = struct(d.as("d"), id.as("i"))
    val oriented = canon
      .join(deg.withColumnsRenamed(Map("id" -> "cu", "deg" -> "du")), "cu")
      .join(deg.withColumnsRenamed(Map("id" -> "cv", "deg" -> "dv")), "cv")
      .select(
        when(ord(col("du"), col("cu")) < ord(col("dv"), col("cv")), col("cu"))
          .otherwise(col("cv")).as("src"),
        when(ord(col("du"), col("cu")) < ord(col("dv"), col("cv")), col("cv"))
          .otherwise(col("cu")).as("dst"),
        when(ord(col("du"), col("cu")) < ord(col("dv"), col("cv")), ord(col("dv"), col("cv")))
          .otherwise(ord(col("du"), col("cu"))).as("dord")
      )
    val e1 = oriented.select(col("src"), col("dst").as("a"), col("dord").as("aord"))
    val e2 = oriented.select(col("src"), col("dst").as("b"), col("dord").as("bord"))
    val wedges = e1
      .join(e2, Seq("src"))
      .where(col("aord") < col("bord"))
      .select(col("src").as("u"), col("a"), col("b"))
    wedges
      .join(
        oriented.select(col("src").as("a"), col("dst").as("b")),
        Seq("a", "b"))
      .select(col("u"), col("a").as("v"), col("b").as("w"))
  }
}
