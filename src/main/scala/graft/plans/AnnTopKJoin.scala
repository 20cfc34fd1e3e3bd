package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DoubleType, LongType}

/** NATIVE whole-operator extension — the §2.10 preference-order item (c)
  * realized: a custom LogicalPlan + Rule[LogicalPlan] + SparkStrategy +
  * SparkPlan, registered through SparkSessionExtensions, for brute-force
  * cosine top-k against a BROADCAST query set.
  *
  * Why the built-ins genuinely can't express this shape: the declarative
  * form (crossJoin queries × corpus → cosine → per-query rank window)
  * materializes all n·q scored pairs INTO A SHUFFLE so the window can
  * rank them — at corpus scale that exchange IS the cost (n·q rows of
  * (long, long, double) on the wire). This operator instead holds the
  * per-query top-k HEAPS inside one pass over the corpus partitions
  * (O(q·k) state, no exchange below it) and emits only q·k rows per
  * partition; the final merge then ranks q·k·partitions rows — shuffle
  * bytes drop from n·q to q·k·partitions, the TakeOrderedAndProject
  * trick generalized per query. At 1000 executors × 100 TB this is the
  * difference between an all-pairs exchange and a scan.
  *
  * Cross-engine exactness: per-row cosine accumulates dot/norms in the
  * SAME ascending-index double fold as expr.CosineSimilarity (q25's
  * oracled primitive), and pruning inside the exec orders by the SAME
  * key the declarative merge and the oracle rank on — (round(sim,4)
  * DESC, id ASC), rounded via BigDecimal HALF_UP exactly like Spark's
  * `round` — so partial pruning can never drop a row the final rounded
  * ranking would have kept.
  */
case class AnnTopKJoinNode(
    queries: IndexedSeq[(Long, Array[Float])],
    k: Int,
    excludeSelf: Boolean,
    // output attributes are a CONSTRUCTOR argument, not a body val: a
    // body val would mint fresh exprIds on every copy() a tree
    // transform performs, orphaning parent references
    // (ATTRIBUTE_NOT_FOUND) — the builder creates them exactly once
    output: Seq[Attribute],
    child: LogicalPlan
) extends UnaryNode {
  // child contract: output(0) = id long, output(1) = vec array<float>
  // this operator GENERATES its output schema (it is not a projection
  // of the child) — declare it, or CheckAnalysis reports the attrs as
  // missing from the input (the Generate/MapGroups discipline)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan): AnnTopKJoinNode =
    copy(child = newChild)
  // never print the raw query vectors into plan strings / dumps
  override def argString(maxFields: Int): String =
    s"${queries.length} queries, k=$k, excludeSelf=$excludeSelf"
}

/** Degenerate-operator simplification: an empty query set or k ≤ 0 can
  * never emit a row — fold the whole subtree to an empty LocalRelation
  * before the planner ever sees it (the ConstantFolding discipline for
  * a whole operator).
  */
object DegenerateAnnTopK extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case n: AnnTopKJoinNode if n.k <= 0 || n.queries.isEmpty => LocalRelation(n.output)
  }
}

/** Planner strategy: the one-to-one physical mapping. */
object AnnTopKJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AnnTopKJoinNode =>
      AnnTopKJoinExec(n.queries, n.k, n.excludeSelf, n.output, planLater(n.child)) :: Nil
    case _ => Nil
  }
}

/** One pass over corpus partitions holding q bounded top-k buffers;
  * emits ≤ q·k rows per partition (query_id, neighbor_id, rounded sim).
  */
case class AnnTopKJoinExec(
    queries: IndexedSeq[(Long, Array[Float])],
    k: Int,
    excludeSelf: Boolean,
    output: Seq[Attribute],
    child: SparkPlan
) extends UnaryExecNode {

  override protected def withNewChildInternal(newChild: SparkPlan): AnnTopKJoinExec =
    copy(child = newChild)
  override def argString(maxFields: Int): String =
    s"${queries.length} queries, k=$k, excludeSelf=$excludeSelf"

  override protected def doExecute(): RDD[InternalRow] = {
    val qs = queries
    val kk = k
    val exclude = excludeSelf
    child.execute().mapPartitions { iter =>
      // per-query buffers of (simRounded, id): unsorted, the worst slot
      // located on demand — O(k) per replacement, O(1) per non-improving row
      val sims = Array.fill(qs.length)(new Array[Double](kk))
      val ids = Array.fill(qs.length)(new Array[Long](kk))
      val used = new Array[Int](qs.length)
      def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
        s1 < s2 || (s1 == s2 && i1 > i2) // (sim DESC, id ASC) ranking
      while (iter.hasNext) {
        val row = iter.next()
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val id = row.getLong(0)
          val vec = row.getArray(1)
          val n = vec.numElements()
          var qi = 0
          while (qi < qs.length) {
            val (qid, qv) = qs(qi)
            if (!(exclude && id == qid) && qv.length == n) {
              var dot = 0.0; var na = 0.0; var nb = 0.0
              var i = 0
              while (i < n) {
                val xf = vec.getFloat(i).toDouble
                val yf = qv(i).toDouble
                dot += xf * yf
                na += xf * xf
                nb += yf * yf
                i += 1
              }
              if (na != 0.0 && nb != 0.0) {
                val sim = BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
                  .setScale(4, BigDecimal.RoundingMode.HALF_UP)
                  .toDouble
                if (used(qi) < kk) {
                  sims(qi)(used(qi)) = sim; ids(qi)(used(qi)) = id; used(qi) += 1
                } else {
                  // find current worst, replace if this row ranks better
                  var w = 0; var j = 1
                  while (j < kk) {
                    if (worse(sims(qi)(j), ids(qi)(j), sims(qi)(w), ids(qi)(w))) w = j
                    j += 1
                  }
                  if (worse(sims(qi)(w), ids(qi)(w), sim, id)) {
                    sims(qi)(w) = sim; ids(qi)(w) = id
                  }
                }
              }
            }
            qi += 1
          }
        }
      }
      val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
      qs.indices.iterator.flatMap { qi =>
        (0 until used(qi)).iterator.map { j =>
          proj(new GenericInternalRow(Array[Any](qs(qi)._1, ids(qi)(j), sims(qi)(j)))).copy()
        }
      }
    }
  }
}

object AnnTopKJoin {

  /** Collect a bounded query set (the LSH-plane/IVF-centroid model-state
    * class — never point this at an unbounded frame). */
  def queriesFrom(df: DataFrame, idCol: String, vecCol: String): IndexedSeq[(Long, Array[Float])] =
    df.select(col(idCol).cast("long"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .toIndexedSeq
      .sortBy(_._1)

  /** Exact cosine top-k of `queries` over `corpus` via the native
    * operator: heavy pass in [[AnnTopKJoinExec]] (no exchange), final
    * rank over the q·k·partitions partials declaratively.
    */
  def topK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: IndexedSeq[(Long, Array[Float])],
      k: Int,
      excludeSelf: Boolean = true
  ): DataFrame = {
    val pruned = corpus.select(col(idCol).cast("long").as("__id"), col(vecCol).as("__vec"))
    val outAttrs = Seq(
      AttributeReference("query_id", LongType, nullable = false)(),
      AttributeReference("neighbor_id", LongType, nullable = false)(),
      AttributeReference("sim", DoubleType, nullable = false)()
    )
    val node = AnnTopKJoinNode(queries, k, excludeSelf, outAttrs, GraftShim.analyzed(pruned))
    val partials = GraftShim.ofRows(corpus.sparkSession, node)
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    partials
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }
}
