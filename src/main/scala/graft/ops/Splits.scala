package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-SAFE dataset splitting: train/val/test assignment that
  * near-duplicate clusters cannot straddle.
  *
  * q85's census shows WHY this operator exists: a per-document hash
  * split leaks — near-identical docs land in train AND eval, and the
  * eval set silently overlaps the training distribution (the published
  * dedup-before-split discipline; cf. reference's dedup-before-upsert
  * ordering in its merge pipeline, app/main.py upsert path). The fix is
  * to key the split hash on the near-dup COMPONENT label instead of the
  * document id: every member of a cluster shares the label, so the
  * whole cluster lands in one split by construction — the leak count is
  * provably zero, and the query layer re-derives it as an audit rather
  * than asserting it.
  *
  * Scale shape: `pairs` comes from any candidate generator — LSH bands
  * (TextDedup) at corpus scale, the exact O(n²) baseline only on
  * bounded audit slices. Component labels are one
  * [[Components.connectedComponents]] run (O(diameter) keyed
  * joins); the assignment itself is a LEFT join on the id key plus one
  * map-side multiplicative hash — no extra shuffle beyond the label
  * join, and singleton docs (absent from `pairs`) never enter the
  * component state at all.
  */
object Splits {

  /** Assign each doc a split from the hash of its near-dup component
    * label (its own id when unclustered).
    *
    * @param docs       input frame; every row keeps its columns
    * @param pairs      two-column near-dup edge frame (idCol domain)
    * @param idCol      document id column name in `docs`
    * @param trainUpTo  portableHash range upper bound for "train"
    * @param valUpTo    portableHash range upper bound for "val"
    * @return docs + `component` (nullable — null for singletons),
    *         `split_key` (component label or own id), `split`
    */
  def componentSplit(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String,
      trainUpTo: Long = 800000L,
      valUpTo: Long = 900000L
  ): DataFrame = {
    val comps = Components
      .connectedComponents(pairs)
      .withColumnRenamed("id", idCol)
    val keyed = docs
      .join(comps, Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("component"), col(idCol)))
    val h = TextStats.portableHash(col("split_key"))
    keyed.withColumn(
      "split",
      when(h < trainUpTo, "train").when(h < valUpTo, "val").otherwise("test")
    )
  }
}
