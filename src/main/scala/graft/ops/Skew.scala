package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (the 100 TB posture item: "skewed
  * keys → salting or AQE skew-join").
  *
  * AQE's skew-join handling splits oversized partitions at runtime; this
  * operator is the static form for when one key dominates so heavily that
  * even a split partition hot-spots: the fact side gets a uniform salt in
  * [0, salt), the (small) dimension side is replicated `salt` times, and
  * the join key becomes (key, salt) — spreading one hot key over `salt`
  * reducers. Replication multiplies the dim side, so `salt` stays modest
  * and the dim stays the smaller input.
  */
object Skew {

  /** Inner equi-join with a salted key. Result equals the plain join
    * (every fact row still meets each matching dim row exactly once —
    * the dim copy with the fact row's salt).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn(
      "__salt",
      // uniform, deterministic per row content: hash of all fact columns
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(salt)).cast("int")
    )
    val saltedDim = dim.withColumn(
      "__salt",
      explode(array((0 until salt).map(lit): _*))
    )
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
