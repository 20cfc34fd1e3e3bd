package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SET-SIMILARITY SELF-JOIN with PREFIX FILTERING (the PPJoin family —
  * Chaudhuri et al. ICDE'06 primitive, Xiao et al. WWW'08): all pairs
  * of documents whose token-set Jaccard ≥ t, WITHOUT the all-pairs
  * product. Complements [[SparseSim]] (df-capped cosine): same
  * inverted-index shape, different pruning theorem —
  *
  * PREFIX LEMMA: order each set's tokens by a global total order
  * (ascending document frequency, then token — rarest first). If
  * J(A, B) ≥ t then |A∩B| ≥ ⌈t·|A∪B|⌉ ≥ ⌈t·|A|⌉, so A and B MUST
  * share a token within the first |A| − ⌈t·|A|⌉ + 1 tokens of each
  * ordering: emitting only that prefix into the inverted index finds
  * every qualifying pair (zero false negatives — the spec proves
  * equality against the exact all-pairs slice) while the index carries
  * the RAREST fraction of each set, exactly the tokens with the
  * shortest posting lists. Candidate volume collapses from Σ df² over
  * all tokens to Σ df² over rare prefixes.
  *
  * All arithmetic is integer (⌈t·n⌉ as (num·n + den − 1) div den,
  * Jaccard as ppm), so the DuckDB oracle replays the ENTIRE pipeline
  * relationally — df ranks, prefixes, candidates, verification — with
  * zero embedded literals.
  *
  * Scale shape: one explode + one df aggregate + one per-doc window
  * (fine-grained groups) + one equi join on prefix tokens + per-pair
  * exact verify on the (bounded) candidate set. No collect anywhere.
  */
object PrefixJoin {

  /** All (id_a < id_b) pairs with token-set Jaccard ≥ num/den (ppm
    * column included). `df` must have an id column and a TEXT column;
    * tokens are the whitespace token SET (distinct).
    */
  def jaccardSelfJoin(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      num: Int,
      den: Int
  ): DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"), array_distinct(TextStats.tokens(col(textCol))).as("ts"))
      .withColumn("n", size(col("ts")).cast("long"))
      .filter(col("n") > 0)
    val posting = toks.select(col("id"), col("n"), explode(col("ts")).as("tok"))
    val dfreq = posting.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("id")).orderBy(col("df"), col("tok"))
    // prefix length: n − ⌈t·n⌉ + 1 with ⌈t·n⌉ = (num·n + den − 1) div den
    val prefix = posting
      .join(dfreq, Seq("tok"))
      .withColumn("pos", row_number().over(w))
      .withColumn("pl", col("n") - expr(s"(($num * n) + ${den - 1}) div $den") + 1)
      .filter(col("pos") <= col("pl"))
      .select(col("tok"), col("id"), col("n"))
    val cand = prefix.as("a")
      .join(prefix.as("b"), col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // exact verify on candidates only: |A∩B| via array_intersect, then
    // the inclusion–exclusion union size — integer ppm threshold
    cand
      .join(toks.select(col("id").as("id_a"), col("ts").as("ts_a"), col("n").as("n_a")), Seq("id_a"))
      .join(toks.select(col("id").as("id_b"), col("ts").as("ts_b"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("ts_a"), col("ts_b"))).cast("long"))
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      .withColumn("jaccard_ppm", expr("cast((inter * 1000000) div uni as bigint)"))
      .filter(col("inter") * den >= col("uni") * num) // exact rational, no ppm rounding
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"), col("jaccard_ppm"))
  }
}
