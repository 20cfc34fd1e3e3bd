package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DISTRIBUTED dense ranking — `row_number() over (partition by G order
  * by v, id)` without ever collapsing a partition group into one task.
  *
  * `Window.partitionBy(G).orderBy(...)` ships every row of a group
  * through ONE task — fine when G is fine-grained, fatal when a group
  * is a whole language/source at 100 TB (the same failure mode the
  * export planner's global-order window had, ExportPlan's scaladoc).
  * Same cure, generalized from hash-order to VALUE order:
  *
  *  1. one bounded aggregate computes per-group [min, max] of the order
  *     value (|G| rows, broadcast back);
  *  2. each row maps into one of `bins` RANGE bins of its group's value
  *     span — a deterministic monotonic function of the value, so equal
  *     values can never straddle a bin boundary and within-bin order is
  *     total;
  *  3. a per-(group, bin) window ranks locally — the only full-data
  *     shuffle, and each task sees ~1/bins of a group;
  *  4. per-(group, bin) counts (|G|·bins rows, bounded by the knob) get
  *     an exclusive prefix scan over bin index and broadcast back as
  *     offsets; rank = offset + local rank.
  *
  * Output is EXACTLY the single-window definition (the spec asserts
  * equality; the q117 oracle replays the single-window form) — the
  * two-pass shape changes the plan, never the answer, including the
  * null corners (round 8): null order values map to a dedicated
  * lowest bin so they rank FIRST like Spark's asc window default, and
  * the broadcast joins are null-safe (`<=>`) so rows with null group
  * keys rank within the null group instead of silently vanishing. The
  * bin count is a scale knob: at 1000 executors set it so a group's
  * largest bin fits one task; skewed value distributions (many
  * identical values) degrade at worst to the ties sharing one bin,
  * which is where the plain window puts them anyway — RankSkewSpec
  * measures exactly that worst case (one group all-equal) and asserts
  * both output equality and the ties-share-one-bin task shape.
  */
object Rank {

  /** Appends `rankCol`: 1-based rank of each row within its `groupCols`
    * group under (`orderCol` asc, `tieCol` asc) total order.
    *
    * @param orderCol numeric order value (cast to double for binning;
    *                 ranking compares the ORIGINAL column, so non-double
    *                 numerics lose nothing)
    * @param tieCol   unique-per-group tiebreaker (total order!)
    */
  def rankWithin(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: Column,
      tieCol: Column,
      rankCol: String,
      bins: Int = 64
  ): DataFrame = {
    val g = groupCols.map(col)
    val v = orderCol.cast("double")
    val spans = df
      .groupBy(g: _*)
      .agg(min(v).as("__lo"), max(v).as("__hi"))
      // null-safe join keys: rows whose group key is null must form a
      // ranked group, not vanish through an equality join
      .withColumnsRenamed(groupCols.map(c => c -> s"__s_$c").toMap)
    val spanCond = groupCols
      .map(c => col(c) <=> col(s"__s_$c"))
      .reduce(_ && _)
    val binned = df
      .join(broadcast(spans), spanCond)
      .drop(groupCols.map(c => s"__s_$c"): _*)
      // null order value → dedicated bin -1, BELOW bin 0: Spark's asc
      // window ranks nulls first, so the two-pass must too. lo == hi
      // (all-equal group) → everything lands in bin 0.
      .withColumn(
        "__bin",
        when(v.isNull, lit(-1L))
          .otherwise(
            least(
              lit(bins - 1),
              floor((v - col("__lo")) / ((col("__hi") - col("__lo")) + lit(1e-12)) * bins)
            ).cast("long")
          )
      )
    val localW = Window
      .partitionBy((g :+ col("__bin")): _*)
      .orderBy(orderCol.asc, tieCol.asc)
    val local = binned.withColumn("__rn", row_number().over(localW))
    val offsets = binned
      .groupBy((g :+ col("__bin")): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn(
        "__off",
        coalesce(
          sum(col("__cnt")).over(
            Window
              .partitionBy(g: _*)
              .orderBy(col("__bin"))
              .rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select((g :+ col("__bin") :+ col("__off")): _*)
      .withColumnsRenamed((groupCols :+ "__bin").map(c => c -> s"__o_$c").toMap)
    val offCond = (groupCols :+ "__bin")
      .map(c => col(c) <=> col(s"__o_$c"))
      .reduce(_ && _)
    local
      .join(broadcast(offsets), offCond)
      .withColumn(rankCol, (col("__off") + col("__rn")).cast("long"))
      .drop((groupCols :+ "__bin").map(c => s"__o_$c"): _*)
      .drop("__lo", "__hi", "__bin", "__rn", "__off")
  }
}
