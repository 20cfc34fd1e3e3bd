package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GRID-INDEXED SPATIAL OPERATORS on integer micro-degree coordinates —
  * the station-geometry side of the reference's domain (stations carry
  * lat/lon; the reference only null-island-filters them, the engine
  * adds the spatial queries a deployment would run).
  *
  * Everything is EXACT integer arithmetic: coordinates are 1e-6-degree
  * longs, distances are SQUARED micro-degree sums (no sqrt, no trig —
  * cross-engine transcendental parity is a known flake class, and for
  * containment/nearest decisions the squared planar form is
  * order-equivalent). Grid cells come from `div` (truncating — the
  * q198-certified semantics; the zero-straddling bin is up to twice as
  * wide, which is harmless because any bin of width ≥ r keeps the
  * 3×3-neighborhood guarantee).
  *
  * Scale story: the radius join is the LSH-for-space shape — stations
  * fan out to their 3×3 neighbor cells (bounded ×9 blowup on the SMALL
  * side), points join on their single cell — one equi shuffle, candidate
  * volume proportional to local density, never |P|·|S|. The naive theta
  * join the oracle runs is the definition, not the plan.
  */
object Geo {

  /** Truncating cell index, identical to SQL `coord div width` for the
    * micro-degree domain: the double quotient is exact enough that the
    * toward-zero cast can never cross an integer boundary (|coord| ≤
    * 3.6e8 ≪ 2^53, width ≥ 10³ ⇒ quotient ulp ≪ 1/width).
    */
  def cell(coord: Column, width: Long): Column =
    (coord.cast("long") / lit(width)).cast("long")

  /** Stations exploded to their 3×3 cell neighborhood, keyed for the
    * candidate equi join. Output adds (cr, cc) — the neighbor cell key.
    */
  def withNeighborCells(
      stations: DataFrame,
      latCol: String,
      lonCol: String,
      cellWidth: Long
  ): DataFrame =
    stations
      .withColumn("__dr", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__dc", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("cr", cell(col(latCol), cellWidth) + col("__dr"))
      .withColumn("cc", cell(col(lonCol), cellWidth) + col("__dc"))
      .drop("__dr", "__dc")

  /** All (point, station) pairs within `radius` (inclusive, squared
    * integer test). Column names of the two frames must be disjoint;
    * the result carries both sides plus `d2`.
    */
  def radiusJoin(
      points: DataFrame,
      stations: DataFrame,
      pLat: String,
      pLon: String,
      sLat: String,
      sLon: String,
      radius: Long
  ): DataFrame = {
    val s9 = withNeighborCells(stations, sLat, sLon, radius)
    val p = points
      .withColumn("cr", cell(col(pLat), radius))
      .withColumn("cc", cell(col(pLon), radius))
    p.join(s9, Seq("cr", "cc"))
      .withColumn(
        "d2",
        (col(pLat) - col(sLat)) * (col(pLat) - col(sLat)) +
          (col(pLon) - col(sLon)) * (col(pLon) - col(sLon)))
      .where(col("d2") <= lit(radius) * lit(radius))
      .drop("cr", "cc")
  }
}
