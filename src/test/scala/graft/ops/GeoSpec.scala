package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("radiusJoin equals the brute-force theta join on random signed coordinates") {
    val rnd = new scala.util.Random(31)
    val pts = (1L to 300L).map(i => (i, rnd.nextInt(2000) - 1000L, rnd.nextInt(2000) - 1000L))
    val sts = (1L to 200L).map(i => (i, rnd.nextInt(2000) - 1000L, rnd.nextInt(2000) - 1000L))
    val r = 150L
    val got = Geo
      .radiusJoin(
        pts.toDF("pid", "plat", "plon"),
        sts.toDF("sid", "slat", "slon"),
        "plat", "plon", "slat", "slon", r)
      .select("pid", "sid")
      .as[(Long, Long)]
      .collect()
    assert(got.length === got.toSet.size, "no duplicate pairs from the 9-cell fanout")
    val want = (for {
      (pid, plat, plon) <- pts
      (sid, slat, slon) <- sts
      if (plat - slat) * (plat - slat) + (plon - slon) * (plon - slon) <= r * r
    } yield (pid, sid)).toSet
    assert(got.toSet === want)
  }

  test("boundary: exactly-radius pairs are included; cross-cell-boundary pairs are found") {
    val pts = Seq((1L, 0L, 0L), (2L, -1L, -1L)).toDF("pid", "plat", "plon")
    val sts = Seq(
      (10L, 0L, 100L),   // exactly r from point 1
      (11L, 0L, 101L),   // just outside
      (12L, 1L, 1L)      // across the zero cell corner from point 2
    ).toDF("sid", "slat", "slon")
    val got = Geo
      .radiusJoin(pts, sts, "plat", "plon", "slat", "slon", 100L)
      .select("pid", "sid")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(got.contains((1L, 10L)) && !got.exists(_._2 == 11L))
    assert(got.contains((2L, 12L)))
  }
}
