package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def brute(edges: Set[(Long, Long)]): Set[(Long, Long, Long)] = {
    val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.filter(e => e._1 != e._2)
    val nodes = canon.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    (for {
      x <- nodes; y <- nodes if y > x; z <- nodes if z > y
      if canon((x, y)) && canon((x, z)) && canon((y, z))
    } yield (x, y, z)).toSet
  }

  test("matches brute force on a seeded random graph (incl. dup/reversed edges)") {
    val rnd = new scala.util.Random(11)
    val raw = (1 to 300).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val df = raw.toDF("u", "v")
    val got = Triangles
      .triangles(df, "u", "v")
      .select(
        least($"u", least($"v", $"w")).as("x"),
        greatest(least($"u", $"v"), least(greatest($"u", $"v"), $"w")).as("y"),
        greatest($"u", greatest($"v", $"w")).as("z"))
      .as[(Long, Long, Long)]
      .collect()
    assert(got.length === got.toSet.size, "each triangle exactly once")
    assert(got.toSet === brute(raw.toSet))
  }

  test("star graph: hub with 200 spokes yields zero triangles (and no wedge blowup from the hub)") {
    val df = (1L to 200L).map(i => (0L, i)).toDF("u", "v")
    assert(Triangles.triangles(df, "u", "v").count() === 0)
    // degree-ordering orients every edge spoke->hub (deg 1 < deg 200),
    // so the hub has out-degree 0 and contributes no wedges at all
  }

  test("clique K5 has C(5,3)=10 triangles") {
    val df = (for { a <- 1L to 5L; b <- 1L to 5L if a < b } yield (a, b)).toDF("u", "v")
    assert(Triangles.triangles(df, "u", "v").count() === 10)
  }
}
