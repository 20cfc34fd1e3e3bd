package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property checks for the pure-Scala water-filling kernel over
  * arbitrary cap vectors and budgets — the laws the q144 oracle pins at
  * one corpus, checked here across the space: exact budget use, cap
  * respect, max-uniformity (unsaturated allocations within one token),
  * and the saturation frontier (no saturated cap exceeds an unsaturated
  * allocation — otherwise the fill wasn't level).
  */
object MixtureProps extends Properties("mixture-waterfill") {

  private val capsGen: Gen[List[(String, Long)]] =
    Gen.chooseNum(1, 30).flatMap { n =>
      Gen
        .listOfN(n, Gen.chooseNum(1L, 1000L))
        .map(_.zipWithIndex.map { case (c, i) => (f"s$i%02d", c) })
    }

  private val caseGen: Gen[(List[(String, Long)], Long)] =
    for {
      caps <- capsGen
      num <- Gen.chooseNum(0L, 100L)
    } yield (caps, caps.map(_._2).sum * num / 100L)

  property("budget exactly spent, caps respected, max-uniform, level frontier") =
    forAll(caseGen) { case (caps, budget) =>
      val out = Mixture.waterfill(caps, budget)
      val spent = out.map(_._3).sum == budget
      val bounded = out.forall { case (_, cap, alloc, sat) =>
        alloc >= 0 && alloc <= cap && (!sat || alloc == cap)
      }
      val unsat = out.filter(!_._4).map(_._3)
      val uniform = unsat.isEmpty || unsat.max - unsat.min <= 1
      val frontier = {
        val satCaps = out.filter(_._4).map(_._2)
        satCaps.isEmpty || unsat.isEmpty || satCaps.max <= unsat.max
      }
      spent && bounded && uniform && frontier
    }

  property("monotone: a bigger budget never shrinks any source's allocation") =
    forAll(caseGen) { case (caps, budget) =>
      val total = caps.map(_._2).sum
      val b2 = math.min(total, budget + math.max(1L, total / 10L))
      val a1 = Mixture.waterfill(caps, budget).map(r => r._1 -> r._3).toMap
      val a2 = Mixture.waterfill(caps, b2).map(r => r._1 -> r._3).toMap
      caps.forall { case (src, _) => a2(src) >= a1(src) }
    }
}
