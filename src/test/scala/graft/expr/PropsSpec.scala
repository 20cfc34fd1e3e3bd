package graft.expr

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.ops.Similarity

/** Property-based checks (ScalaCheck) for the pure-JVM kernels — the
  * math the distributed operators lean on, exercised across thousands
  * of generated inputs instead of a handful of fixtures.
  */
object BloomProps extends Properties("Bloom") {

  private val keysGen = Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))

  property("no false negatives for any key set") = forAll(keysGen) { keys =>
    val bits = new Array[Byte](1 << 14) // 2^17 bits
    keys.foreach(k => Bloom.set(bits, Bloom.hash64(k), 7))
    keys.forall(k => Bloom.mightContainHashed(bits, Bloom.hash64(k), 7))
  }

  property("empty filter contains nothing") = forAll(keysGen) { keys =>
    val bits = new Array[Byte](1 << 14)
    keys.forall(k => !Bloom.mightContainHashed(bits, Bloom.hash64(k), 7))
  }

  property("typed probes agree with boxed probes") = forAll(keysGen) { keys =>
    val bits = new Array[Byte](1 << 10)
    keys.foreach(k => Bloom.set(bits, Bloom.hash64(k), 5))
    keys.forall(k => Bloom.mightContainLong(bits, k, 5) ==
      Bloom.mightContainHashed(bits, Bloom.hash64(k), 5))
  }
}

object TDigestProps extends Properties("tdigest") {

  private val dataGen =
    Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6)).suchThat(_.nonEmpty)
  private val qGen = Gen.chooseNum(0.01, 0.99)

  private def digestOf(xs: Seq[Double]): TDigestBuffer = {
    val d = new TDigestBuffer(100.0)
    xs.foreach(d.add(_, 1.0))
    d
  }

  private def exactQ(xs: Seq[Double], q: Double): Double = {
    val s = xs.sorted
    s(math.min(s.length - 1, math.max(0, math.ceil(q * s.length).toInt - 1)))
  }

  /** Rank-space tolerance: the estimate must land within ~2·4/δ of the
    * requested rank (the t-digest bound, with slack for interpolation),
    * plus 1/n — on tiny inputs a between-points interpolation is off by
    * up to one rank position, which is granularity, not error.
    */
  private def rankClose(xs: Seq[Double], q: Double, est: Double): Boolean = {
    val s = xs.sorted
    val below = s.count(_ <= est)
    math.abs(below.toDouble / s.length - q) <= 0.1 + 1.0 / s.length ||
    est == exactQ(xs, q)
  }

  property("quantile lands at the requested rank (single digest)") =
    forAll(dataGen, qGen) { (xs, q) =>
      rankClose(xs, q, digestOf(xs).quantile(q))
    }

  property("merge associativity: (a+b)+c vs a+(b+c) agree in rank space") =
    forAll(dataGen, dataGen, dataGen, qGen) { (a, b, c, q) =>
      val left = digestOf(a)
      left.absorb(digestOf(b))
      left.absorb(digestOf(c))
      val bc = digestOf(b)
      bc.absorb(digestOf(c))
      val right = digestOf(a)
      right.absorb(bc)
      val all = a ++ b ++ c
      rankClose(all, q, left.quantile(q)) && rankClose(all, q, right.quantile(q))
    }

  property("serialize/deserialize round-trips the quantile function") =
    forAll(dataGen, qGen) { (xs, q) =>
      val d = digestOf(xs)
      val r = TDigestBuffer.deserialize(d.serialized)
      d.quantile(q) == r.quantile(q)
    }

  property("merged digest equals union in rank space (partition independence)") =
    forAll(dataGen, dataGen, qGen) { (a, b, q) =>
      val d = digestOf(a)
      d.absorb(digestOf(b))
      rankClose(a ++ b, q, d.quantile(q))
    }
}

object MisraGriesProps extends Properties("misraGries") {

  private val itemGen = Gen.chooseNum(0, 40).map(i => s"i$i")
  private val streamGen = Gen.nonEmptyListOf(itemGen)
  private val kGen = Gen.chooseNum(2, 12)

  private def feed(k: Int, xs: Seq[String]): MGBuffer = {
    val b = new MGBuffer(k)
    xs.foreach(b.add)
    b
  }

  private def holdsBound(b: MGBuffer, xs: Seq[String], k: Int): Boolean = {
    val exact = xs.groupBy(identity).map { case (key, v) => key -> v.size.toLong }
    val bound = xs.size.toLong / (k + 1)
    val entries = {
      import scala.jdk.CollectionConverters._
      b.counts.asScala.map { case (key, v) => key -> v.longValue() }
    }
    entries.forall { case (item, est) =>
      est <= exact(item) && exact(item) - est <= bound
    } &&
    exact.forall { case (item, n) => n <= bound || entries.contains(item) }
  }

  property("size never exceeds k; stream bound holds") =
    forAll(streamGen, kGen) { (xs, k) =>
      val b = feed(k, xs)
      b.counts.size <= k && holdsBound(b, xs, k)
    }

  property("merged partitions keep the n/(k+1) bound (any 3-way split)") =
    forAll(streamGen, streamGen, streamGen, kGen) { (a, b, c, k) =>
      val m = feed(k, a)
      m.absorb(feed(k, b))
      m.absorb(feed(k, c))
      m.counts.size <= k && holdsBound(m, a ++ b ++ c, k)
    }

  property("serialize/deserialize round-trips the counter set") =
    forAll(streamGen, kGen) { (xs, k) =>
      val b = feed(k, xs)
      val r = MGBuffer.deserialize(b.serialized)
      r.k == b.k && r.counts == b.counts
    }

  property("exact when k covers the item universe") =
    forAll(streamGen) { xs =>
      val b = feed(64, xs) // itemGen draws from ≤ 41 distinct items
      val exact = xs.groupBy(identity).map { case (key, v) => key -> v.size.toLong }
      import scala.jdk.CollectionConverters._
      b.counts.asScala.map { case (key, v) => key -> v.longValue() }.toMap == exact
    }
}

object LshParamProps extends Properties("lshParams") {

  private val nGen = Gen.chooseNum(1L, 1L << 40)
  private val cosGen = Gen.chooseNum(0.05, 0.99)

  property("bitAgreeProb is a probability, monotone in cosine") =
    forAll(cosGen, cosGen) { (a, b) =>
      val (lo, hi) = if (a < b) (a, b) else (b, a)
      val pl = Similarity.bitAgreeProb(lo)
      val ph = Similarity.bitAgreeProb(hi)
      pl >= 0.0 && ph <= 1.0 && pl <= ph
    }

  property("tables within bound; nbits within [2, maxNbits]") =
    forAll(nGen, cosGen) { (n, c) =>
      val (nbits, tables) = Similarity.lshParams(n, c)
      nbits >= 2 && nbits <= 20 && tables >= 1 && tables <= 64
    }

  property("unclamped configurations meet the recall target") =
    forAll(nGen, cosGen) { (n, c) =>
      val (nbits, tables) = Similarity.lshParams(n, c, targetRecall = 0.85)
      val pBucket = math.pow(Similarity.bitAgreeProb(c), nbits.toDouble)
      val expectedRecall = 1.0 - math.pow(1.0 - pBucket, tables.toDouble)
      // when the table clamp did not bind, the derived pair must reach
      // the target (tiny epsilon for float rounding)
      tables == 64 || expectedRecall >= 0.85 - 1e-9
    }

  property("multiprobe dominates: larger buckets kept or fewer tables needed") =
    forAll(nGen, cosGen) { (n, c) =>
      // pHit(radius 1) >= pHit(radius 0) at every nbits, so the policy
      // either keeps a larger (cost-optimal) nbits that exact-bucket
      // probing had to back off from, or needs no more tables at the
      // same nbits.
      val (b0, t0) = Similarity.lshParams(n, c)
      val (b1, t1) = Similarity.lshParams(n, c, probeHamming = 1)
      b1 > b0 || t1 <= t0
    }

  property("unclamped multiprobe configurations meet the recall target") =
    forAll(nGen, cosGen) { (n, c) =>
      val (nbits, tables) = Similarity.lshParams(n, c, targetRecall = 0.85, probeHamming = 1)
      val p = Similarity.bitAgreeProb(c)
      val pHit = math.pow(p, nbits.toDouble) +
        nbits * math.pow(p, (nbits - 1).toDouble) * (1 - p)
      val expectedRecall = 1.0 - math.pow(1.0 - math.min(1.0, pHit), tables.toDouble)
      tables == 64 || expectedRecall >= 0.85 - 1e-9
    }

  property("nbits never decreases with corpus size at fixed cosine") =
    forAll(nGen, nGen, cosGen) { (n1, n2, c) =>
      val (lo, hi) = if (n1 < n2) (n1, n2) else (n2, n1)
      Similarity.lshParams(lo, c)._1 <= Similarity.lshParams(hi, c)._1
    }
}
