package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property checks for the pure-JVM codec kernels over ARBITRARY byte
  * payloads (the fixtures are ASCII; these cover high bytes ≥ 0x80,
  * single-byte payloads, and every raster/audio size class): the
  * encode → real-container → decode round trip must recover the
  * closed-form law exactly, and features/envelopes must obey their
  * range and identity contracts.
  */
object MultimodalProps extends Properties("multimodal-codecs") {

  // 1..600 bytes, full 0..255 range (a zero byte is legal payload)
  private val payloadGen: Gen[Array[Byte]] =
    Gen.chooseNum(1, 600).flatMap { n =>
      Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127).map(_.toByte))
    }

  property("png round trip recovers the raster law for any payload") =
    forAll(payloadGen) { payload =>
      val len = payload.length
      val d = Multimodal.decodeImageBytes(Multimodal.renderPngBytes(payload), dim = 8)
      val w = Multimodal.rasterWidth(len)
      val h = Multimodal.rasterHeight(len)
      val lum = (0 until w * h).map { i =>
        (payload(i % len) & 0xff) + (payload((i * 31 + 7) % len) & 0xff) +
          (payload((i * 131 + 13) % len) & 0xff)
      }.map(_.toLong).sum
      d.ok && d.width == w && d.height == h &&
      d.px00r == (payload(0) & 0xff) &&
      d.px00g == (payload(7 % len) & 0xff) &&
      d.px00b == (payload(13 % len) & 0xff) &&
      d.lumSum == lum
    }

  property("image features: fixed dim, strict (-1,1), identity-preserving") =
    forAll(payloadGen) { payload =>
      val png = Multimodal.renderPngBytes(payload)
      val a = Multimodal.decodeImageBytes(png, dim = 16)
      val b = Multimodal.decodeImageBytes(Multimodal.renderPngBytes(payload.clone()), dim = 16)
      a.features.length == 16 &&
      a.features.forall(v => v > -1f && v < 1f) &&
      java.util.Arrays.equals(a.features, b.features)
    }

  property("image features match the linear-bin law exactly (every pixel counted, any dim)") =
    forAll(payloadGen, Gen.oneOf(3, 8, 16, 64)) { (payload, dim) =>
      val len = payload.length
      val w = Multimodal.rasterWidth(len)
      val h = Multimodal.rasterHeight(len)
      val nPix = w * h
      def lum(i: Int): Long =
        ((payload(i % len) & 0xff) + (payload((i * 31 + 7) % len) & 0xff) +
          (payload((i * 131 + 13) % len) & 0xff)).toLong
      val sums = new Array[Long](dim)
      val counts = new Array[Long](dim)
      var total = 0L
      (0 until nPix).foreach { i =>
        val c = (i.toLong * dim / nPix).toInt
        sums(c) += lum(i); counts(c) += 1; total += lum(i)
      }
      val imgMean = total.toDouble / (3.0 * w * h)
      val want = Array.tabulate(dim) { c =>
        if (counts(c) > 0) ((sums(c).toDouble / (3.0 * counts(c)) - imgMean) / 256.0).toFloat else 0f
      }
      val got = Multimodal.decodeImageBytes(Multimodal.renderPngBytes(payload), dim).features
      counts.forall(_ > 0) && counts.sum == nPix && java.util.Arrays.equals(got, want)
    }

  property("audio envelope: fixed dim, in [-1,1) with silence at exactly -1, empty payload total") =
    forAll(payloadGen) { payload =>
      val d = Multimodal.decodeAudioBytes(Multimodal.renderWavBytes(payload), dim = 8)
      val silent = Multimodal.decodeAudioBytes(
        Multimodal.renderWavBytes(Array.fill[Byte](32)(0)), dim = 8)
      val empty = Multimodal.decodeImageBytes(Multimodal.renderPngBytes(Array.emptyByteArray), 8)
      val emptyWav = Multimodal.decodeAudioBytes(Multimodal.renderWavBytes(null), dim = 8)
      d.envelope.length == 8 &&
      d.envelope.forall(v => v >= -1f && v < 1f) &&
      silent.ok && silent.envelope.forall(_ == -1f) && // all-zero payload = silence
      empty.ok && empty.width == Multimodal.rasterWidth(1) && // null/empty → 1-zero-byte law
      emptyWav.ok && emptyWav.nSamples == Multimodal.audioSamples(1).toLong
    }

  property("wav round trip recovers the audio law for any payload") =
    forAll(payloadGen) { payload =>
      val len = payload.length
      val d = Multimodal.decodeAudioBytes(Multimodal.renderWavBytes(payload), dim = 8)
      def sample(i: Int): Int =
        (((payload((i * 17 + 3) % len) & 0xff) << 8) | (payload(i % len) & 0xff)).toShort.toInt
      val n = Multimodal.audioSamples(len)
      val amp = (0 until n).map(i => math.abs(sample(i)).toLong).sum
      d.ok && d.sampleRate == Multimodal.audioRate(len) &&
      d.nSamples == n.toLong && d.firstSample == sample(0) && d.ampSum == amp
    }

  property("undecodable bytes take the fallback, never throw") =
    forAll(payloadGen) { garbage =>
      val di = Multimodal.decodeImageBytes(garbage, dim = 8)
      val da = Multimodal.decodeAudioBytes(garbage, dim = 8)
      // raw payload bytes are (almost surely) neither PNG nor WAV; if a
      // generated payload happens to BE a valid container, decode_ok is
      // legitimate — only the no-throw + dim contracts are universal
      di.features.length == 8 && da.envelope.length == 8
    }
}
