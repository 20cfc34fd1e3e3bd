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
