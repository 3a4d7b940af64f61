package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** WAV builder/parser unit coverage: round trips across both sample
  * widths, the RIFF padding rule, and the malformed-input rejections the
  * mm8/mm9 fixtures never exercise.
  */
class AudioSpec extends AnyFunSuite with SparkTestBase {

  private def wav(sr: Int = 16000, ch: Int = 2, bits: Int = 16,
      nf: Int = 10, listLen: Int = 0) =
    Audio.wavBytes(sr, ch, bits, nf, listLen, (f, c) => (f * 7 + c * 11) % 256)

  test("round trip: 16-bit stereo") {
    val b = wav()
    val i = Audio.parseWav(b).get
    assert((i.sampleRate, i.channels, i.bits, i.nFrames) === ((16000, 2, 16, 10)))
    assert(i.dataOff + i.dataLen === b.length)
  }

  test("round trip: 8-bit mono with odd-length LIST chunk (padding rule)") {
    val b = wav(ch = 1, bits = 8, listLen = 5)
    val i = Audio.parseWav(b).get
    assert((i.channels, i.bits, i.nFrames) === ((1, 8, 10)))
    // odd LIST body advances by its pad byte: data window still exact
    assert(i.dataOff + i.dataLen === b.length)
  }

  test("round trip: even-length LIST chunk") {
    val i = Audio.parseWav(wav(listLen = 6)).get
    assert(i.nFrames === 10)
  }

  test("sample decode matches the fill on both widths") {
    for (bits <- Seq(8, 16); ch <- Seq(1, 2)) {
      val b = wav(ch = ch, bits = bits, nf = 7)
      val i = Audio.parseWav(b).get
      for (f <- 0 until 7; c <- 0 until ch) {
        val v = (f * 7 + c * 11) % 256
        val want = if (bits == 8) v - 128 else (v - 128) * 256
        assert(Audio.sampleAt(b, i, f, c) === want, s"bits=$bits f=$f c=$c")
      }
    }
  }

  test("16-bit decode sign-extends negative amplitudes") {
    // fill 0 -> amp -32768, the most negative 16-bit value
    val b = Audio.wavBytes(8000, 1, 16, 1, 0, (_, _) => 0)
    val i = Audio.parseWav(b).get
    assert(Audio.sampleAt(b, i, 0, 0) === -32768)
  }

  test("malformed inputs are rejected, never thrown") {
    val good = wav()
    assert(Audio.parseWav(Array.empty[Byte]).isEmpty)
    assert(Audio.parseWav(good.take(11)).isEmpty) // truncated RIFF header
    assert(Audio.parseWav(good.take(20)).isEmpty) // truncated before fmt
    assert(Audio.parseWav(good.dropRight(1)).isEmpty) // truncated samples
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(Audio.parseWav(badMagic).isEmpty)
    val notWave = good.clone(); notWave(8) = 'A'.toByte
    assert(Audio.parseWav(notWave).isEmpty)
    val nonPcm = good.clone()
    // audioFormat lives at fmt body offset 0 = byte 20 in the plain layout
    nonPcm(20) = 3
    assert(Audio.parseWav(nonPcm).isEmpty)
  }

  test("fixture WAVs all parse (sf0.001)") {
    val rows = Audio.mm8WavMeta(spark, sfDir).collect()
    assert(rows.length > 0)
    assert(rows.forall(_.getLong(4) > 0)) // n_frames
  }

  test("audio near-dup: blocks on container params, verify discriminates") {
    // 500 docs give 125 buckets of 4 (two fill classes each): the
    // verify must accept within-class pairs and REJECT enough
    // cross-class candidates that the output is a strict subset of the
    // 125 × C(4,2) = 750 candidates
    val rows = Audio.mm10AudioNeardup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(rows.length < 750, "verify rejected nothing — rubber stamp")
    // blocking: every emitted pair shares the container-param bucket
    // (note: NOT necessarily the same gid — bits is binary, so e.g.
    // gids g and g+100 with g % 3 == 1 collide on all four params)
    def params(id: Long) = {
      val gid = id % 125
      (gid % 4, gid % 2, gid % 3 == 0, gid % 50)
    }
    assert(rows.forall(p => params(p._1) == params(p._2)),
      "pair emitted across buckets")
    // same-class mates (ids 250 apart: copies k and k+2, both even or
    // both odd) are near-identical and must all be found
    val found = rows.map(p => (p._1, p._2)).toSet
    (0L until 250L).foreach { i =>
      assert(found.contains((i, i + 250)), s"missing same-class pair $i")
    }
    // every accepted cosine honors the threshold after rounding
    assert(rows.forall(_._3 >= Audio.AudioNearDupCosine - 5e-5))
  }
}
