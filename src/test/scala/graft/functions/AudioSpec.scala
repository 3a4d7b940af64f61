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

  /** Stats rows keyed for class analysis:
    * (id, container params, narrow?, gid, rbin, mbin, emb).
    */
  private def statRows(withRms: Boolean) =
    Audio.pairStats(spark, sfDir, withRms).collect().map { r =>
      val id = r.getLong(0)
      val bits = r.getInt(3)
      val emb = r.getSeq[Double](5).toArray
      val scale = if (bits == 16) 256.0 else 1.0
      val rbin = math.floor((emb(3) - emb(2)) / scale / Audio.RangeBinWidth).toLong
      val mbin = math.floor(emb(1) / scale / Audio.RangeBinWidth).toLong
      (id, (r.getInt(1), r.getInt(2), bits, r.getInt(4)),
        (id / 125) % 2 == 1, id % 125, rbin, mbin, emb)
    }

  /** In-bucket cosine extremes over the PARITY boundary: (min cosine
    * among true copies — same gid AND same fill class; max cosine across
    * the wide/narrow class boundary).
    */
  private def margins(withRms: Boolean): (Double, Double) = {
    val byBucket = statRows(withRms).groupBy(_._2)
    var minWithin = 1.0
    var maxCross = -1.0
    byBucket.values.foreach { docs =>
      for (i <- docs.indices; j <- i + 1 until docs.length) {
        val (a, b) = (docs(i), docs(j))
        val cos = graft.core.Linalg.cosine(a._7, b._7)
        if (a._3 == b._3) {
          if (a._4 == b._4) minWithin = math.min(minWithin, cos)
        } else maxCross = math.max(maxCross, cos)
      }
    }
    (minWithin, maxCross)
  }

  test("rms component widens the class-boundary margin (VERDICT r8 §next-7)") {
    val (withinPlain, crossPlain) = margins(withRms = false)
    val (withinRms, crossRms) = margins(withRms = true)
    // true copies stay above threshold under both embeddings
    assert(withinPlain >= Audio.AudioNearDupCosine)
    assert(withinRms >= Audio.AudioNearDupCosine)
    // the energy axis moves BOTH margin endpoints the right way: copies
    // up, cross-class confusions down
    assert(withinRms > withinPlain)
    assert(crossRms < crossPlain)
    assert(withinRms - crossRms > withinPlain - crossPlain,
      s"margin did not widen: plain=($withinPlain,$crossPlain) " +
        s"rms=($withinRms,$crossRms)")
    // …but no stats embedding separates these classes by cosine alone
    // (wide extremes can be directionally identical to narrow ones —
    // maxCross sits ABOVE the threshold). That residue is exactly what
    // the quantized-range blocking closes: every cross-class pair the
    // verify would wrongly accept is ≥ 7 range bins away, far outside
    // the two-probe adjacency.
    val rows = statRows(withRms = true)
    val byBucket = rows.groupBy(_._2)
    byBucket.values.foreach { docs =>
      for (i <- docs.indices; j <- i + 1 until docs.length) {
        val (a, b) = (docs(i), docs(j))
        if (a._3 != b._3 &&
          graft.core.Linalg.cosine(a._7, b._7) >= Audio.AudioNearDupCosine)
          assert(math.abs(a._5 - b._5) > 6,
            s"cross-class accept ${a._1},${b._1} not range-blocked")
      }
    }
  }

  test("mm10b groups equal the closure of blocked-and-verified pairs") {
    // independent union-find replay of the mm10b contract: candidates =
    // in-bucket pairs within one bin on BOTH probe axes, accepted at the
    // cosine threshold (the cap never binds at this size, so this is the
    // full candidate set — the query's star/clique emission must land on
    // exactly these components)
    val rows = statRows(withRms = true)
    val byBucket = rows.groupBy(_._2)
    val parent = scala.collection.mutable.Map(rows.map(r => r._1 -> r._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    byBucket.values.foreach { docs =>
      for (i <- docs.indices; j <- i + 1 until docs.length) {
        val (a, b) = (docs(i), docs(j))
        if (math.abs(a._5 - b._5) <= 1 && math.abs(a._6 - b._6) <= 1 &&
          graft.core.Linalg.cosine(a._7, b._7) >= Audio.AudioNearDupCosine) {
          val (ra, rb) = (find(a._1), find(b._1))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
      }
    }
    val want = rows.map(r => r._1 -> find(r._1)).toMap
    val got = Audio.mm10bAudioDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size === rows.length)
    assert(got === want)
    // the groups are non-trivial in both directions: real merges happen,
    // and structurally different fills stay apart
    val nGroups = want.values.toSet.size
    assert(nGroups > 100 && nGroups < rows.length)
  }

  test("mm10b blocking: jitter-stable on copies, separating across classes") {
    val rows = statRows(withRms = false)
    // every true-copy pair (same gid + parity) survives the 2-D two-probe
    // adjacency — zero recall loss from the finer blocking
    rows.groupBy(r => (r._4, r._3)).values.foreach { copies =>
      for (i <- copies.indices; j <- i + 1 until copies.length) {
        assert(math.abs(copies(i)._5 - copies(j)._5) <= 1 &&
          math.abs(copies(i)._6 - copies(j)._6) <= 1,
          s"true copies ${copies(i)._1},${copies(j)._1} separated by blocking")
      }
    }
    // classes separate on the range axis: narrow in bins {0,1}, wide far up
    val (n, w) = rows.partition(_._3)
    assert(n.map(_._5).max <= 1)
    assert(w.map(_._5).min >= 5)
  }

  /** Adversarial stats frame for the probe-grid contract cases: same
    * container key throughout, 8-bit (scale 1), emb = [nf, mean0, min0,
    * max0, rms0] so range/mean read directly off the array.
    */
  private def statsDf(rows: Seq[(Long, Array[Double])]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    rows.toDF("id", "emb")
      .select(col("id"), lit(8000).as("sr"), lit(1).as("ch"),
        lit(8).as("bits"), lit(10).as("nf"), col("emb"))
  }

  private def groupsOf(rows: Seq[(Long, Array[Double])]): Map[Long, Long] = {
    import spark.implicits._
    val ids = rows.map(_._1).toDF("doc_id")
    Audio.dedupGroupsFromStats(statsDf(rows), ids)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
  }

  test("probe-grid contract: a bin-edge straddle is still covered (recall 1.0)") {
    // ranges 15 vs 16 sit on OPPOSITE sides of the rbin 0/1 edge — the
    // worst case quantization allows inside the covered radius. The 2x2
    // two-probe must still emit the pair: drift < RangeBinWidth units
    // can never be lost to bin placement.
    val a = 1L -> Array(10.0, 120.0, 112.0, 127.0, 121.0) // range 15 → rbin 0
    val b = 2L -> Array(10.0, 121.0, 112.0, 128.0, 122.0) // range 16 → rbin 1
    assert(graft.core.Linalg.cosine(a._2, b._2) >= Audio.AudioNearDupCosine,
      "fixture must verify — the case tests blocking, not the cosine gate")
    val g = groupsOf(Seq(a, b))
    assert(g(1L) === g(2L),
      "bin-edge straddling near-dup pair missed by the two-probe grid")
  }

  test("probe-grid contract: drift beyond one bin is out-of-contract (documented miss)") {
    // range 15 (rbin 0) vs range 47 (rbin 2): cosine-verifiable near-dup
    // 2 bins apart on the range axis. Probe sets {0,1} and {2,3} are
    // disjoint, so the pair is NEVER a candidate — the contract's
    // covered radius is ONE bin per axis (drift < RangeBinWidth units);
    // beyond it the miss is by design (widen RangeBinWidth or add
    // probes to extend coverage), not a bug the verify could recover.
    val a = 1L -> Array(10.0, 120.0, 112.0, 127.0, 121.0) // range 15 → rbin 0
    val c = 3L -> Array(10.0, 120.0, 96.0, 143.0, 121.0) // range 47 → rbin 2
    assert(graft.core.Linalg.cosine(a._2, c._2) >= Audio.AudioNearDupCosine,
      "the pair must be semantically verifiable for the miss to be the grid's")
    val g = groupsOf(Seq(a, c))
    assert(g(1L) !== g(3L),
      "beyond-radius pair unexpectedly candidate — contract drifted")
  }
}
