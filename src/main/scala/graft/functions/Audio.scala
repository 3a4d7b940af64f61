package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Parsed RIFF/WAVE header facts (PCM only). */
final case class WavInfo(sampleRate: Int, channels: Int, bits: Int,
    dataOff: Int, dataLen: Int) {
  def blockAlign: Int = channels * (bits / 8)
  def nFrames: Int = if (blockAlign == 0) 0 else dataLen / blockAlign
}

/** Audio modality (VERDICT r7 §next-3) — closes the image/video/audio
  * triad with the same discipline as mm2/mm3/mm7: a REAL byte-level
  * builder and a REAL chunk-walking parser, exercised per document with
  * id-derived structure, checked by an oracle that predicts every output
  * from the builder arithmetic alone (builder and parser would have to be
  * wrong in compensating ways to pass falsely).
  *
  * WAV/RIFF is pure byte arithmetic (the mm3 class): "RIFF" + riffSize +
  * "WAVE", then even-padded chunks of [4-byte id | LE u32 size | body].
  * The parser walks chunks (odd sizes pad by one — exercised by the
  * odd-length LIST chunk some ids carry), requires a PCM "fmt " chunk
  * and a "data" chunk fully inside the payload, and rejects anything
  * truncated or non-PCM with None (never a crash).
  *
  * mm9 decodes the SAMPLES: per channel, integer amplitude statistics
  * over the interleaved PCM frames — 8-bit unsigned (amp = v − 128) and
  * 16-bit signed little-endian, both derived per (frame, channel) from
  * the deterministic fill so the oracle replays them with nested
  * generate_series lambdas. These integer sums are the audio twin of
  * mm5's pixel statistics: the embedding a near-dup stage (mm6's
  * bucket-then-verify shape) consumes.
  *
  * At 100 TB: both queries are per-row scans of a binary column —
  * embarrassingly parallel, no shuffle beyond the final order; exactly
  * the shape the brief's multimodal plumbing requires.
  */
object Audio {

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "mm8_wav_meta" -> mm8WavMeta,
    "mm9_pcm_stats" -> mm9PcmStats,
    "mm10_audio_neardup" -> mm10AudioNeardup
  )

  // ------------------------------------------------------- byte accessors

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def leU16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def leI16(b: Array[Byte], i: Int): Int = leU16(b, i).toShort.toInt
  private def leU32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int): String =
    if (i + 4 > b.length) "" else new String(b, i, 4, "US-ASCII")

  // -------------------------------------------------------------- builder

  /** A REAL PCM WAV stream: RIFF header, optional odd-length LIST chunk
    * (exercising the even-padding rule), canonical 16-byte fmt chunk,
    * data chunk of `nFrames` interleaved frames. `fill(frame, channel)`
    * gives the 0..255 base value v; 8-bit stores v directly (unsigned
    * convention), 16-bit stores (v − 128) · 256 as signed LE.
    */
  def wavBytes(sampleRate: Int, channels: Int, bits: Int, nFrames: Int,
      listLen: Int = 0, fill: (Int, Int) => Int): Array[Byte] = {
    require(bits == 8 || bits == 16, s"unsupported width $bits")
    val out = new java.io.ByteArrayOutputStream(64)
    def ascii(s: String): Unit = s.foreach(c => out.write(c.toInt))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def le32(v: Int): Unit =
      Seq(0, 8, 16, 24).foreach(s => out.write((v >>> s) & 0xff))
    val blockAlign = channels * (bits / 8)
    val dataLen = nFrames * blockAlign
    val listBytes = if (listLen > 0) 8 + listLen + (listLen % 2) else 0
    val riffSize = 4 + listBytes + 24 + 8 + dataLen
    ascii("RIFF"); le32(riffSize); ascii("WAVE")
    if (listLen > 0) {
      ascii("LIST"); le32(listLen)
      (0 until listLen + (listLen % 2)).foreach(i => out.write('I' + i % 3))
    }
    ascii("fmt "); le32(16)
    le16(1) // PCM
    le16(channels); le32(sampleRate)
    le32(sampleRate * blockAlign); le16(blockAlign); le16(bits)
    ascii("data"); le32(dataLen)
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < channels) {
        val v = fill(f, c) & 0xff
        if (bits == 8) out.write(v)
        else le16((v - 128) * 256)
        c += 1
      }
      f += 1
    }
    out.toByteArray
  }

  // --------------------------------------------------------------- parser

  /** RIFF/WAVE chunk walk: returns the fmt facts + data window, or None
    * for anything malformed — wrong magic, truncated header, non-PCM
    * format, zero block align, chunk or data running past the payload.
    * Odd-sized chunks advance by one pad byte per the RIFF rule.
    */
  def parseWav(b: Array[Byte]): Option[WavInfo] = {
    if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
    var data: Option[(Int, Int)] = None // off, len
    while (pos + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(b, pos)
      val size = leU32(b, pos + 4)
      if (size > Int.MaxValue - pos - 8) return None
      val body = pos + 8
      val next = body + size.toInt + (size.toInt % 2)
      id match {
        case "fmt " =>
          if (body + 16 > b.length) return None
          val audioFormat = leU16(b, body)
          if (audioFormat != 1) return None // PCM only
          fmt = Some((leU16(b, body + 2), leU32(b, body + 4).toInt,
            leU16(b, body + 14)))
        case "data" =>
          if (body + size.toInt > b.length) return None // truncated samples
          data = Some((body, size.toInt))
        case _ => () // LIST/JUNK/...: skipped by the walk
      }
      pos = next
    }
    for {
      (ch, rate, bits) <- fmt
      (off, len) <- data
      if ch > 0 && (bits == 8 || bits == 16)
    } yield WavInfo(rate, ch, bits, off, len)
  }

  /** Decoded amplitude of (frame, channel): 8-bit unsigned re-centered,
    * 16-bit signed LE — the parser-side twin of [[wavBytes]]'s encoding.
    */
  def sampleAt(b: Array[Byte], info: WavInfo, frame: Int, ch: Int): Int = {
    val off = info.dataOff + frame * info.blockAlign + ch * (info.bits / 8)
    if (info.bits == 8) u8(b, off) - 128 else leI16(b, off)
  }

  // -------------------------------------------------------------- fixture

  /** One WAV per document, every structural knob id-derived: sample rate
    * from a 4-entry ladder, 1–2 channels, 8-bit width on ids divisible by
    * 3 (16 elsewhere), and an odd-or-even LIST chunk on ids divisible by
    * 5 so the padding branch is walked.
    */
  def wavMedia(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          (id, wavBytes(
            sampleRate = SampleRates((id % 4).toInt),
            channels = (1 + id % 2).toInt,
            bits = if (id % 3 == 0) 8 else 16,
            nFrames = (20 + id % 50).toInt,
            listLen = if (id % 5 == 0) (3 + id % 7).toInt else 0,
            fill = (f, c) => ((3 * id + 7 * f + 11 * c) % 256).toInt))
        }
      }
      .toDF("id", "payload")
  }

  val SampleRates: Seq[Int] = Seq(8000, 16000, 22050, 44100)

  /** mm8: build → parse round trip of the WAV header facts plus the
    * container byte count and integer duration. The oracle predicts all
    * seven columns from the id arithmetic alone.
    */
  def mm8WavMeta: Q = (s, dir) => {
    import s.implicits._
    wavMedia(s, dir)
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val info = parseWav(bytes).getOrElse(
          sys.error(s"fixture WAV $id failed to parse"))
        (id, info.sampleRate, info.channels, info.bits,
          info.nFrames.toLong, bytes.length.toLong,
          info.nFrames.toLong * 1000000L / info.sampleRate)
      }
      .toDF("id", "sample_rate", "channels", "bits", "n_frames",
        "n_bytes", "duration_us")
      .orderBy(col("id"))
  }

  /** mm9: per-channel integer amplitude statistics over the decoded PCM
    * frames — frame count, amplitude sum, min, max. Exact integers on
    * both sides (the audio twin of mm5's pixel statistics).
    */
  def mm9PcmStats: Q = (s, dir) => {
    import s.implicits._
    wavMedia(s, dir)
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val info = parseWav(bytes).getOrElse(
          sys.error(s"fixture WAV $id failed to parse"))
        (0 until info.channels).map { c =>
          var sum = 0L
          var mn = Int.MaxValue
          var mx = Int.MinValue
          var f = 0
          while (f < info.nFrames) {
            val a = sampleAt(bytes, info, f, c)
            sum += a
            if (a < mn) mn = a
            if (a > mx) mx = a
            f += 1
          }
          (id, c, info.nFrames.toLong, sum, mn.toLong, mx.toLong)
        }
      }
      .toDF("id", "channel", "n_frames", "sum_amp", "min_amp", "max_amp")
      .orderBy(col("id"), col("channel"))
  }

  /** Cosine threshold for the audio near-dup verify. */
  val AudioNearDupCosine = 0.99

  /** The near-dup fixture: groups of WAVs sharing identical container
    * parameters (derived from gid = id % 125, so every id ≡ gid mod 125
    * lands in the same blocking bucket) but carrying one of two FILL
    * CLASSES — wide gradient (full amplitude range) on even copies,
    * narrow band (16-value corridor) on odd copies — plus a bounded
    * per-copy jitter. Within a class the statistics are near-identical
    * (cos ≈ 0.999); across classes they differ structurally (cos ≈ 0.9)
    * — so the verify leg genuinely accepts AND rejects inside the same
    * bucket rather than rubber-stamping every candidate.
    */
  def audioPairMedia(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val gid = id % 125
          val k = id / 125
          val jit = ((k / 2) % 4).toInt
          val narrow = k % 2 == 1
          (id, wavBytes(
            sampleRate = SampleRates((gid % 4).toInt),
            channels = (1 + gid % 2).toInt,
            bits = if (gid % 3 == 0) 8 else 16,
            nFrames = (20 + gid % 50).toInt,
            // jitter is CLAMPED, not wrapped: a wrap flips min/max by a
            // whole period and breaks the within-class near-identity
            fill = (f, c) => {
              val v = ((3 * gid + 7 * f + 11 * c) % 256).toInt
              if (narrow) 120 + math.min(v % 16 + jit, 15)
              else math.min(v + jit, 255)
            }))
        }
      }
      .toDF("id", "payload")
  }

  /** mm10: the mm6 bucket-then-verify shape fed by DECODED AUDIO — the
    * per-channel PCM statistics (mm9's integers) as the embedding,
    * blocking key = the container parameters (sample rate, channels,
    * width, frame count: content-derived, exact — the shuffle key at
    * scale), cosine verify inside buckets only. Completes the
    * decode → embed → near-dup pipeline for the audio modality.
    */
  def mm10AudioNeardup: Q = (s, dir) => {
    import s.implicits._
    val st = audioPairMedia(s, dir)
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val info = parseWav(bytes).getOrElse(
          sys.error(s"fixture WAV $id failed to parse"))
        // [nf] ++ per-channel [mean, min, max]: MEAN, not sum — a sum
        // aggregates the per-copy jitter nf-fold and would push genuine
        // near-dups under the cosine threshold
        val emb = Array.newBuilder[Double]
        emb += info.nFrames.toDouble
        var c = 0
        while (c < info.channels) {
          var sum = 0L
          var mn = Int.MaxValue
          var mx = Int.MinValue
          var f = 0
          while (f < info.nFrames) {
            val a = sampleAt(bytes, info, f, c)
            sum += a
            if (a < mn) mn = a
            if (a > mx) mx = a
            f += 1
          }
          emb += sum.toDouble / info.nFrames
          emb += mn.toDouble
          emb += mx.toDouble
          c += 1
        }
        (id, info.sampleRate, info.channels, info.bits, info.nFrames,
          emb.result())
      }
      .toDF("id", "sr", "ch", "bits", "nf", "emb")
    val keys = Seq("sr", "ch", "bits", "nf")
    val x = st.select(col("id").as("doc_a") +: col("emb").as("ea") +:
      keys.map(col): _*)
    val y = st.select(col("id").as("doc_b") +: col("emb").as("eb") +:
      keys.map(col): _*)
    x.join(y, keys)
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        graft.core.Linalg.cosineCol(col("ea"), col("eb")).as("cos"))
      .where(col("cos") >= AudioNearDupCosine)
      .select(col("doc_a"), col("doc_b"), round(col("cos"), 4).as("cos"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---- DuckDB oracles ------------------------------------------------------

  /** The id-derived WAV parameters, shared by both oracles. */
  private val paramsSql =
    """p AS (SELECT doc_id,
      |    CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
      |      WHEN 2 THEN 22050 ELSE 44100 END AS sr,
      |    (1 + doc_id % 2) AS ch,
      |    CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS bits,
      |    (20 + doc_id % 50) AS nf,
      |    CASE WHEN doc_id % 5 = 0 THEN 3 + doc_id % 7 ELSE 0 END AS ll
      |  FROM documents)""".stripMargin

  /** Decoded amplitude of (f, c) as SQL — the fill arithmetic replayed. */
  private val ampSql =
    """CASE WHEN bits = 8 THEN ((3 * doc_id + 7 * f + 11 * c) % 256) - 128
      |      ELSE (((3 * doc_id + 7 * f + 11 * c) % 256) - 128) * 256 END""".stripMargin

  /** Stored byte of (f, c) for the near-dup fixture's two fill classes,
    * then the decoded amplitude — gid/jit/narrow/bits doc-level columns.
    */
  private val pairAmpSql =
    """CASE WHEN bits = 8
      |      THEN (CASE WHEN narrow = 1
      |        THEN 120 + least(((3 * gid + 7 * f + 11 * c) % 256) % 16 + jit, 15)
      |        ELSE least((3 * gid + 7 * f + 11 * c) % 256 + jit, 255) END) - 128
      |      ELSE ((CASE WHEN narrow = 1
      |        THEN 120 + least(((3 * gid + 7 * f + 11 * c) % 256) % 16 + jit, 15)
      |        ELSE least((3 * gid + 7 * f + 11 * c) % 256 + jit, 255) END) - 128)
      |        * 256 END""".stripMargin

  def oracles: Map[String, String] = Map(
    // embedding = [nf] ++ per-channel [sum, min, max] of the replayed
    // amplitudes; blocking on the container params; cosine verified
    // inside buckets only — the SQL twin of the mm6-shaped plan
    "mm10_audio_neardup" ->
      s"""WITH g AS (SELECT doc_id, doc_id % 125 AS gid, doc_id // 125 AS k
         |  FROM documents),
         |q AS (SELECT doc_id, gid,
         |    CASE gid % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
         |      WHEN 2 THEN 22050 ELSE 44100 END AS sr,
         |    (1 + gid % 2) AS ch,
         |    CASE WHEN gid % 3 = 0 THEN 8 ELSE 16 END AS bits,
         |    (20 + gid % 50) AS nf,
         |    ((k // 2) % 4) AS jit,
         |    (k % 2) AS narrow
         |  FROM g),
         |st AS (SELECT doc_id, sr, ch, bits, nf,
         |    list_concat([nf::DOUBLE],
         |      flatten(list_transform(generate_series(0, ch - 1), c -> [
         |        list_sum(list_transform(generate_series(0, nf - 1), f ->
         |          $pairAmpSql))::DOUBLE / nf,
         |        list_min(list_transform(generate_series(0, nf - 1), f ->
         |          $pairAmpSql))::DOUBLE,
         |        list_max(list_transform(generate_series(0, nf - 1), f ->
         |          $pairAmpSql))::DOUBLE])))
         |    AS emb
         |  FROM q)
         |SELECT doc_a, doc_b, round(cos, 4) AS cos FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    list_cosine_similarity(a.emb, b.emb) AS cos
         |  FROM st a JOIN st b
         |    ON a.sr = b.sr AND a.ch = b.ch AND a.bits = b.bits
         |    AND a.nf = b.nf AND a.doc_id < b.doc_id)
         |WHERE cos >= $AudioNearDupCosine ORDER BY doc_a, doc_b""".stripMargin,
    // container size = 12 (RIFF hdr) + padded LIST + 24 (fmt) + 8 + data
    "mm8_wav_meta" ->
      s"""WITH $paramsSql
         |SELECT doc_id AS id, sr::INT AS sample_rate, ch::INT AS channels,
         |  bits::INT AS bits, nf::BIGINT AS n_frames,
         |  (12 + CASE WHEN ll > 0 THEN 8 + ll + ll % 2 ELSE 0 END
         |    + 24 + 8 + nf * ch * (bits // 8))::BIGINT AS n_bytes,
         |  (nf * 1000000 // sr)::BIGINT AS duration_us
         |FROM p ORDER BY id""".stripMargin,
    "mm9_pcm_stats" ->
      s"""WITH $paramsSql,
         |pc AS (SELECT doc_id, bits, nf,
         |    unnest(generate_series(0, ch - 1)) AS c FROM p)
         |SELECT doc_id AS id, c::INT AS channel, nf::BIGINT AS n_frames,
         |  list_sum(list_transform(generate_series(0, nf - 1), f ->
         |    $ampSql))::BIGINT AS sum_amp,
         |  list_min(list_transform(generate_series(0, nf - 1), f ->
         |    $ampSql))::BIGINT AS min_amp,
         |  list_max(list_transform(generate_series(0, nf - 1), f ->
         |    $ampSql))::BIGINT AS max_amp
         |FROM pc ORDER BY id, channel""".stripMargin
  )
}
