package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing (builder brief): media ride through the
  * engine as opaque `binary` columns with typed metadata; decode /
  * feature-extract run as batched per-partition transforms.
  *
  * The container has no image/audio codecs, so [[decodeStub]] is a
  * DETERMINISTIC FAKE (clearly marked): it derives pseudo-metadata from the
  * bytes. Everything around it — the binary column representation, the
  * schema of the decoded struct, the mapPartitions batch shape (one codec
  * init per partition, streamed rows), and the partitioning — is the real
  * production plumbing a codec would drop into.
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  /** Typed decode result — the schema a real codec would emit. */
  final case class MediaMeta(
      id: Long,
      nBytes: Int,
      format: String,
      width: Int,
      height: Int,
      feature: Array[Float])

  /** STUB decode — deterministic fake standing in for an image/audio codec
    * (no codec libraries in this environment). Real implementation swaps
    * ONLY this function; the Spark-side plumbing is unchanged.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    val magic = if (n > 0) bytes(0) & 0xff else 0
    val format = magic % 3 match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    }
    // fake dimensions + an 8-dim "embedding" from a rolling byte hash
    var h = 1125899906842597L
    var i = 0
    while (i < n) { h = 31 * h + (bytes(i) & 0xff); i += 1 }
    val feature = Array.tabulate(8)(k =>
      (((h >>> (k * 8)) & 0xff).toFloat / 255f))
    MediaMeta(id, n, format, 64 + magic % 192, 64 + (magic * 7) % 192, feature)
  }

  /** The batched decode pipeline: binary column in, typed struct out.
    * mapPartitions so a real codec initializes once per partition (the
    * expensive part) and streams rows through — the Scala analogue of a
    * pandas-batched UDF. Partitioning of the input is preserved; at scale
    * repartition upstream by storage locality, not here.
    */
  def decodeAll(media: DataFrame, spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real codec: init decoder context here, once per partition
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** Typed per-frame decode result (video frame-sampling schema). */
  final case class FrameMeta(
      id: Long,
      frameIdx: Int,
      nBytes: Int,
      feature: Array[Float])

  /** Frame-sampling layout: fake frame size and sampling stride. */
  val FrameSize = 256
  val FrameEvery = 4

  /** STUB frame demux + sample — video containers become fixed-size byte
    * chunks (no demuxer in this environment); every [[FrameEvery]]-th
    * frame is decoded. The plumbing is the real shape: a row-EXPLODING
    * mapPartitions (one media row in, many frame rows out) with the
    * demuxer context initialized once per partition, and the sampling
    * stride applied before any decode work — frames that aren't sampled
    * are never materialized.
    */
  def frameSample(media: DataFrame, spark: SparkSession,
      every: Int = FrameEvery): Dataset[FrameMeta] = {
    require(every > 0, s"frameSample stride must be positive, got $every")
    import spark.implicits._
    media.select(col("id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real demuxer: init container parser here, once per partition
        it.flatMap { case (id, bytes) =>
          val nFrames = (bytes.length + FrameSize - 1) / FrameSize
          Iterator.range(0, nFrames, every).map { f =>
            val from = f * FrameSize
            val until = math.min(from + FrameSize, bytes.length)
            val fb = java.util.Arrays.copyOfRange(bytes, from, until)
            FrameMeta(id, f, fb.length, decodeStub(id, fb).feature)
          }
        }
      }
  }

  /** Resize pass over decoded media — per-row transform in the same
    * batched shape (a real resizer allocates its buffers once per
    * partition). Stub semantics: clamp into the target box, preserving
    * the decoded struct's schema so downstream stages are unchanged.
    */
  def resizeAll(decoded: Dataset[MediaMeta], spark: SparkSession,
      maxW: Int, maxH: Int): Dataset[MediaMeta] = {
    import spark.implicits._
    decoded.mapPartitions { it =>
      // real resizer: allocate scratch buffers here, once per partition
      it.map(m => m.copy(
        width = math.min(m.width, maxW),
        height = math.min(m.height, maxH)))
    }
  }

  /** Fixture media: the documents table's text bytes as an opaque payload
    * (the container ships no real media; the bytes are irrelevant to the
    * plumbing under test).
    */
  def fixtureMedia(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id").as("id"), col("text").cast("binary").as("payload"))

  def queries: Map[String, Q] = Map(
    "mm1_binary_meta" -> mm1BinaryMeta,
    "mm2_frame_census" -> mm2FrameCensus
  )

  /** Frame-sampling census over the REAL [[frameSample]] dataset: sampled
    * frame count and last sampled index per media item. The oracle
    * recomputes both from octet_length arithmetic alone — an independent
    * check that the demux/sample loop touches exactly the frames the
    * layout promises.
    */
  def mm2FrameCensus: Q = (s, dir) =>
    frameSample(fixtureMedia(s, dir), s)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_sampled"), max(col("frameIdx")).as("last_idx"))
      .orderBy(col("id"))

  /** Binary-column metadata extraction, expression-only (no stub): byte
    * length + leading byte — the part of decode that IS portable SQL, and
    * the oracle-checkable face of the binary plumbing.
    */
  def mm1BinaryMeta: Q = (s, dir) =>
    fixtureMedia(s, dir)
      .select(col("id"),
        length(col("payload")).as("n_bytes"),
        ascii(col("payload").cast("string")).as("magic"))
      .orderBy(col("id"))

  def oracles: Map[String, String] = Map(
    "mm1_binary_meta" ->
      """SELECT doc_id AS id, octet_length(encode(text)) AS n_bytes,
        |  ascii(substr(text, 1, 1)) AS magic
        |FROM documents ORDER BY id""".stripMargin,
    // pure frame-layout arithmetic: nf = ceil(bytes/FrameSize) frames,
    // sampled at stride FrameEvery → count + last index. Zero-byte
    // payloads produce NO frames and hence no census row on the Spark
    // side — the WHERE keeps both engines row-aligned on that edge
    "mm2_frame_census" ->
      s"""SELECT doc_id AS id,
         |  ((octet_length(encode(text)) + ${FrameSize - 1}) // $FrameSize
         |    + ${FrameEvery - 1}) // $FrameEvery AS n_sampled,
         |  (((octet_length(encode(text)) + ${FrameSize - 1}) // $FrameSize
         |    - 1) // $FrameEvery) * $FrameEvery AS last_idx
         |FROM documents WHERE octet_length(encode(text)) > 0
         |ORDER BY id""".stripMargin
  )
}
