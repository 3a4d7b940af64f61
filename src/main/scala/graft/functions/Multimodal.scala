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

  /** Fixture media: the documents table's text bytes as an opaque payload
    * (the container ships no real media; the bytes are irrelevant to the
    * plumbing under test).
    */
  def fixtureMedia(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id").as("id"), col("text").cast("binary").as("payload"))

  def queries: Map[String, Q] = Map(
    "mm1_binary_meta" -> mm1BinaryMeta
  )

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
        |FROM documents ORDER BY id""".stripMargin
  )
}
