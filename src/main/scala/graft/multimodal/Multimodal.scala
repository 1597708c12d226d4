package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract /
  * frame-sample stages as per-row transformations.
  *
  * The real decoders (JPEG/PNG, PCM, H.264) are external native libraries
  * not present in this environment, so the DECODE STEP IS A DETERMINISTIC
  * STUB — `fakeFeatures` derives pseudo-features from the payload's md5 —
  * while everything Spark-level is real and tested: the binary column
  * schema, metadata struct, batch shape, partitioning behavior, and the
  * feature pipeline that a swapped-in real decoder would feed.
  * `decodeReal` marks the swap point.
  *
  * Scale notes: payload bytes traverse the plan exactly once (scan →
  * per-row features), no shuffle touches the binary column; only the small
  * derived features move. That is the property that matters at 100 TB of
  * media — never shuffle the blobs.
  */
object Multimodal {

  /** The media-table schema a real pipeline would carry. */
  val MediaSchema: StructType = new StructType()
    .add("media_id", LongType)
    .add("media_type", StringType)
    .add("content", BinaryType)
    .add("meta", new StructType()
      .add("source", StringType)
      .add("n_bytes", LongType))

  /** Swap point for a real decoder (JVM codec on the cluster). Kept
    * unimplemented on purpose — calling it is a deliberate error; the
    * fixture pipeline uses [[fakeFeatures]].
    */
  def decodeReal(content: Column): Column =
    throw new UnsupportedOperationException(
      "real media decode needs codec libraries; use fakeFeatures in this environment")

  /** Deterministic stub "decode": 4 pseudo-features from the payload md5
    * (ascii codes of hex chars 1,9,17,25) plus the byte length. Identical
    * in DuckDB, so the plumbing is oracle-checkable end-to-end.
    */
  def fakeFeatures(content: Column): Column = {
    val hex = md5(content)
    array((1 to 4).map(i => ascii(substring(hex, 1 + (i - 1) * 8, 1)).cast("long")): _*)
  }

  /** "Frame sampling" over an opaque payload: fixed-offset byte windows —
    * the access pattern (strided slices of a binary column) matches real
    * keyframe extraction; `substring` on binary is codegen'd.
    */
  def sampleFrames(content: Column, frameSize: Int, nFrames: Int): Column =
    transform(sequence(lit(0), lit(nFrames - 1)),
      i => content.substr(i * frameSize + 1, lit(frameSize)))

  /** Batched decode over partitions — the Scala analog of `mapInPandas`:
    * the decoder handle is constructed ONCE PER PARTITION and reused for
    * every row in the batch (real codecs/models pay heavy init; per-row
    * construction is the classic mistake). The fake decoder is
    * deterministic (payload length + first-byte features); swap
    * `FakeDecoder` for a real codec on a cluster with media libraries —
    * the iterator plumbing, schema, and batch shape stay identical.
    *
    * Returns (media_id, n_bytes, f_head) rows; `decoderInits` counts
    * constructor calls so tests can prove per-partition (not per-row)
    * initialization.
    */
  def decodeBatched(media: DataFrame,
                    initCounter: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        initCounter.foreach(_.add(1L))
        val decoder = new FakeDecoder // once per batch
        rows.map { case (id, bytes) => (id, bytes.length.toLong, decoder.decode(bytes)) }
      }
      .toDF("media_id", "n_bytes", "f_head")
  }

  /** Stand-in for an expensive-to-construct codec (JPEG decoder, audio
    * resampler...). Deterministic: "feature" = first byte or -1.
    */
  final class FakeDecoder {
    def decode(bytes: Array[Byte]): Long =
      if (bytes.isEmpty) -1L else java.lang.Byte.toUnsignedLong(bytes(0))
  }

  /** documents → media table: text payloads as binary stand-ins for image
    * bytes, with the typed metadata struct. The binary column is genuine
    * (`cast(text AS BINARY)` = UTF-8 bytes, same as DuckDB `encode`).
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("media_type"),
      col("text").cast("binary").as("content"),
      struct(col("source"), octet_length(col("text").cast("binary")).cast("long").as("n_bytes")).as("meta"))

  /** The decode/feature pipeline over the media table. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("media_id"),
      col("media_type"),
      col("meta").getField("n_bytes").as("n_bytes"),
      fakeFeatures(col("content")).as("features"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_features" -> ((s, dir) =>
      mediaFeatures(s, dir).select(
        col("media_id"), col("media_type"), col("n_bytes"),
        // arrays → positional columns for a column-typed oracle compare
        element_at(col("features"), 1).as("f1"),
        element_at(col("features"), 2).as("f2"),
        element_at(col("features"), 3).as("f3"),
        element_at(col("features"), 4).as("f4")))
  )

  def oracleSql: Map[String, String] = Map(
    "q_multimodal_features" ->
      s"""SELECT doc_id AS media_id,
         |  'text/plain' AS media_type,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  CAST(ascii(substring(md5(text), 1, 1)) AS BIGINT) AS f1,
         |  CAST(ascii(substring(md5(text), 9, 1)) AS BIGINT) AS f2,
         |  CAST(ascii(substring(md5(text), 17, 1)) AS BIGINT) AS f3,
         |  CAST(ascii(substring(md5(text), 25, 1)) AS BIGINT) AS f4
         |FROM documents""".stripMargin
  )
}
