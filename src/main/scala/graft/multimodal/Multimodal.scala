package graft.multimodal

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat media as opaque `binary` payload
  * columns with typed metadata, processed in partition-batched
  * iterators (`mapPartitions`) — the shape a real decoder plugs into.
  *
  * The decode step itself is a STUB: no image/audio codec libraries
  * exist in this environment, so "decoding" derives deterministic
  * pseudo-metadata (magic bytes, stub width/height) from the payload.
  * Payloads are the documents' UTF-8 bytes — a deterministic stand-in
  * that exercises the real binary-column path end-to-end (schema,
  * partitioning, batch iteration, hashing) and stays oracle-checkable.
  * The corpus is ASCII, so the oracle's char-indexed `substring` is
  * byte-exact.
  */
object Multimodal {

  /** Frame sampling: 64-byte "frames", every 4th one. */
  val FrameBytes = 64
  val FrameStride = 4

  /** (doc_id, payload binary): the opaque media column. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").cast(LongType).as("doc_id"),
      col("text").cast(BinaryType).as("payload"))

  /** Decode metadata per payload: byte length, 4-byte magic, stub
    * dimensions. Runs as a partition-batch iterator over the binary
    * column — swap the body for a real codec to get image decode.
    */
  def decodeMeta(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withPayload(docs).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val len = bytes.length.toLong
          val magic = bytes.take(4).map(b => f"$b%02X").mkString
          (id, len, magic, 64L + len % 512L, 64L + (len * 7L) % 512L)
        }
      }.toDF("doc_id", "byte_len", "magic_hex", "width", "height")
      .orderBy("doc_id")
  }

  def mmDecodeMeta(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(Tables.documents(spark, dir))

  val mmDecodeMetaSql: String = """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
      CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      hex(encode(substring(text, 1, 4))) AS magic_hex,
      CAST(64 + octet_length(encode(text)) % 512 AS BIGINT) AS width,
      CAST(64 + (octet_length(encode(text)) * 7) % 512 AS BIGINT) AS height
    FROM documents ORDER BY doc_id"""

  /** Sample every `FrameStride`-th full `FrameBytes` block of each
    * payload ("frame extraction"): one row per sampled frame with a
    * content hash. Same partition-batch iterator shape as decodeMeta.
    */
  def frameSample(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withPayload(docs).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, bytes) =>
          Iterator.from(0, FrameStride)
            .takeWhile(b => (b + 1) * FrameBytes <= bytes.length)
            .map { b =>
              val off = b * FrameBytes
              md.reset()
              val digest = md.digest(java.util.Arrays.copyOfRange(bytes, off, off + FrameBytes))
              (id, (b / FrameStride).toLong, off.toLong,
                digest.map(x => f"$x%02x").mkString)
            }
        }
      }.toDF("doc_id", "frame_idx", "byte_off", "frame_md5")
      .orderBy("doc_id", "frame_idx")
  }

  def mmFrameSample(spark: SparkSession, dir: String): DataFrame =
    frameSample(Tables.documents(spark, dir))

  val mmFrameSampleSql: String = s"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
      CAST(b // $FrameStride AS BIGINT) AS frame_idx,
      CAST(b * $FrameBytes AS BIGINT) AS byte_off,
      md5(substring(text, b * $FrameBytes + 1, $FrameBytes)) AS frame_md5
    FROM (SELECT doc_id, text,
            unnest(generate_series(0,
              CAST(octet_length(encode(text)) // $FrameBytes AS BIGINT) - 1,
              $FrameStride)) AS b
          FROM documents)
    ORDER BY doc_id, frame_idx"""

  def ops: Seq[Op] = Seq(
    Op("mm_decode_meta", mmDecodeMeta, Some(mmDecodeMetaSql)),
    Op("mm_frame_sample", mmFrameSample, Some(mmFrameSampleSql)),
  )
}
