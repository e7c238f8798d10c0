package graft.ops

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted in batch by a partition-
  * mapping stub.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * deterministic fake (metadata derived from byte length) — but the
  * Spark-side plumbing is real and is the part that matters at scale:
  * binary column in, `Dataset.mapPartitions` over typed rows (one codec
  * init per partition, batch-at-a-time), typed struct out. Swapping the
  * stub body for a real JNI/codec call changes nothing structurally.
  */
object Multimodal {

  /** a decoded media asset's metadata (what a real decoder would emit). */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Long, height: Long, n_frames: Long)

  /** not `private`: encoder codegen must reach the class from generated code. */
  final case class RawMedia(doc_id: Long, payload: Array[Byte])

  /** the clearly-marked STUB: deterministic pseudo-decode from bytes.
    * A real implementation would parse the container format here. */
  def decodeStub(doc_id: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    MediaMeta(
      doc_id = doc_id,
      n_bytes = n,
      width = 1L + n % 64L,
      height = 1L + (n * 7L) % 64L,
      n_frames = 1L + n % 8L)
  }

  /** binary ingestion + per-partition batch decode. The `text` column
    * stands in for media bytes (utf-8 encode) since the fixtures carry
    * no real blobs.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[RawMedia]
      .mapPartitions { rows =>
        // real codecs would be initialized once per partition here
        rows.map(r => decodeStub(r.doc_id, r.payload))
      }
      .toDF()
      .orderBy("doc_id")
  }

  val entries: Seq[QueryDef] = Seq(
    QueryDef.sql("media_meta",
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  1 + CAST(octet_length(encode(text)) AS BIGINT) % 64 AS width,
        |  1 + (CAST(octet_length(encode(text)) AS BIGINT) * 7) % 64 AS height,
        |  1 + CAST(octet_length(encode(text)) AS BIGINT) % 8 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin)(mediaMeta),
  )
}
