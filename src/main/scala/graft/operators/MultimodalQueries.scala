package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal-column plumbing (BASELINE.json scale100 extensions): media as
  * opaque `binary` payloads + a typed metadata struct, with
  * decode / feature-extraction / frame-sampling / resize as Spark-side
  * pipelines.
  *
  * The container has no image/audio codecs, so the DECODE KERNEL IS A
  * DETERMINISTIC STUB (byte statistics standing in for pixel decoding —
  * clearly marked below). Everything around it is real and tested: the
  * binary schema, the typed-Dataset `mapPartitions` batch path (the Scala
  * equivalent of `mapInPandas` — one iterator per partition, so a real
  * codec would amortize model/codec init per partition exactly like a
  * Pandas-UDF batch), the metadata projection, and the explode-based frame
  * sampler. Swapping the stub for javacv/ffmpeg changes one function.
  *
  * The media table derives deterministically from `documents` (payload =
  * UTF-8 bytes of `text` standing in for an encoded frame; metadata from
  * doc_id), so DuckDB can oracle every query bit-for-bit.
  */
/** Typed rows for the mapPartitions batch path. Top-level (not nested in
  * the object) because Catalyst's generated projections need public access
  * to the case-class accessors. */
case class MediaRow(doc_id: Long, format: String, width: Long,
    height: Long, n_frames: Long, payload: Array[Byte])

case class FeatureRow(doc_id: Long, format: String,
    payload_len: Long, byte_sum: Long, first_byte: Long, last_byte: Long)

object MultimodalQueries {

  /** (doc_id, format, width, height, n_frames, payload BINARY). */
  private def media(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      element_at(array(lit("png"), lit("jpg"), lit("mp4"), lit("wav")),
        (col("doc_id") % 4 + 1).cast("int")).as("format"),
      (lit(64) + (col("doc_id") % 16) * 8).cast("long").as("width"),
      (lit(48) + (col("doc_id") % 12) * 8).cast("long").as("height"),
      (col("doc_id") % 30 + 1).cast("long").as("n_frames"),
      encode(col("text"), "UTF-8").as("payload"))


  /** Per-partition batch "decode": iterate the partition's rows once,
    * emitting a feature row per media item.
    *
    * ==== STUB ==== the real decoder (image decode → pixel stats, audio →
    * spectral features) needs codec libraries absent from this container;
    * the deterministic stand-in extracts byte statistics so the full
    * mapPartitions path stays end-to-end testable. */
  private def decodeStub(rows: Iterator[MediaRow]): Iterator[FeatureRow] =
    rows.map { r =>
      val p = r.payload
      FeatureRow(r.doc_id, r.format, p.length.toLong,
        p.foldLeft(0L)((acc, b) => acc + (b & 0xff)),
        if (p.isEmpty) -1L else (p.head & 0xff).toLong,
        if (p.isEmpty) -1L else (p.last & 0xff).toLong)
    }

  /** Binary feature extraction through the typed mapPartitions batch path. */
  def mmDecodeFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    media(s, dir).as[MediaRow]
      .mapPartitions(decodeStub)
      .toDF()
      .orderBy(col("doc_id"))
  }

  val mmDecodeFeaturesSql: String =
    """SELECT doc_id,
      |  ['png','jpg','mp4','wav'][CAST(doc_id % 4 + 1 AS INT)] AS format,
      |  CAST(strlen(text) AS BIGINT) AS payload_len,
      |  CAST(list_sum(list_transform(range(1, length(text) + 1),
      |    i -> ord(substr(text, CAST(i AS INT), 1)))) AS BIGINT) AS byte_sum,
      |  CAST(ord(substr(text, 1, 1)) AS BIGINT) AS first_byte,
      |  CAST(ord(substr(text, -1, 1)) AS BIGINT) AS last_byte
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Video-style frame sampling: every 5th frame index, with a
    * deterministic per-frame key (the handle a real pipeline would use to
    * address the decoded frame blob). Explode keeps it distributed — one
    * output row per sampled frame, no driver loop. */
  def mmFrameSample(s: SparkSession, dir: String): DataFrame =
    media(s, dir).filter(col("format") === "mp4")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(5L)))
          .as("frame_idx"))
      .withColumn("frame_key",
        md5(concat_ws(":", col("doc_id"), col("frame_idx"))))
      .orderBy(col("doc_id"), col("frame_idx"))

  val mmFrameSampleSql: String =
    """SELECT doc_id, n_frames, frame_idx,
      |       md5(doc_id || ':' || frame_idx) AS frame_key
      |FROM (
      |  SELECT doc_id, CAST(doc_id % 30 + 1 AS BIGINT) AS n_frames,
      |         unnest(range(0, doc_id % 30 + 1, 5)) AS frame_idx
      |  FROM documents WHERE doc_id % 4 = 2)
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** Aspect-preserving resize planning into a 224×224 box (the tensor-prep
    * step before a vision encoder) — pure expression math. */
  def mmResizeMeta(s: SparkSession, dir: String): DataFrame = {
    val scale = least(lit(224.0) / col("width"), lit(224.0) / col("height"))
    media(s, dir).select(
      col("doc_id"), col("format"), col("width"), col("height"),
      floor(col("width") * scale).cast("long").as("out_w"),
      floor(col("height") * scale).cast("long").as("out_h"))
      .orderBy(col("doc_id"))
  }

  val mmResizeMetaSql: String =
    """SELECT doc_id,
      |  ['png','jpg','mp4','wav'][CAST(doc_id % 4 + 1 AS INT)] AS format,
      |  width, height,
      |  CAST(floor(width * least(224.0 / width, 224.0 / height)) AS BIGINT)
      |    AS out_w,
      |  CAST(floor(height * least(224.0 / width, 224.0 / height)) AS BIGINT)
      |    AS out_h
      |FROM (
      |  SELECT doc_id,
      |    CAST(64 + (doc_id % 16) * 8 AS BIGINT) AS width,
      |    CAST(48 + (doc_id % 12) * 8 AS BIGINT) AS height
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("mm_decode_features", mmDecodeFeatures _, Some(mmDecodeFeaturesSql)),
      ("mm_frame_sample", mmFrameSample _, Some(mmFrameSampleSql)),
      ("mm_resize_meta", mmResizeMeta _, Some(mmResizeMetaSql)))
}
