package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus the decode / feature-extract /
  * resize / frame-sample stages a training-data pipeline runs over them.
  *
  * The Spark-side architecture is real and tested — schema, partition
  * strategy, batch-shaped partition-level processing (`mapPartitions`,
  * the JVM analog of `mapInPandas`: one iterator per partition so
  * per-batch setup like a decoder context is amortized). The actual
  * codec work is STUBBED with a deterministic fake (this container ships
  * no image/audio libraries): `decodeStub` derives pixel-like features
  * from the bytes themselves, so the pipeline shape is exercised
  * end-to-end with verifiable outputs.
  *
  * Scale notes: binary payloads ride the same columnar scans as
  * everything else (parquet binary + min/max-prunable metadata columns);
  * feature extraction is embarrassingly parallel in the scan stage; the
  * only shuffle is whatever aggregation follows. Keep payloads under the
  * row-group target (~tens of MB) and push oversized media to object
  * storage with a pointer column — the schema below carries both forms.
  */
object Multimodal {

  /** Typed metadata for an opaque media payload. `uri` is the
    * pointer-form alternative to inline `content`.
    */
  case class MediaMeta(
      mediaType: String, // "image" | "audio" | "video"
      format: String,    // container/codec tag, e.g. "png", "wav"
      width: Int,
      height: Int,
      durationMs: Long,
      uri: String)

  case class MediaRecord(doc_id: Long, content: Array[Byte], meta: MediaMeta)

  /** Deterministic fake "media table": wraps each document's text bytes
    * as an opaque payload with synthesized metadata. Stands in for a real
    * binary-column table; schema and partitioning are what a real one
    * uses.
    */
  def mediaTable(spark: SparkSession, d: String): Dataset[MediaRecord] = {
    import spark.implicits._
    documents(spark, d).select($"doc_id", $"text", $"n_chars").as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val bytes = text.getBytes("UTF-8")
        MediaRecord(id, bytes,
          MediaMeta("image", "fake", (nChars % 64).toInt + 1, 32, 0L, s"mem://doc/$id"))
      }
  }

  /** STUB decoder: a real implementation hands `content` to an image
    * library here. The deterministic fake treats bytes as a row-major
    * grayscale image of meta.width columns. Marked clearly; swap the body
    * for javax.imageio / ffmpeg bindings where available.
    */
  def decodeStub(content: Array[Byte], meta: MediaMeta): Array[Array[Int]] = {
    val w = math.max(1, meta.width)
    content.map(b => (b & 0xff)).grouped(w).map(_.padTo(w, 0)).toArray
  }

  case class MediaFeatures(
      doc_id: Long, n_bytes: Long, width: Int, height: Int,
      mean_px: Double, histogram: Array[Long])

  /** Feature extraction over partition-sized batches — the mapInPandas
    * shape: per-partition setup (decoder context) is created once per
    * iterator, rows stream through it. Output is a plain columnar
    * Dataset ready for relational ops.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition "decoder" setup would happen here (once per batch)
      it.map { rec =>
        val img = decodeStub(rec.content, rec.meta)
        val flat = img.flatten
        val hist = Array.ofDim[Long](16)
        flat.foreach(p => hist(p / 16) += 1)
        MediaFeatures(rec.doc_id, rec.content.length.toLong,
          rec.meta.width, img.length,
          if (flat.isEmpty) 0.0 else flat.map(_.toLong).sum.toDouble / flat.length,
          hist)
      }
    }
  }

  /** STUB resize: nearest-neighbor downsample of the fake decode — the
    * partition/batch plumbing is the point; swap the kernel for a real
    * scaler.
    */
  def resizeStub(img: Array[Array[Int]], outW: Int, outH: Int): Array[Array[Int]] = {
    val h = math.max(1, img.length); val w = math.max(1, img.headOption.map(_.length).getOrElse(1))
    Array.tabulate(outH, outW)((y, x) => img(y * h / outH)(x * w / outW))
  }

  /** Frame sampling for video-shaped payloads: deterministic every-Nth
    * selection over a byte-chunk "frame" sequence (stub frames; real
    * impl = container demux). Emits (doc_id, frame_idx, frame_bytes).
    */
  def sampleFrames(media: Dataset[MediaRecord], everyN: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { rec =>
      val frameSize = math.max(1, rec.meta.width)
      rec.content.grouped(frameSize).zipWithIndex.collect {
        case (frame, idx) if idx % everyN == 0 => (rec.doc_id, idx, frame)
      }
    }.toDF("doc_id", "frame_idx", "frame_bytes")
  }

  /** The full pipeline as one oracle-friendly query: media → features →
    * relational aggregate per width bucket. Exercises binary columns,
    * mapPartitions batching, and the downstream shuffle.
    */
  def featureSummary(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaTable(spark, d)).toDF()
      .groupBy(($"width" % 8).as("width_bucket"))
      .agg(count(lit(1)).as("n"),
        sum($"n_bytes").as("total_bytes"),
        max($"height").as("max_height"))
  }
}
