package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal columns as opaque binary + typed metadata (SURVEY.md §2.11 /
  * builder prompt): image/audio/video payloads ride through the engine as
  * `binary` columns next to a metadata struct; decode / feature-extract /
  * resize run batch-at-a-time inside `mapPartitions` so a real decoder
  * would amortize model/codec initialization once per partition — the
  * Scala-side equivalent of a batched pandas-style UDF.
  *
  * The decode step itself is a clearly-marked STUB (no image/audio codecs in
  * this environment): [[StubDecoder]] derives deterministic fake features
  * from the bytes. The Spark-side plumbing — schema, partitioning, batch
  * iteration, typed Encoders — is real and tested; swapping in a true codec
  * touches only [[StubDecoder.decode]].
  *
  * 100 TB: media rows are large and skewed → repartition by record id before
  * the decode stage so one straggler file cannot serialize a whole partition,
  * and features (small) flow on while payloads are dropped right after
  * decode (projection cuts the shuffle width).
  */
object Multimodal {

  /** One media record: payload + the metadata a real ingest would carry. */
  case class MediaRecord(doc_id: Long, media: Array[Byte], format: String,
                         width: Int, height: Int)

  /** Extracted features (what a decoder/embedder would emit). */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, format: String,
                           out_width: Int, out_height: Int, checksum: Long)

  /** STUB decoder — deterministic fake standing in for image/audio codecs
    * that are not available in this container. A production build replaces
    * only this object. */
  object StubDecoder {
    val TargetSize = 224 // "resize" target, as an image pipeline would use

    def decode(r: MediaRecord): MediaFeatures = {
      var h = 1469598103934665603L // FNV-1a over the payload: fake "content"
      var i = 0
      while (i < r.media.length) { h ^= r.media(i) & 0xffL; h *= 1099511628211L; i += 1 }
      MediaFeatures(r.doc_id, r.media.length, r.format,
        math.min(r.width, TargetSize), math.min(r.height, TargetSize), h)
    }
  }

  /** Build the media table from the documents fixture: text bytes stand in
    * for an encoded payload; metadata is derived deterministically. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"),
        col("text").cast("binary").as("media"),
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpeg").otherwise("wav").as("format"),
        (col("n_chars") % 1000 + 32).cast("int").as("width"),
        (col("n_chars") % 500 + 32).cast("int").as("height"))
      .as[MediaRecord]
  }

  /** The decode stage: partition-batched feature extraction. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media
      .repartition(col("doc_id")) // spread large payloads before decode
      .mapPartitions { batch =>
        // per-partition init would happen here (codec/model load, once)
        batch.map(StubDecoder.decode)
      }
  }

  /** One sampled frame: which frame of which record, and its stub features. */
  case class FrameSample(doc_id: Long, frame_idx: Int, frame_bytes: Int,
                         frame_checksum: Long)

  val FrameBytes = 64   // fixed-size "frame" chunk of the payload
  val FrameStride = 4   // keep every 4th frame (video frame-sampling idiom)

  /** Frame sampling: the one→many decode shape (a video record explodes into
    * its sampled frames). Chunking + striding happen inside the same
    * partition-batched stage as decode, so the payload is read once and only
    * small per-frame features leave the stage — at 100 TB the frame fan-out
    * (can be 1000x rows) must never materialize raw frame bytes into a
    * shuffle. Frame features are FNV digests of the frame's bytes (stub). */
  def sampleFrames(media: Dataset[MediaRecord]): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media
      .repartition(col("doc_id"))
      .mapPartitions { batch =>
        batch.flatMap { r =>
          val nFrames = (r.media.length + FrameBytes - 1) / FrameBytes
          (0 until nFrames by FrameStride).iterator.map { f =>
            val lo = f * FrameBytes
            val hi = math.min(lo + FrameBytes, r.media.length)
            var h = 1469598103934665603L
            var i = lo
            while (i < hi) { h ^= r.media(i) & 0xffL; h *= 1099511628211L; i += 1 }
            FrameSample(r.doc_id, f, hi - lo, h)
          }
        }
      }
  }

  /** Registered rows-only queries: decode features joined back to metadata,
    * and the frame-sampling fan-out. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_stub" -> ((s, d) => {
      decodeFeatures(mediaTable(s, d)).toDF()
        .select("doc_id", "n_bytes", "format", "out_width", "out_height", "checksum")
        .orderBy("doc_id")
    }),
    "mm_frame_sample" -> ((s, d) => {
      sampleFrames(mediaTable(s, d)).toDF()
        .orderBy("doc_id", "frame_idx")
    }),
  )
}
