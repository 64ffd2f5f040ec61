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

  /** Registered rows-only query: decode features joined back to metadata. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_stub" -> ((s, d) => {
      decodeFeatures(mediaTable(s, d)).toDF()
        .select("doc_id", "n_bytes", "format", "out_width", "out_height", "checksum")
        .orderBy("doc_id")
    }),
  )
}
