package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal columns as opaque binary + typed metadata (SURVEY.md §2.11 /
  * builder prompt): image/audio/video payloads ride through the engine as
  * `binary` columns next to a metadata struct; decode / feature-extract /
  * resize run batch-at-a-time inside `mapPartitions` so a real decoder
  * would amortize model/codec initialization once per partition — the
  * Scala-side equivalent of a batched pandas-style UDF (the MessageDigest
  * below IS that per-partition init, exercised for real).
  *
  * The decode step itself is a clearly-marked STUB (no image/audio codecs in
  * this environment): [[StubDecoder]] derives deterministic fake features
  * from the bytes — md5 digests, chosen over a custom hash so the WHOLE
  * stage is DuckDB-oracle-checkable (the fixture text is pure ASCII, so
  * Spark's bytes and DuckDB's characters agree). The Spark-side plumbing —
  * schema, partitioning, batch iteration, typed Encoders — is real and
  * tested; swapping in a true codec touches only [[StubDecoder]].
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
                           out_width: Int, out_height: Int, checksum: String)

  /** STUB decoder — deterministic fake standing in for image/audio codecs
    * that are not available in this container. A production build replaces
    * only this object. The digest instance is created once per partition
    * (see [[decodeFeatures]]) — the codec/model-init amortization slot. */
  object StubDecoder {
    val TargetSize = 224 // "resize" target, as an image pipeline would use

    def newDigest(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")

    def hex(d: Array[Byte]): String = d.map("%02x".format(_)).mkString

    def decode(md: java.security.MessageDigest, r: MediaRecord): MediaFeatures = {
      md.reset()
      MediaFeatures(r.doc_id, r.media.length, r.format,
        math.min(r.width, TargetSize), math.min(r.height, TargetSize),
        hex(md.digest(r.media)))
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
        val md = StubDecoder.newDigest() // per-partition init, once
        batch.map(r => StubDecoder.decode(md, r))
      }
  }

  /** One sampled frame: which frame of which record, and its stub features. */
  case class FrameSample(doc_id: Long, frame_idx: Int, frame_bytes: Int,
                         frame_checksum: String)

  val FrameBytes = 64   // fixed-size "frame" chunk of the payload
  val FrameStride = 4   // keep every 4th frame (video frame-sampling idiom)

  /** Frame sampling: the one→many decode shape (a video record explodes into
    * its sampled frames). Chunking + striding happen inside the same
    * partition-batched stage as decode, so the payload is read once and only
    * small per-frame features leave the stage — at 100 TB the frame fan-out
    * (can be 1000x rows) must never materialize raw frame bytes into a
    * shuffle. Frame features are md5 digests of the frame's bytes (stub). */
  def sampleFrames(media: Dataset[MediaRecord]): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media
      .repartition(col("doc_id"))
      .mapPartitions { batch =>
        val md = StubDecoder.newDigest() // per-partition init, once
        batch.flatMap { r =>
          val nFrames = (r.media.length + FrameBytes - 1) / FrameBytes
          (0 until nFrames by FrameStride).iterator.map { f =>
            val lo = f * FrameBytes
            val hi = math.min(lo + FrameBytes, r.media.length)
            md.reset()
            md.update(r.media, lo, hi - lo)
            FrameSample(r.doc_id, f, hi - lo, StubDecoder.hex(md.digest()))
          }
        }
      }
  }

  /** Both stages registered with full DuckDB oracles: md5 exists in both
    * engines and the payload is ASCII text bytes, so the fake features are
    * cross-checkable end-to-end — schema, metadata derivation, resize
    * clamping, chunking and striding all verified, not just row counts. */
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

  val oracle: Map[String, String] = Map(
    "mm_decode_stub" ->
      s"""SELECT doc_id, cast(strlen(text) as int) AS n_bytes,
         |  CASE WHEN doc_id % 3 = 0 THEN 'png'
         |       WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'wav' END AS format,
         |  cast(least(n_chars % 1000 + 32, ${StubDecoder.TargetSize}) as int) AS out_width,
         |  cast(least(n_chars % 500 + 32, ${StubDecoder.TargetSize}) as int) AS out_height,
         |  md5(text) AS checksum
         |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      s"""WITH f AS (
         |  SELECT doc_id, text, strlen(text) AS n,
         |    unnest(range(0, cast(ceil(strlen(text) / ${FrameBytes}.0) as bigint), $FrameStride)) AS fi
         |  FROM documents)
         |SELECT doc_id, cast(fi as int) AS frame_idx,
         |  cast(least($FrameBytes, n - fi * $FrameBytes) as int) AS frame_bytes,
         |  md5(substr(text, cast(fi * $FrameBytes + 1 as int), $FrameBytes)) AS frame_checksum
         |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
