package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-scale streaming validation for `stream_neardup` (round 18 — the same
  * protocol [[StreamAsofProbe]] established for the as-of family): the k×
  * documents corpus is re-ranked to dense doc ids, sliced into rank-range
  * parquet files, and replayed as a REAL checkpointed RocksDB streaming
  * query via a file source with `maxFilesPerTrigger=1`; the admission
  * verdicts' checksum must equal the registered batch twin
  * ([[graft.streaming.StreamNeardup.admitNeardupBatch]]) computed on the
  * same corpus — dense ranks make the twin's doc-id-distance horizon and
  * the stream's event-time horizon (ts = rank minutes) the same contract.
  *
  * Env: SPARK_GRAFT_SCALE_DIR / SPARK_GRAFT_SCALE_REUSE (corpus build via
  * [[ScaleProbe.buildCorpus]]), SPARK_GRAFT_STREAM_SLICES (default 8),
  * SPARK_GRAFT_CPUS. Args: k (default 64). Dev tooling, not library
  * surface. */
object StreamNeardupProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 64
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scratch = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scaleprobe")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val slices = sys.env.get("SPARK_GRAFT_STREAM_SLICES").map(_.toInt).getOrElse(8)
    val horizonDocs = graft.streaming.StreamNeardup.HorizonDocsDefault
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.numRecentProgressUpdates",
        math.max(256, slices * 2 + 16).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Confs.applyExtraConf(spark)
    val tally = new ScaleProbe.SpillTally
    spark.sparkContext.addSparkListener(tally)

    val (_, kDir) = ScaleProbe.buildCorpus(spark, base, k, scratch)
    // dense re-rank: copy-strided doc ids → 0..N-1 in id order, so the
    // batch twin's doc-id-distance horizon equals the stream's event-time
    // horizon at ts = rank minutes. One window pass, written once.
    val corpusDir = s"$scratch/snd_x$k"
    val docsPath = s"$corpusDir/documents.parquet"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$docsPath/_SUCCESS"))) {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
      Tables.documents(spark, kDir)
        .select((row_number().over(w) - 1).cast("long").as("doc_id"),
                col("text"), col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(docsPath)
    } else System.err.println(s"[streamnd] reusing $docsPath")
    val n = Tables.countOf(spark, corpusDir, "documents")

    // slice into rank ranges with sortable names + increasing mtimes so the
    // file source replays them in rank (= event-time) order
    val streamDir = s"$corpusDir/stream_s$slices"
    val TsBase = 1600000000000L
    StreamSlices.write(
      spark.read.parquet(docsPath)
        .select(timestamp_millis(lit(TsBase) + col("doc_id") * 60000L).as("ts"),
                col("doc_id"), col("text")),
      "doc_id", n, streamDir, slices)

    def checksum(df: DataFrame): (Long, Long) =
      df.agg(count(lit(1)),
             coalesce(bit_xor(xxhash64(col("doc_id"), col("verdict"),
               col("match_id"))), lit(0L)))
        .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)).head()

    val t0 = System.nanoTime()
    val ref = checksum(
      graft.streaming.StreamNeardup.admitNeardupBatch(spark, corpusDir, horizonDocs))
    println(f"[streamnd] reference batch twin: rows=${ref._1} " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1fs")

    val outDir = s"$corpusDir/out_s$slices"
    val ckpt = s"$corpusDir/ckpt_s$slices"
    Seq(outDir, ckpt).foreach(d => Util.deleteRecursively(new java.io.File(d)))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "ts timestamp, doc_id bigint, text string")
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir)
    tally.reset()
    val t1 = System.nanoTime()
    val q = graft.streaming.StreamNeardup.streamNeardup(
        src.withWatermark("ts", "1 minute"), horizonDocs * 60000L)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    q.processAllAvailable()
    val wall = (System.nanoTime() - t1) / 1e9
    val stateRows = q.recentProgress.map(_.stateOperators.map(_.numRowsTotal).sum)
      .foldLeft(0L)(math.max)
    val stateMem = q.recentProgress.map(_.stateOperators.map(_.memoryUsedBytes).sum)
      .foldLeft(0L)(math.max)
    // memoryUsedBytes for RocksDB is dominated by configured caches and
    // compressed SSTs — it barely moved under a payload change that cut
    // logical member bytes (round 19). The SST file size is the honest
    // stored-payload denominator; report both.
    val stateSst = q.recentProgress.map(_.stateOperators.map(so =>
        Option(so.customMetrics.get("rocksdbSstFileSize")).map(_.longValue)
          .getOrElse(0L)).sum)
      .foldLeft(0L)(math.max)
    val batches = q.recentProgress.length
    q.stop()
    val peakMb = tally.peak.get / 1e6
    val got = checksum(spark.read.parquet(outDir))
    val ok = got == ref
    println(f"[streamnd] k=$k docs=$n slices=$slices wall=$wall%7.1fs " +
      f"batches=$batches%3d stateRows=$stateRows%9d " +
      f"stateMem=${stateMem / 1e6}%8.1fMB sst=${stateSst / 1e6}%8.1fMB " +
      f"peakTask=$peakMb%6.1fMB rows=${got._1} equal=$ok")
    if (!ok) System.err.println(s"[streamnd] OUTPUT MISMATCH: got=$got ref=$ref")
    spark.stop()
  }
}
