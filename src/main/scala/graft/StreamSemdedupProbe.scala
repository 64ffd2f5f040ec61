package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-scale streaming validation for `stream_semdedup` (round 19 — the
  * [[StreamNeardupProbe]] protocol applied to the embedding admission
  * operator): the k× embeddings corpus is re-ranked to dense vec ids,
  * sliced into rank-range parquet files, and replayed as a REAL
  * checkpointed RocksDB streaming query via a file source with
  * `maxFilesPerTrigger=1`. TWO replays:
  *
  *   - EXACT mode (`numProbe = |codebook|` — exhaustive candidate
  *     generation): the verdict checksum must EQUAL the registered batch
  *     twin ([[graft.streaming.StreamSemdedup.semdedupBatch]]) on the same
  *     corpus — dense ranks make the twin's vec-id-distance horizon and
  *     the stream's event-time horizon (ts = rank minutes) the same
  *     contract, and exhaustive probing removes the IVF miss term.
  *   - DEFAULT mode (the derived `numProbe`): per-row verdict AGREEMENT
  *     against the twin is measured and reported — the quantified IVF
  *     miss rate of the production-shaped path.
  *
  * Env: SPARK_GRAFT_SCALE_DIR / SPARK_GRAFT_SCALE_REUSE (corpus build via
  * [[ScaleProbe.buildCorpus]] — point at an embeddings-tables scratch,
  * e.g. /tmp/gsp_emb_struct), SPARK_GRAFT_SCALE_TABLES=embeddings,
  * SPARK_GRAFT_STREAM_SLICES (default 8), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_SEMDEDUP_MODES (csv of exact,default — default both).
  * Args: k (default 64). Dev tooling, not library surface. */
object StreamSemdedupProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 64
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scratch = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scaleprobe")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val slices = sys.env.get("SPARK_GRAFT_STREAM_SLICES").map(_.toInt).getOrElse(8)
    val modes = sys.env.getOrElse("SPARK_GRAFT_SEMDEDUP_MODES", "exact,default")
      .split(",").map(_.trim).filter(_.nonEmpty)
    val horizonVecs = graft.streaming.StreamSemdedup.HorizonVecsDefault
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
    // dense re-rank: copy-strided vec ids → 0..N-1 in id order, so the
    // batch twin's vec-id-distance horizon equals the stream's event-time
    // horizon at ts = rank minutes
    val corpusDir = s"$scratch/ssd_x$k"
    val vecsPath = s"$corpusDir/embeddings.parquet"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$vecsPath/_SUCCESS"))) {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
      Tables.embeddings(spark, kDir)
        .select((row_number().over(w) - 1).cast("long").as("vec_id"),
                col("embedding"), col("label"))
        .write.mode("overwrite").parquet(vecsPath)
    } else System.err.println(s"[streamsd] reusing $vecsPath")
    val n = Tables.countOf(spark, corpusDir, "embeddings")

    val streamDir = s"$corpusDir/stream_s$slices"
    val TsBase = 1600000000000L
    StreamSlices.write(
      spark.read.parquet(vecsPath)
        .select(timestamp_millis(lit(TsBase) + col("vec_id") * 60000L).as("ts"),
                col("vec_id"), col("embedding").cast("array<float>").as("embedding")),
      "vec_id", n, streamDir, slices)

    def checksum(df: DataFrame): (Long, Long) =
      df.agg(count(lit(1)),
             coalesce(bit_xor(xxhash64(col("vec_id"), col("verdict"),
               col("match_id"))), lit(0L)))
        .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)).head()

    val t0 = System.nanoTime()
    val ref = graft.streaming.StreamSemdedup
      .semdedupBatch(spark, corpusDir, horizonVecs)
      .transform(graft.Caching.cachedOnce)
    val refChk = checksum(ref)
    println(f"[streamsd] reference batch twin: rows=${refChk._1} " +
      f"dups=${ref.where(col("verdict") === "dup").count()} " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1fs")

    val cb = graft.streaming.StreamSemdedup.codebook(spark, corpusDir)
    val npDefault = graft.streaming.StreamSemdedup.numProbeFor(spark, cb.length)
    println(s"[streamsd] codebook cells=${cb.length} derived np=$npDefault")

    modes.foreach { mode =>
      val np = if (mode == "exact") cb.length else npDefault
      val outDir = s"$corpusDir/out_s${slices}_$mode"
      val ckpt = s"$corpusDir/ckpt_s${slices}_$mode"
      Seq(outDir, ckpt).foreach(d => Util.deleteRecursively(new java.io.File(d)))
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "ts timestamp, vec_id bigint, embedding array<float>")
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(streamDir)
      tally.reset()
      val t1 = System.nanoTime()
      val q = graft.streaming.StreamSemdedup.streamSemdedup(
          src.withWatermark("ts", "1 minute"), horizonVecs * 60000L, cb, np)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
      q.processAllAvailable()
      val wall = (System.nanoTime() - t1) / 1e9
      val stateRows = q.recentProgress.map(_.stateOperators.map(_.numRowsTotal).sum)
        .foldLeft(0L)(math.max)
      val stateMem = q.recentProgress.map(_.stateOperators.map(_.memoryUsedBytes).sum)
        .foldLeft(0L)(math.max)
      val stateSst = q.recentProgress.map(_.stateOperators.map(so =>
          Option(so.customMetrics.get("rocksdbSstFileSize")).map(_.longValue)
            .getOrElse(0L)).sum)
        .foldLeft(0L)(math.max)
      val batches = q.recentProgress.length
      q.stop()
      val peakMb = tally.peak.get / 1e6
      val got = spark.read.parquet(outDir)
      val gotChk = checksum(got)
      val agree = got.as("g").join(ref.as("r"), "vec_id")
        .where(col("g.verdict") === col("r.verdict") &&
               col("g.match_id") === col("r.match_id")).count()
      val ok = gotChk == refChk
      println(f"[streamsd] mode=$mode%-7s np=$np%4d k=$k vecs=$n " +
        f"slices=$slices wall=$wall%7.1fs batches=$batches%3d " +
        f"stateRows=$stateRows%9d stateMem=${stateMem / 1e6}%8.1fMB " +
        f"sst=${stateSst / 1e6}%8.1fMB peakTask=$peakMb%6.1fMB " +
        f"rows=${gotChk._1} agree=$agree/${refChk._1} equal=$ok")
      if (mode == "exact" && !ok)
        System.err.println(s"[streamsd] EXACT-MODE MISMATCH: got=$gotChk ref=$refChk")
    }
    spark.stop()
  }
}
