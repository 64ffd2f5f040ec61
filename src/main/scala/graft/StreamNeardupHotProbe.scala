package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mega-duplicate (hot-band) cell for `stream_neardup`'s capped guard
  * (round 19 — round-18 verdict item 3): a synthetic stream of 2c docs
  * where every ODD doc is the same hot text (c identical copies sharing
  * one exact-band key and all 16 MinHash band keys) and every even doc is
  * unique, with the horizon spanning the WHOLE stream — the regime where
  * the uncapped band processor pays O(c) comparisons per hot arrival
  * (O(c²) total) and the cap bounds it at O(cap·c). Replayed twice as a
  * real checkpointed RocksDB query: cap OFF, then cap ON
  * ([[graft.streaming.StreamNeardup.StreamBandCapConf]], arg 2).
  *
  * In THIS construction capped output equals uncapped exactly — the hot
  * clique's min-id copy (doc 1) never expires, keep-earliest retains it,
  * and every later copy's contract answer IS doc 1 — so the cell measures
  * pure guard overhead/savings at checksum parity; the recall trade where
  * the kept copy expires is pinned separately in StreamingSpec. The batch
  * twin cross-checks both checksums.
  *
  * NOTE the round-19 restructure moved the uncapped hot regime's cost
  * from O(c) in-band COMPARISONS per arrival to O(c) emitted CANDIDATE
  * rows per arrival (each carrying the arriving doc's shingle-hash
  * array): uncapped candidate volume is 16·c²/2 rows, so the OFF cell is
  * only affordable at moderate c (≈2000 → 3.2e7 candidate rows) while the
  * ON cell scales to c = 10⁴ and beyond — which is the point: the cap is
  * the load-bearing guard for this regime, and the probe records the
  * boundary it guards.
  *
  * Env: SPARK_GRAFT_STREAM_SLICES (default 8), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_HOT_DIR (scratch, default /tmp/gsp_hotnd),
  * SPARK_GRAFT_HOT_MODES (csv subset of off,cap — default both).
  * Args: c (default 2000 hot copies), cap (default 16). Dev tooling. */
object StreamNeardupHotProbe {
  def main(args: Array[String]): Unit = {
    val c = if (args.length > 0) args(0).toInt else 2000
    val cap = if (args.length > 1) args(1).toInt else 16
    val scratch = sys.env.getOrElse("SPARK_GRAFT_HOT_DIR", "/tmp/gsp_hotnd")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val slices = sys.env.get("SPARK_GRAFT_STREAM_SLICES").map(_.toInt).getOrElse(8)
    val modes = sys.env.getOrElse("SPARK_GRAFT_HOT_MODES", "off,cap")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val n = 2L * c
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

    // corpus: odd ids = the hot 20-token text; even ids = unique 20-token
    // texts (id-seeded tokens, so no cross-doc shingle overlap)
    val corpusDir = s"$scratch/hot_c$c"
    val docsPath = s"$corpusDir/documents.parquet"
    val hotText = (1 to 20).map(i => s"hot$i").mkString(" ")
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$docsPath/_SUCCESS"))) {
      spark.range(n)
        .select(col("id").as("doc_id"),
          when(col("id") % 2 === 1, hotText)
            .otherwise(concat_ws(" ",
              (1 to 20).map(i => concat(lit(s"u${i}_"), col("id"))): _*))
            .as("text"),
          lit("en").as("lang"), lit("hot").as("source"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(docsPath)
    } else System.err.println(s"[hotnd] reusing $docsPath")

    val TsBase = 1600000000000L
    val streamDir = s"$corpusDir/stream_s$slices"
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

    // horizon spans the whole stream: nothing evicts, the hot clique's
    // in-horizon size reaches c
    val horizonDocs = n + 1
    val t0 = System.nanoTime()
    val ref = checksum(
      graft.streaming.StreamNeardup.admitNeardupBatch(spark, corpusDir, horizonDocs))
    println(f"[hotnd] batch twin: rows=${ref._1} " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1fs")

    modes.map(m => if (m == "off") 0 else cap).foreach { capRun =>
      val tag = if (capRun == 0) "off" else s"cap$capRun"
      val outDir = s"$corpusDir/out_${slices}_$tag"
      val ckpt = s"$corpusDir/ckpt_${slices}_$tag"
      Seq(outDir, ckpt).foreach(d => Util.deleteRecursively(new java.io.File(d)))
      // cap defaults ON since round 20 — "off" must be an explicit 0 now
      spark.conf.set(graft.streaming.StreamNeardup.StreamBandCapConf,
        capRun.toString)
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "ts timestamp, doc_id bigint, text string")
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(streamDir)
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
      val stateSst = q.recentProgress.map(_.stateOperators.map(so =>
          Option(so.customMetrics.get("rocksdbSstFileSize")).map(_.longValue)
            .getOrElse(0L)).sum)
        .foldLeft(0L)(math.max)
      q.stop()
      val got = checksum(spark.read.parquet(outDir))
      println(f"[hotnd] mode=$tag%-6s c=$c docs=$n wall=$wall%7.1fs " +
        f"stateRows=$stateRows%9d sst=${stateSst / 1e6}%8.1fMB " +
        f"rows=${got._1} equal=${got == ref}")
      if (got != ref)
        System.err.println(s"[hotnd] MISMATCH ($tag): got=$got ref=$ref")
    }
    spark.stop()
  }
}
