package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.{AsofStreamRow, EpochAsof, Streams}

/** Dev-only STREAMING skew probe for the stateful as-of family (round 17 —
  * the round-16 verdict's item 1, the escape's one unmeasured cell): the
  * round-15/16 hot-key numbers were taken on the BATCH twins; this main
  * times the four spellings as ACTUAL multi-micro-batch, checkpointed
  * streaming queries over a file-source stream, so the epoch escape's
  * chained-transformWithState cost/benefit is measured where it ships —
  * RocksDB state, per-batch watermark advancement, timer-driven flushes.
  *
  * Protocol: the k×-scaled events corpus (built/reused via
  * [[ScaleProbe.buildCorpus]] — set SPARK_GRAFT_SCALE_TABLES=events and
  * SPARK_GRAFT_SCALE_TRANSFORM=hotkey|default, SPARK_GRAFT_SCALE_REUSE=1)
  * is sliced into SPARK_GRAFT_STREAM_SLICES (default 16) event-time ranges,
  * one parquet file per slice with strictly increasing mtimes + sortable
  * names, plus a far-future one-row mover slice that drains the buffered
  * spellings' tails. A file-source stream with maxFilesPerTrigger=1 then
  * replays them as micro-batches in event-time order — a valid instance of
  * BOTH family contracts (in-order for the state spellings, within-horizon
  * for the buffered ones). Each config runs once (multi-second runs;
  * single-pass precedent SPARK_GRAFT_SCALE_PASSES=1), writing a parquet
  * sink whose (count, xxhash64 sum) checksum must equal the batch-twin
  * exact as-of computed from the SAME stream input — the probe is also an
  * at-scale equality check, mover excluded on both sides.
  *
  * The sparse-dim precondition (SURVEY open edge (a), EpochAsof class doc)
  * gets its number via SPARK_GRAFT_STREAM_SPARSEDIMS=N: the hot user's dims
  * are decimated to every N-th event id at stream-prep, making dims much
  * rarer than the epoch width — most hot facts emit Unresolved and pass 2
  * re-serializes them per user WITHIN each micro-batch, the documented
  * regime where the escape's win shrinks.
  *
  * Usage: runMain graft.StreamAsofProbe [k] [configs] [widthSec]
  *   configs ⊆ state_single,state_epoch,buf_single,buf_epoch (default all)
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_SCALE_DIR (one dir per corpus
  * regime — see ScaleProbe), SPARK_GRAFT_STREAM_SLICES,
  * SPARK_GRAFT_STREAM_SPARSEDIMS, SPARK_GRAFT_CPUS. NOT part of the
  * shipped library surface. */
object StreamAsofProbe {
  private val MoverUser = -424242L

  /** Slice the corpus into event-time-range files the file source will
    * replay in order (strictly increasing mtimes + sortable names break
    * any tie the same way). */
  private def prepareStream(spark: SparkSession, kDir: String,
                            streamDir: String, slices: Int,
                            sparseDims: Long): Unit = {
    import spark.implicits._
    val p = java.nio.file.Paths.get(streamDir)
    Util.deleteRecursively(p.toFile)
    java.nio.file.Files.createDirectories(p)
    val rows = Tables.events(spark, kDir)
      .select(col("ts"), col("user_id"), col("event_id"),
              (col("event_type") === "purchase").as("is_dim"), col("event_type"))
    val filtered =
      if (sparseDims > 0)
        rows.where(!(col("user_id") === 0L && col("is_dim") &&
                     pmod(col("event_id"), lit(sparseDims)) =!= 0))
      else rows
    val (loUs, hiUs) = filtered
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .as[(Long, Long)].head()
    val span = hiUs - loUs + 1
    val tmp = s"$streamDir/_build"
    (0 until slices).foreach { i =>
      val lo = loUs + span * i / slices
      val hi = loUs + span * (i + 1) / slices
      filtered.where(unix_micros(col("ts")) >= lo &&
                     unix_micros(col("ts")) < hi)
        .repartition(1)
        .write.mode("overwrite").parquet(tmp)
      promote(tmp, streamDir, i)
    }
    // mover slice: one far-future fact that drains every buffered tail
    Seq((new java.sql.Timestamp(hiUs / 1000L + 90L * 24 * 3600 * 1000),
         MoverUser, -1L, false, "view"))
      .toDF("ts", "user_id", "event_id", "is_dim", "event_type")
      .repartition(1).write.mode("overwrite").parquet(tmp)
    promote(tmp, streamDir, slices)
  }

  /** Move the single part file of `tmp` to `dir/slice_%04d.parquet` with
    * mtime = i seconds past a fixed base, then drop the temp dir. */
  private def promote(tmp: String, dir: String, i: Int): Unit = {
    // Files.list holds an open DirectoryStream — close it (round-17 review:
    // one leaked fd per slice otherwise)
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
    val part =
      try listing.filter(f => f.getFileName.toString.startsWith("part-"))
        .findFirst().get()
      finally listing.close()
    val dest = java.nio.file.Paths.get(f"$dir/slice_$i%04d.parquet")
    java.nio.file.Files.move(part, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    java.nio.file.Files.setLastModifiedTime(dest,
      java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 2000L))
    Util.deleteRecursively(new java.io.File(tmp))
  }

  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 64
    val all = Seq("state_single", "state_epoch", "buf_single", "buf_epoch")
    val configs = if (args.length > 1) args(1).split(",").toSeq else all
    val widthSec = if (args.length > 2) args(2).toLong else 3600L
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scratch = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scaleprobe")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val slices = sys.env.get("SPARK_GRAFT_STREAM_SLICES").map(_.toInt).getOrElse(16)
    val sparseDims = sys.env.get("SPARK_GRAFT_STREAM_SPARSEDIMS").map(_.toLong).getOrElse(0L)
    // watermark delay for the buffered spellings; a delay LONGER than the
    // corpus span turns the run into the catch-up regime (everything
    // buffers until the mover) — the read-skip A/B cell
    val wmDelay = sys.env.getOrElse("SPARK_GRAFT_STREAM_WM_DELAY", "60 seconds")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // the production state store the specs pin — not the default HDFS one
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // the per-config metrics below fold over q.recentProgress, which Spark
      // caps at numRecentProgressUpdates (default 100): a slice count above
      // ~100 would silently window batches/stateRows/stateMem to the last
      // 100 micro-batches (round-17 ADVICE). Size the retention to the run.
      .config("spark.sql.streaming.numRecentProgressUpdates",
        math.max(256, slices * 2 + 16).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.Confs.applyExtraConf(spark)
    val tally = new ScaleProbe.SpillTally // shared dev listener (round-17 review)
    spark.sparkContext.addSparkListener(tally)

    val (_, kDir) = ScaleProbe.buildCorpus(spark, base, k, scratch)
    val streamDir = s"$scratch/stream_x${k}_s${slices}_sp$sparseDims"
    if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(f"$streamDir/slice_$slices%04d.parquet")))
      prepareStream(spark, kDir, streamDir, slices, sparseDims)
    else System.err.println(s"[streamasof] reusing $streamDir")

    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "ts timestamp, user_id bigint, event_id bigint, is_dim boolean, event_type string")
    // bit_xor, not sum: xxhash64 spans the full Long range and an ANSI-mode
    // sum overflows; xor is order-insensitive and never overflows (row
    // duplication would cancel in the xor but is caught by the count)
    def checksum(df: DataFrame): (Long, Long) =
      df.where(col("user_id") =!= MoverUser)
        .agg(count(lit(1)),
             coalesce(bit_xor(xxhash64(col("event_id"),
               coalesce(col("last_purchase_id"), lit(-1L)))), lit(0L)))
        .as[(Long, Long)].head()

    // batch-twin exact as-of over the SAME stream input = the reference;
    // the checksum action runs INSIDE the scoped provider bootstrap (the
    // same scope the batch registrations use)
    val batchDs = spark.read.schema(schema).parquet(streamDir).as[AsofStreamRow]
    val t0 = System.nanoTime()
    val ref = Streams.scopedBatchTws(spark) {
      checksum(Streams.latestPurchaseAsofBuffered(batchDs))
    }
    println(f"[streamasof] reference batch twin: rows=${ref._1} " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1fs")

    def mk(name: String, ds: Dataset[AsofStreamRow]): DataFrame = name match {
      case "state_single" => Streams.latestPurchaseAsof(ds)
      case "state_epoch" => EpochAsof.latestPurchaseAsofEpoch(ds, widthSec,
        streaming = true)
      case "buf_single" => Streams.latestPurchaseAsofBuffered(
        ds.withWatermark("ts", wmDelay), streaming = true)
      case "buf_epoch" => EpochAsof.latestPurchaseAsofBufferedEpoch(
        ds.withWatermark("ts", wmDelay), widthSec)
    }

    val rows = configs.map { name =>
      val outDir = s"$scratch/saout_$name"
      val ckpt = s"$scratch/sackpt_$name"
      Seq(outDir, ckpt).foreach(d => Util.deleteRecursively(new java.io.File(d)))
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(streamDir).as[AsofStreamRow]
      tally.reset()
      val t1 = System.nanoTime()
      val q = mk(name, src).writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
      q.processAllAvailable()
      val wall = (System.nanoTime() - t1) / 1e9
      // state size: max over retained progress events, summed across the
      // chained operators of one batch
      val stateRows = q.recentProgress.map(_.stateOperators.map(_.numRowsTotal).sum)
        .foldLeft(0L)(math.max)
      val stateMem = q.recentProgress.map(_.stateOperators.map(_.memoryUsedBytes).sum)
        .foldLeft(0L)(math.max)
      val batches = q.recentProgress.length
      q.stop()
      // snapshot BEFORE the checksum job: its parquet scan + hash agg would
      // otherwise fold into the streaming query's task metrics (round-17
      // review — the verifier could dominate peakTask on light configs)
      val peakMb = tally.peak.get / 1e6
      val spillMb = tally.disk.get / 1e6
      val got = checksum(spark.read.parquet(outDir))
      val ok = got == ref
      println(f"[streamasof] $name%-13s wall=$wall%7.1fs batches=$batches%3d " +
        f"stateRows=$stateRows%9d stateMem=${stateMem / 1e6}%8.1fMB " +
        f"peakTask=$peakMb%6.1fMB spill=$spillMb%6.0fMB " +
        f"rows=${got._1} equal=$ok")
      if (!ok) System.err.println(
        s"[streamasof] $name OUTPUT MISMATCH: got=$got ref=$ref")
      (name, wall, ok)
    }
    println(s"\n== StreamAsofProbe k=$k width=${widthSec}s slices=$slices " +
      s"sparseDims=$sparseDims base=$base ==")
    rows.foreach { case (n, w, ok) => println(f"$n%-13s $w%8.1f s  equal=$ok") }
    spark.stop()
  }
}
