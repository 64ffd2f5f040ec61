package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named readers for the driver-generated fixtures (TESTDATA.md).
  *
  * All tables are parquet with embedded schemas; `spark.read.parquet` gives
  * vectorized scans with projection + predicate pushdown for free. At 100 TB
  * these reads split by `spark.sql.files.maxPartitionBytes` into per-file-range
  * tasks — no custom source machinery is needed (SURVEY.md §1.1, §2.1).
  *
  * Reference provenance: the reference's entire storage surface is the Hadoop
  * `FileSystem` API (/root/reference/README.md:4 — public Hadoop release);
  * Spark reads through the very same `FileSystem` stack, so `hdfs://` paths
  * work unchanged on a real cluster.
  */
object Tables {
  /** Resolved-scan memo: `spark.read.parquet` runs a footer/schema-inference
    * Spark job and a file listing on EVERY call — pure fixed overhead that a
    * production catalog (schema + file index known) never pays per query.
    * Re-invoking an operator (every bench pass, every Verify query) re-loaded
    * the same immutable fixture dir and re-paid ~100-300 ms per table; the
    * memo resolves each (session, path) once per JVM and reuses the analyzed
    * relation, which is exactly what a metastore table reference does.
    *
    * ASSUMPTION (same one [[graft.llm.TextAnalysis]]'s vocabFits memo makes):
    * a fixture dir is IMMUTABLE once first read in a JVM — true for the
    * driver-generated test dirs and the append-only snapshot layout a 100 TB
    * corpus uses. Paths that are rewritten in-JVM (sink scratch dirs) go
    * through `spark.read` directly, not this memo; ScaleProbe's scaled copies
    * are written before their first load. Escape hatch:
    * `spark.graft.tables.memoizePlans=false` re-resolves on every call.
    * Keys hold the session strongly; entry count is #dirs × #tables (tiny),
    * and the sessions these mains build live for the whole JVM. */
  private val planMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val memoize =
      spark.conf.get("spark.graft.tables.memoizePlans", "true").toBoolean
    if (!memoize) spark.read.parquet(path)
    else {
      // resolution runs a Spark job — keep it OUTSIDE the map's bin lock
      // (round-8 VERDICT #3 on the vocabFits memo); first answer wins a race
      val k = (spark, path)
      planMemo.get(k) match {
        case null =>
          val df = spark.read.parquet(path)
          val prev = planMemo.putIfAbsent(k, df)
          if (prev == null) df else prev
        case cached => cached
      }
    }
  }

  /** Memoized fixture row count (round-12 advisor): index/bucket sizing
    * (`AnnIvf.nlistFor`, `AnnLsh.planesFor`, `Similarity.vectorBlocksFor`,
    * `Dedup.simhash`) reads a table count on EVERY operator invocation —
    * cheap per call (parquet footer metadata), but repeated across queries
    * in one session for a dataset that is immutable by the same contract
    * [[load]]'s plan memo relies on. One count job per (session, path),
    * under the same `spark.graft.tables.memoizePlans` escape hatch. */
  private val countMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), java.lang.Long]()

  def countOf(spark: SparkSession, dir: String, name: String): Long = {
    val memoize =
      spark.conf.get("spark.graft.tables.memoizePlans", "true").toBoolean
    if (!memoize) load(spark, dir, name).count()
    else {
      val k = (spark, s"$dir/$name.parquet")
      countMemo.get(k) match {
        case null => // count OUTSIDE the bin lock (it runs a Spark job)
          val n = java.lang.Long.valueOf(load(spark, dir, name).count())
          val prev = countMemo.putIfAbsent(k, n)
          (if (prev == null) n else prev).longValue()
        case cached => cached.longValue()
      }
    }
  }

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every fixture as a temp view named like the table, so SQL-based
    * operators can share one query text with the DuckDB oracle. */
  def registerViews(s: SparkSession, d: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(s, d) else load(s, d, n)
      df.createOrReplaceTempView(n)
    }

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has shipped under several physical parquet encodings across
    * fixture generations (TIMESTAMP(NANOS) → int64 via the nanosAsLong escape
    * hatch; plain timestamp[us] with no UTC flag → TIMESTAMP_NTZ; µs with the
    * UTC flag → TIMESTAMP). Adapt on the observed schema instead of assuming
    * one encoding, and normalize every variant to session-TZ TimestampType
    * holding the same µs instants DuckDB reads from the same file (session TZ
    * is UTC on both engines, so values are identical either way). Unknown
    * encodings fail loudly here rather than as 43 downstream analysis errors. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts fixture drifted to unsupported type $other; " +
        "expected int64 nanos, TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  /** NOT blanket-scattered (cf. [[Caching.scatterIfNarrow]]): a global
    * pre-scatter was A/B'd and REJECTED — it helps only consumers whose
    * per-row compute dominates (the int8 quantized scan applies it
    * locally), while the block-collect kernels pay an extra exchange of
    * full embedding arrays for nothing (simsearch_topk 0.29→0.46,
    * neardup_embedding 0.29→0.57 same-window). */
  def embeddings(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings")
}
