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
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
