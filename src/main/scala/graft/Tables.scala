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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects by
    * default (Spark's TimestampType is microseconds). Read the raw int64
    * nanos via the nanosAsLong escape hatch and truncate to micros — exactly
    * what DuckDB does when it coerces TIMESTAMP_NS to its µs TIMESTAMP, so
    * both engines see identical values. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
