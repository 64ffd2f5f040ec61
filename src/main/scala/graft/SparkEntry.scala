package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Aggregates, Behavioral, DataQuality, Relational, ScaleTechniques, SetOps, SqlSurface, TemporalJoins, Windows}
import graft.functions.{Classics, Scalar, TypedUdaf}
import graft.llm.{AnnIvf, AnnLsh, AnnQuantized, Clustering, Curation, Dedup, Quantize, Similarity, Sketches, TextAnalysis}
import graft.multimodal.Multimodal
import graft.sources.{FsOps, Sources}
import graft.streaming.Streams

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query maps. Every SQL-expressible operator has a
  * matching DuckDB oracle in [[oracleSql]]; unit-only operators (approx
  * aggregates, format round-trips, streaming semantics) are registered in
  * [[queries]] alone and verified in ScalaTest.
  */
object SparkEntry {
  import Dsl._

  /** Flagship (TPC-H Q3 shape): scan+pushdown, broadcast dim join, shuffled
    * fact join, partial+final agg, top-k sort — one query per P1 subsystem.
    * Driver smoke-checks rows>0 on sf0.001.
    */
  val flagship: (SparkSession, String) => DataFrame = (s, d) => {
    val cust = Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d)
      .where(col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
    val li = Tables.lineitem(s, d)
      .where(col("l_shipdate") > lit("1998-07-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(discPriceSum.as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val flagshipSql: String =
    s"""SELECT l_orderkey, o_orderdate, $discPriceSumSql AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-07-01'
       |  AND l_shipdate > TIMESTAMP '1998-07-01'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin

  def entry(spark: SparkSession): DataFrame =
    flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++
    Aggregates.queries ++
    Windows.queries ++
    SetOps.queries ++
    Scalar.queries ++
    Classics.queries ++
    TypedUdaf.queries ++
    TemporalJoins.queries ++
    Streams.queries ++
    Sources.queries ++
    FsOps.queries ++
    Dedup.queries ++
    Curation.queries ++
    Similarity.queries ++
    TextAnalysis.queries ++
    AnnLsh.queries ++
    AnnIvf.queries ++
    AnnQuantized.queries ++
    Clustering.queries ++
    Sketches.queries ++
    Multimodal.queries ++
    ScaleTechniques.queries ++
    SqlSurface.queries ++
    Quantize.queries ++
    Behavioral.queries ++
    DataQuality.queries ++
    Map("flagship" -> flagship)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++
    Aggregates.oracle ++
    Windows.oracle ++
    SetOps.oracle ++
    Scalar.oracle ++
    Classics.oracle ++
    TypedUdaf.oracle ++
    TemporalJoins.oracle ++
    Streams.oracle ++
    Sources.oracle ++
    FsOps.oracle ++
    Dedup.oracle ++
    Curation.oracle ++
    Similarity.oracle ++
    TextAnalysis.oracle ++
    ScaleTechniques.oracle ++
    SqlSurface.oracle ++
    Quantize.oracle ++
    Behavioral.oracle ++
    DataQuality.oracle ++
    AnnQuantized.oracle ++
    Clustering.oracle ++
    Sketches.oracle ++
    Multimodal.oracle ++
    Map("flagship" -> flagshipSql)

  /** Comparator-side dump order (round-12 verdict #1a): queries listed here
    * are registered WITHOUT their deterministic-compare global sort — the
    * sort is harness scaffolding for the hash compare, not operator
    * semantics — and graft.Verify applies this ORDER BY to the dump
    * instead, matching the oracle SQL's ORDER BY exactly. The benchmark
    * then times the operator, not the comparator. */
  def dumpSort: Map[String, Seq[String]] = Map(
    "project_select" -> Relational.projectSelectDumpSort,
    "scan_parquet" -> Relational.scanParquetDumpSort,
    "join_inner_hash" -> Relational.joinInnerHashDumpSort,
    "join_broadcast" -> Relational.joinBroadcastDumpSort) ++
    Windows.dumpSort ++
    Scalar.dumpSort ++
    Streams.dumpSort ++
    SetOps.dumpSort ++
    Behavioral.dumpSort ++
    Classics.dumpSort ++
    Sources.dumpSort ++
    Multimodal.dumpSort ++
    Curation.dumpSort ++
    TextAnalysis.dumpSort ++
    Aggregates.dumpSort ++
    Relational.dumpSort ++
    ScaleTechniques.dumpSort ++
    TemporalJoins.dumpSort ++
    DataQuality.dumpSort ++
    Dedup.dumpSort ++
    Similarity.dumpSort ++
    Clustering.dumpSort ++
    Quantize.dumpSort ++
    AnnQuantized.dumpSort ++
    TypedUdaf.dumpSort ++
    FsOps.dumpSort
}
