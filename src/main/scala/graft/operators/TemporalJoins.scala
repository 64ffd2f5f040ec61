package graft.operators

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.3 time-series joins Spark has no built-in for (SURVEY.md §4.3, §7.4).
  *
  * `join_asof` — each click matched to the latest view of the same user at or
  * before its timestamp. Spark rewrite: union-tag both sides, one window pass
  * per user ordered by time carrying `last(view_id, ignoreNulls)` forward,
  * keep the click rows. This is a single sort-partitioned exchange (SMJ-class
  * cost), NOT a range self-join — the shape that survives 100 TB. DuckDB
  * validates it against its native ASOF JOIN.
  *
  * `join_interval` — events against an interval table. The tiny side is
  * broadcast (BroadcastNestedLoopJoin on the range predicate); a big-big
  * interval join would instead bucket both sides to interval-aligned keys
  * and equi-join buckets + residual predicate.
  */
object TemporalJoins {
  type Q = (SparkSession, String) => DataFrame

  val joinAsof: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"),
              lit(0).as("is_click"),
              col("event_id").as("view_id"),
              lit(null).cast("long").as("event_id"),
              lit(null).cast("double").as("value"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
              lit(1).as("is_click"),
              lit(null).cast("long").as("view_id"),
              col("event_id"), col("value"))
    // At equal ts the view sorts first (is_click 0 < 1), matching ASOF's
    // inclusive `>=` bound; view_id breaks (impossible-here) exact ts ties.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_click"),
               coalesce(col("view_id"), lit(Long.MaxValue)))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.unionByName(clicks)
      .withColumn("matched_view", last(col("view_id"), ignoreNulls = true).over(w))
      .where(col("is_click") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
              col("matched_view").as("view_id"))
      .orderBy("event_id")
  }

  val joinAsofSql: String =
    """SELECT c.event_id, c.user_id, c.ts, v.event_id AS view_id
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON c.user_id = v.user_id AND c.ts >= v.ts
      |ORDER BY c.event_id""".stripMargin

  private val weekStarts: Seq[(String, LocalDate)] = {
    val origin = LocalDate.parse("2024-01-01")
    (0 until 5).map(k => (s"wk$k", origin.plusDays(7L * k)))
  }

  val joinInterval: Q = (s, d) => {
    import s.implicits._
    val weeks = weekStarts
      .map { case (w, start) => (w, start.toString, start.plusDays(7).toString) }
      .toDF("week", "w_start_s", "w_end_s")
      .select(col("week"), col("w_start_s").cast("timestamp").as("w_start"),
              col("w_end_s").cast("timestamp").as("w_end"))
    Tables.events(s, d)
      .join(broadcast(weeks),
            col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .groupBy("week", "w_start")
      .agg(count(lit(1)).as("cnt"),
           sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .orderBy("week")
  }

  val joinIntervalSql: String = {
    val values = weekStarts.map { case (w, start) =>
      s"('$w', TIMESTAMP '$start 00:00:00', TIMESTAMP '${start.plusDays(7)} 00:00:00')"
    }.mkString(", ")
    s"""SELECT week, w_start, count(*) AS cnt,
       |  cast(sum(cast(value as decimal(12,2))) as double) AS sum_value
       |FROM events
       |JOIN (VALUES $values) AS wk(week, w_start, w_end)
       |  ON ts >= w_start AND ts < w_end
       |GROUP BY week, w_start
       |ORDER BY week""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "join_asof" -> joinAsof,
    "join_interval" -> joinInterval,
  )

  val oracle: Map[String, String] = Map(
    "join_asof" -> joinAsofSql,
    "join_interval" -> joinIntervalSql,
  )
}
