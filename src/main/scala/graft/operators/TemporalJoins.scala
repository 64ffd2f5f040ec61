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
  }

  val joinAsofSql: String =
    """SELECT c.event_id, c.user_id, c.ts, v.event_id AS view_id
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON c.user_id = v.user_id AND c.ts >= v.ts
      |ORDER BY c.event_id""".stripMargin

  /** As-of with a max-staleness tolerance: the latest view still counts
    * only within 1 hour of the click; older matches null out (LEFT
    * semantics preserved). Same single union-tag window pass as
    * [[joinAsof]] — the window additionally carries the matched view's
    * timestamp forward, and the tolerance applies as one map-side
    * conditional afterward. Because the as-of match is the LATEST
    * candidate, post-filtering it equals "latest within the window" —
    * no second window, no range join, same 100 TB shape. */
  val joinAsofTolerance: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"),
              lit(0).as("is_click"),
              col("event_id").as("view_id"),
              lit(null).cast("long").as("event_id"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
              lit(1).as("is_click"),
              lit(null).cast("long").as("view_id"),
              col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_click"),
               coalesce(col("view_id"), lit(Long.MaxValue)))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.unionByName(clicks)
      .withColumn("matched_view", last(col("view_id"), ignoreNulls = true).over(w))
      .withColumn("matched_ts",
        last(when(col("is_click") === 0, col("ts")), ignoreNulls = true).over(w))
      .where(col("is_click") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        when(unix_micros(col("ts")) - unix_micros(col("matched_ts")) <= 3600L * 1000000L,
             col("matched_view")).as("view_id"))
  }

  val joinAsofToleranceSql: String =
    """SELECT c.event_id, c.user_id, c.ts,
      |  CASE WHEN c.ts - v.ts <= INTERVAL '1 hour' THEN v.event_id END AS view_id
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON c.user_id = v.user_id AND c.ts >= v.ts
      |ORDER BY c.event_id""".stripMargin

  /** [[joinAsof]] re-planned through the custom merge-as-of operator
    * (SURVEY §4.3 option (b), added round 11): logical
    * [[graft.plans.AsofJoin]] node → [[graft.plans.AsofJoinStrategy]]
    * (via `spark.experimental.extraStrategies`, the public planner
    * extension point) → [[graft.plans.MergeAsofExec]], a streaming
    * two-pointer merge whose per-partition state beyond the sort is ONE
    * buffered right row. Same DuckDB ASOF oracle and output columns as
    * `join_asof`, so the driver hash-verifies the custom exec end to end;
    * AsofJoinSpec additionally pins row-for-row equality with the window
    * rewrite and the planned shape (MergeAsofExec + two sort exchanges,
    * no window, no range join). */
  val joinAsofMerge: Q = (s, d) => {
    graft.plans.AsofJoinStrategy.register(s)
    val ev = Tables.events(s, d)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    // fresh aliases on EVERY right column: both sides scan the same events
    // relation, and a custom binary node gets no analyzer self-join dedup,
    // so the right side must carry its own attribute ids
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts").as("v_ts"),
              col("event_id").as("view_id"))
    val lp = org.apache.spark.sql.graft.GraftSql.analyzed(clicks)
    val rp = org.apache.spark.sql.graft.GraftSql.analyzed(views)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             n: String) = p.output.find(_.name == n).get
    org.apache.spark.sql.graft.GraftSql.ofRows(s,
        graft.plans.AsofJoin(lp, rp,
          attr(lp, "user_id"), attr(rp, "v_user_id"),
          attr(lp, "ts"), attr(rp, "v_ts"), toleranceUs = None))
      .select(col("event_id"), col("user_id"), col("ts"), col("view_id"))
  }

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

  /** Big-big interval join, the bucketed scale path: both sides map to
    * 6-hour epoch buckets (an interval explodes into every bucket it
    * overlaps), the join runs as an EQUI-join on (user, bucket), and the
    * true range predicate applies as a residual. No broadcast, no nested
    * loop — two shuffles on a composite key, which is the only shape that
    * survives when neither side fits in memory. The oracle is the plain
    * range join, so the rewrite is proven semantics-preserving. */
  val joinIntervalBucketed: Q = (s, d) => {
    val bucketSecs = 21600L // 6h
    val baseEpoch = 1704067200L // 2024-01-01 00:00:00 UTC
    val ev = Tables.events(s, d)
    // synthetic per-user weekly maintenance windows: [base + 7d*k + (u%24)h, +6h)
    val intervals = ev.select(col("user_id")).distinct()
      .crossJoin(spark_range(s, 5).select(col("id").as("k")))
      .select(col("user_id"), col("k"),
        (lit(baseEpoch) + col("k") * 604800L + pmod(col("user_id"), lit(24)) * 3600L)
          .as("s_epoch"))
      .select(col("user_id"), col("k"), col("s_epoch"),
              (col("s_epoch") + bucketSecs).as("e_epoch"))
    val ivBuckets = intervals
      .select(col("user_id"), col("k"), col("s_epoch"), col("e_epoch"),
        explode(sequence(floor(col("s_epoch") / bucketSecs).cast("long"),
                         floor((col("e_epoch") - 1) / bucketSecs).cast("long")))
          .as("bucket"))
    val evB = ev.select(col("user_id").as("e_user"), col("ts"),
        unix_timestamp(col("ts")).as("ts_epoch"))
      .withColumn("bucket", floor(col("ts_epoch") / bucketSecs).cast("long"))
    evB.join(ivBuckets,
             col("e_user") === col("user_id") && evB("bucket") === ivBuckets("bucket"))
      .where(col("ts") >= timestamp_seconds(col("s_epoch")) &&
             col("ts") < timestamp_seconds(col("e_epoch")))
      .groupBy("user_id", "k")
      .agg(count(lit(1)).as("cnt"))
  }

  private def spark_range(s: SparkSession, n: Int) = s.range(n).toDF()

  val joinIntervalBucketedSql: String =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |iv AS (
      |  SELECT user_id, k,
      |    TIMESTAMP '1970-01-01' + to_seconds(1704067200 + k * 604800 + (user_id % 24) * 3600) AS s,
      |    TIMESTAMP '1970-01-01' + to_seconds(1704067200 + k * 604800 + (user_id % 24) * 3600 + 21600) AS e
      |  FROM u, unnest(generate_series(0, 4)) AS g(k))
      |SELECT iv.user_id, k, count(*) AS cnt
      |FROM events ev JOIN iv ON ev.user_id = iv.user_id AND ev.ts >= iv.s AND ev.ts < iv.e
      |GROUP BY iv.user_id, k
      |ORDER BY iv.user_id, k""".stripMargin

  val queries: Map[String, Q] = Map(
    "join_asof" -> joinAsof,
    "join_asof_merge" -> joinAsofMerge,
    "join_asof_tolerance" -> joinAsofTolerance,
    "join_interval" -> joinInterval,
    "join_interval_bucketed" -> joinIntervalBucketed,
  )

  val oracle: Map[String, String] = Map(
    "join_asof" -> joinAsofSql,
    "join_asof_merge" -> joinAsofSql,
    "join_asof_tolerance" -> joinAsofToleranceSql,
    "join_interval" -> joinIntervalSql,
    "join_interval_bucketed" -> joinIntervalBucketedSql,
  )

  /** Registered SORT-FREE (round 15, tranche 3): as-of/interval outputs are
    * keyed enrichments — the trailing ORDER BY was comparator-only. Keys
    * unique: event_id per click; week per bucket; (user_id, k) per
    * interval. Verify applies these; each equals its oracle's trailing
    * ORDER BY (the spec compares on the unqualified column name, so the
    * oracle's `c.event_id` matches `event_id`). */
  val dumpSort: Map[String, Seq[String]] = Map(
    "join_asof" -> Seq("event_id"),
    "join_asof_tolerance" -> Seq("event_id"),
    "join_asof_merge" -> Seq("event_id"),
    "join_interval" -> Seq("week"),
    "join_interval_bucketed" -> Seq("user_id", "k"),
  )
}
