package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality operators (SURVEY.md §2.14): column profiling and
  * declarative constraint validation — the Deequ/Great-Expectations
  * capability every warehouse runs before trusting a table, and a
  * training-data pipeline runs before ingesting a crawl drop.
  *
  * Reference provenance: on a Hadoop stack these are ad-hoc MR counters
  * over the table files (/root/reference/README.md:4); here each is a
  * declarative aggregation so Catalyst fuses the checks into as few scans
  * as the dependency structure allows.
  */
object DataQuality {
  type Q = (SparkSession, String) => DataFrame

  /** Column profile of `orders`: per column — row count, null count, exact
    * distinct count, and min/max (numeric columns as exact doubles,
    * timestamps as epoch microseconds, strings as strings).
    *
    * Plan shape: the non-distinct battery (counts/min/max for all columns)
    * fuses into ONE scan+aggregate, and each exact distinct count runs as
    * its OWN single-distinct aggregate branch cross-joined on (1-row each).
    * What the per-column split actually buys (round-10 advisor refined
    * this): the fused multi-distinct spelling plans an Expand that
    * MATERIALIZES rows×columns intermediate rows, but its partial
    * aggregate still dedupes map-side — so SHUFFLE volume is ~Σ per-column
    * distinct values under either plan, and the measured win (3 s →
    * sub-second at sf0.1) is map-side Expand CPU, not network. The price
    * is N one-column scans instead of one N-column scan — at 60 MB free
    * (page cache, columnar pruning), at 100 TB a real I/O multiplier.
    * That trade flips the 100 TB default to [[dqProfileApprox]] below:
    * HLL sketches have no Expand AND fuse every distinct estimate back
    * into the single base pass — one scan total. The exact per-column
    * form stays the verifiable spec at oracle scale.
    */
  val dqProfile: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val base = o.agg(
      count(lit(1)).as("n"),
      count(col("o_orderkey")).as("nn_key"),
      min(col("o_orderkey")).cast("double").as("mn_key"), max(col("o_orderkey")).cast("double").as("mx_key"),
      count(col("o_custkey")).as("nn_cust"),
      min(col("o_custkey")).cast("double").as("mn_cust"), max(col("o_custkey")).cast("double").as("mx_cust"),
      count(col("o_totalprice")).as("nn_price"),
      min(col("o_totalprice")).as("mn_price"), max(col("o_totalprice")).as("mx_price"),
      count(col("o_orderdate")).as("nn_date"),
      // o_orderdate reads as TIMESTAMP_NTZ on current fixtures; the UTC
      // session cast makes it the same µs instants DuckDB's epoch_us sees
      min(unix_micros(col("o_orderdate").cast("timestamp"))).cast("double").as("mn_date"),
      max(unix_micros(col("o_orderdate").cast("timestamp"))).cast("double").as("mx_date"),
      count(col("o_orderstatus")).as("nn_status"),
      min(col("o_orderstatus")).as("mn_status"), max(col("o_orderstatus")).as("mx_status"),
      count(col("o_orderpriority")).as("nn_prio"),
      min(col("o_orderpriority")).as("mn_prio"), max(col("o_orderpriority")).as("mx_prio"))
    val agg = Seq(
      "o_orderkey" -> "nd_key", "o_custkey" -> "nd_cust",
      "o_totalprice" -> "nd_price", "o_orderdate" -> "nd_date",
      "o_orderstatus" -> "nd_status", "o_orderpriority" -> "nd_prio")
      .foldLeft(base) { case (acc, (c, alias)) =>
        acc.crossJoin(o.agg(countDistinct(col(c)).as(alias)))
      }
    def num(name: String, nn: String, nd: String, mn: String, mx: String) =
      struct(lit(name).as("column"), col("n").as("n"),
        (col("n") - col(nn)).as("n_null"), col(nd).as("n_distinct"),
        col(mn).as("min_num"), col(mx).as("max_num"),
        lit(null).cast("string").as("min_str"), lit(null).cast("string").as("max_str"))
    def str(name: String, nn: String, nd: String, mn: String, mx: String) =
      struct(lit(name).as("column"), col("n").as("n"),
        (col("n") - col(nn)).as("n_null"), col(nd).as("n_distinct"),
        lit(null).cast("double").as("min_num"), lit(null).cast("double").as("max_num"),
        col(mn).as("min_str"), col(mx).as("max_str"))
    agg.select(explode(array(
        num("o_orderkey", "nn_key", "nd_key", "mn_key", "mx_key"),
        num("o_custkey", "nn_cust", "nd_cust", "mn_cust", "mx_cust"),
        num("o_orderdate", "nn_date", "nd_date", "mn_date", "mx_date"),
        num("o_totalprice", "nn_price", "nd_price", "mn_price", "mx_price"),
        str("o_orderpriority", "nn_prio", "nd_prio", "mn_prio", "mx_prio"),
        str("o_orderstatus", "nn_status", "nd_status", "mn_status", "mx_status")
      )).as("p"))
      .select("p.*")
      .orderBy("column")
  }

  val dqProfileSql: String =
    """WITH a AS (
      |  SELECT count(*) AS n,
      |    count(o_orderkey) AS nn_key, count(DISTINCT o_orderkey) AS nd_key,
      |    cast(min(o_orderkey) as double) AS mn_key, cast(max(o_orderkey) as double) AS mx_key,
      |    count(o_custkey) AS nn_cust, count(DISTINCT o_custkey) AS nd_cust,
      |    cast(min(o_custkey) as double) AS mn_cust, cast(max(o_custkey) as double) AS mx_cust,
      |    count(o_totalprice) AS nn_price, count(DISTINCT o_totalprice) AS nd_price,
      |    min(o_totalprice) AS mn_price, max(o_totalprice) AS mx_price,
      |    count(o_orderdate) AS nn_date, count(DISTINCT o_orderdate) AS nd_date,
      |    cast(epoch_us(min(o_orderdate)) as double) AS mn_date,
      |    cast(epoch_us(max(o_orderdate)) as double) AS mx_date,
      |    count(o_orderstatus) AS nn_status, count(DISTINCT o_orderstatus) AS nd_status,
      |    min(o_orderstatus) AS mn_status, max(o_orderstatus) AS mx_status,
      |    count(o_orderpriority) AS nn_prio, count(DISTINCT o_orderpriority) AS nd_prio,
      |    min(o_orderpriority) AS mn_prio, max(o_orderpriority) AS mx_prio
      |  FROM orders)
      |SELECT 'o_orderkey' AS "column", n, n - nn_key AS n_null, nd_key AS n_distinct,
      |  mn_key AS min_num, mx_key AS max_num,
      |  cast(NULL as varchar) AS min_str, cast(NULL as varchar) AS max_str FROM a
      |UNION ALL SELECT 'o_custkey', n, n - nn_cust, nd_cust, mn_cust, mx_cust, NULL, NULL FROM a
      |UNION ALL SELECT 'o_orderdate', n, n - nn_date, nd_date, mn_date, mx_date, NULL, NULL FROM a
      |UNION ALL SELECT 'o_totalprice', n, n - nn_price, nd_price, mn_price, mx_price, NULL, NULL FROM a
      |UNION ALL SELECT 'o_orderpriority', n, n - nn_prio, nd_prio,
      |  cast(NULL as double), cast(NULL as double), mn_prio, mx_prio FROM a
      |UNION ALL SELECT 'o_orderstatus', n, n - nn_status, nd_status,
      |  cast(NULL as double), cast(NULL as double), mn_status, mx_status FROM a
      |ORDER BY "column"""".stripMargin

  /** The 100 TB spelling of [[dqProfile]] the doc comment above promises:
    * identical profile shape, but every distinct count is an
    * `approx_count_distinct` (HyperLogLog++ at rsd 0.02: the default 0.05
    * is a standard DEVIATION, not a bound — it measured 7.3% off on a
    * 1.5k-distinct column — while 0.01 costs more than precision: Spark
    * stores each HLL WORD as a separate aggregation-buffer attribute, so
    * rsd 0.01 (p=14, 2731 words) × 6 sketches meant a 16k-column buffer
    * row that broke codegen and ran 4.7 s at sf0.1; rsd 0.02 (p=12, 683
    * words) keeps the promised 5% contract at ~3σ with a 4k-attribute
    * buffer and sub-second runtime) fused into
    * the SAME single scan+aggregate as the count/min/max battery — one
    * pass over the table, no Expand, no per-column re-scans; sketch state
    * is a few KB per column regardless of data size, and the sketches
    * merge associatively across partitions (partial+final, map-side
    * combine). Not DuckDB-oracled (approx result, engine-specific sketch)
    * — unit-verified like `agg_approx_distinct`: every estimate within 5%
    * relative error of the exact per-column distincts, exact-equal
    * low-cardinality columns, plus exactness of the fused n/null/min/max
    * columns against [[dqProfile]] (DataQualitySpec). */
  private val ApproxRsd = 0.02

  val dqProfileApprox: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val agg = o.agg(
      count(lit(1)).as("n"),
      count(col("o_orderkey")).as("nn_key"),
      approx_count_distinct(col("o_orderkey"), ApproxRsd).as("nd_key"),
      min(col("o_orderkey")).cast("double").as("mn_key"), max(col("o_orderkey")).cast("double").as("mx_key"),
      count(col("o_custkey")).as("nn_cust"),
      approx_count_distinct(col("o_custkey"), ApproxRsd).as("nd_cust"),
      min(col("o_custkey")).cast("double").as("mn_cust"), max(col("o_custkey")).cast("double").as("mx_cust"),
      count(col("o_totalprice")).as("nn_price"),
      approx_count_distinct(col("o_totalprice"), ApproxRsd).as("nd_price"),
      min(col("o_totalprice")).as("mn_price"), max(col("o_totalprice")).as("mx_price"),
      count(col("o_orderdate")).as("nn_date"),
      approx_count_distinct(col("o_orderdate"), ApproxRsd).as("nd_date"),
      min(unix_micros(col("o_orderdate").cast("timestamp"))).cast("double").as("mn_date"),
      max(unix_micros(col("o_orderdate").cast("timestamp"))).cast("double").as("mx_date"),
      count(col("o_orderstatus")).as("nn_status"),
      approx_count_distinct(col("o_orderstatus"), ApproxRsd).as("nd_status"),
      min(col("o_orderstatus")).as("mn_status"), max(col("o_orderstatus")).as("mx_status"),
      count(col("o_orderpriority")).as("nn_prio"),
      approx_count_distinct(col("o_orderpriority"), ApproxRsd).as("nd_prio"),
      min(col("o_orderpriority")).as("mn_prio"), max(col("o_orderpriority")).as("mx_prio"))
    def num(name: String, nn: String, nd: String, mn: String, mx: String) =
      struct(lit(name).as("column"), col("n").as("n"),
        (col("n") - col(nn)).as("n_null"), col(nd).as("n_distinct"),
        col(mn).as("min_num"), col(mx).as("max_num"),
        lit(null).cast("string").as("min_str"), lit(null).cast("string").as("max_str"))
    def str(name: String, nn: String, nd: String, mn: String, mx: String) =
      struct(lit(name).as("column"), col("n").as("n"),
        (col("n") - col(nn)).as("n_null"), col(nd).as("n_distinct"),
        lit(null).cast("double").as("min_num"), lit(null).cast("double").as("max_num"),
        col(mn).as("min_str"), col(mx).as("max_str"))
    agg.select(explode(array(
        num("o_orderkey", "nn_key", "nd_key", "mn_key", "mx_key"),
        num("o_custkey", "nn_cust", "nd_cust", "mn_cust", "mx_cust"),
        num("o_orderdate", "nn_date", "nd_date", "mn_date", "mx_date"),
        num("o_totalprice", "nn_price", "nd_price", "mn_price", "mx_price"),
        str("o_orderpriority", "nn_prio", "nd_prio", "mn_prio", "mx_prio"),
        str("o_orderstatus", "nn_status", "nd_status", "mn_status", "mx_status")
      )).as("p"))
      .select("p.*")
      .orderBy("column")
  }

  /** Declarative constraint battery: key uniqueness, referential
    * integrity, range and null checks — one row per check with its exact
    * violation count and pass verdict. Checks against the same table fuse
    * into one aggregation pass (lineitem's uniqueness + range checks share
    * a scan); the FK check is an anti join that the planner broadcasts
    * when the dimension side fits. At 100 TB every check keeps this shape:
    * per-table single passes plus one anti join per FK edge. */
  val dqConstraints: Q = (s, d) => {
    // countDistinct over bare columns DROPS any tuple containing a NULL,
    // while the DuckDB oracle's count(DISTINCT (row-tuple)) counts it; a
    // struct is non-null even when its fields are null, so counting
    // distinct STRUCTS gives both engines identical null semantics —
    // important inside a null-checking constraint battery.
    val li = Tables.lineitem(s, d).agg(
      (count(lit(1)) - countDistinct(struct(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey")))).as("pk_viol"),
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L))
        .as("qty_viol"))
    val ord = Tables.orders(s, d).agg(
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("price_viol"))
    val cust = Tables.customer(s, d).agg(
      sum(when(col("c_acctbal").isNull, 1L).otherwise(0L)).as("bal_viol"))
    val fk = Tables.orders(s, d).select("o_custkey")
      .join(Tables.customer(s, d).select("c_custkey"),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("fk_viol"))
    def row(df: DataFrame, name: String, c: String) =
      df.select(lit(name).as("check_name"), col(c).as("violations"),
        when(col(c) === 0, 1).otherwise(0).as("passed"))
    row(li, "lineitem_pk_unique", "pk_viol")
      .unionAll(row(li, "lineitem_qty_range", "qty_viol"))
      .unionAll(row(ord, "orders_totalprice_positive", "price_viol"))
      .unionAll(row(fk, "orders_custkey_fk", "fk_viol"))
      .unionAll(row(cust, "customer_acctbal_nonnull", "bal_viol"))
  }

  val dqConstraintsSql: String =
    """WITH li AS (
      |  SELECT count(*) - count(DISTINCT (l_orderkey, l_linenumber, l_partkey, l_suppkey)) AS pk_viol,
      |    sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS qty_viol
      |  FROM lineitem),
      |ord AS (
      |  SELECT sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS price_viol FROM orders),
      |cust AS (
      |  SELECT sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS bal_viol FROM customer),
      |fk AS (
      |  SELECT count(*) AS fk_viol FROM orders
      |  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
      |SELECT 'lineitem_pk_unique' AS check_name, cast(pk_viol as bigint) AS violations,
      |  CASE WHEN pk_viol = 0 THEN 1 ELSE 0 END AS passed FROM li
      |UNION ALL SELECT 'lineitem_qty_range', cast(qty_viol as bigint),
      |  CASE WHEN qty_viol = 0 THEN 1 ELSE 0 END FROM li
      |UNION ALL SELECT 'orders_totalprice_positive', cast(price_viol as bigint),
      |  CASE WHEN price_viol = 0 THEN 1 ELSE 0 END FROM ord
      |UNION ALL SELECT 'orders_custkey_fk', cast(fk_viol as bigint),
      |  CASE WHEN fk_viol = 0 THEN 1 ELSE 0 END FROM fk
      |UNION ALL SELECT 'customer_acctbal_nonnull', cast(bal_viol as bigint),
      |  CASE WHEN bal_viol = 0 THEN 1 ELSE 0 END FROM cust
      |ORDER BY check_name""".stripMargin

  val queries: Map[String, Q] = Map(
    "dq_profile" -> dqProfile,
    "dq_profile_approx" -> dqProfileApprox,
    "dq_constraints" -> dqConstraints)

  val oracle: Map[String, String] = Map(
    "dq_profile" -> dqProfileSql,
    "dq_constraints" -> dqConstraintsSql)

  /** Registered SORT-FREE (round 15, tranche 3): five named checks, unique
    * check_name key — the trailing ORDER BY was comparator-only. */
  val dumpSort: Map[String, Seq[String]] = Map(
    "dq_constraints" -> Seq("check_name"),
  )
}
