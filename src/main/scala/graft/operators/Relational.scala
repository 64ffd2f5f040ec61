package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Dsl, Tables}

/** §2.2 projection/filter/predicates + §2.3 joins (SURVEY.md).
  *
  * Reference provenance: map-only filter/transform idioms and the
  * reduce-side / map-side join idioms of a public Hadoop release
  * (/root/reference/README.md:4). Re-expressed declaratively: Catalyst pushes
  * the filters into the parquet scan, prunes columns, and picks
  * broadcast-hash vs sort-merge join from sizes — the things a MapReduce
  * author hand-coded via DistributedCache / CompositeInputFormat.
  *
  * Scale notes (100 TB): every query here is pure narrow scan + (for joins)
  * a single key-partitioned exchange; small dimensions are broadcast
  * explicitly, big-big joins are left to sort-merge + AQE skew handling.
  */
object Relational {
  import Dsl._

  type Q = (SparkSession, String) => DataFrame

  // ---- §2.2 projection / filter ------------------------------------------

  /** Columnar scan with projection + predicate pushdown reaching parquet.
    * NOTE: lineitem's unique key in these fixtures is the full
    * (l_orderkey, l_linenumber, l_partkey, l_suppkey) — (okey, lineno) alone
    * has duplicates, so every row-level lineitem query orders by all four. */
  /** Registered SORT-FREE (round 14, same move as project_select round 13):
    * the pruned pushdown scan is a pure map task — no exchange at all; the
    * deterministic compare order lives in the Verify dump
    * ([[scanParquetDumpSort]]) and the oracle's ORDER BY, not the operator. */
  val scanParquet: Q = (s, d) =>
    Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
             col("l_shipdate") <  lit("1996-07-01").cast("timestamp") &&
             col("l_quantity") < 10)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
              "l_quantity", "l_shipdate")

  /** (l_orderkey, l_linenumber) is the lineitem PK — a total order. */
  val scanParquetDumpSort: Seq[String] =
    Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")

  val scanParquetSql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_shipdate
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
      |  AND l_quantity < 10
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin

  /** Map-only derived-column projection (disc price / charge, exact
    * scaled-long arithmetic divided once to double) WITH the
    * deterministic-compare global sort appended — kept for [[graft.AbBench]]'s
    * sort-vs-projection attribution and as the historical registered form. */
  val projectSelect: Q = (s, d) =>
    projectSelectNoSort(s, d)
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")

  /** The REGISTERED map-only projection (round-12 verdict #1a): the pure
    * operator a pipeline would run. The deterministic total order the
    * oracle hash compare needs is applied by the COMPARATOR side —
    * graft.Verify sorts the dump by [[projectSelectDumpSort]] before
    * writing, matching the oracle SQL's ORDER BY — instead of riding the
    * operator, where its range exchange re-executed the whole single-row-
    * group scan+derive for sampling and dominated the benchmark's largest
    * line (1.13 s of which ~0.8 s was the sort harness, not the operator). */
  val projectSelectNoSort: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
              col("l_partkey"), col("l_suppkey"),
              discPrice.as("disc_price"),
              charge.as("charge"))

  /** Comparator-side dump order for the sort-free registered form. */
  val projectSelectDumpSort: Seq[String] =
    Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")

  val projectSelectSql: String =
    s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |  $discPriceSql AS disc_price,
       |  $chargeSql AS charge
       |FROM lineitem
       |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin

  /** Compound predicate (TPC-H Q6 shape) → one exact revenue scalar. */
  val filterPredicate: Q = (s, d) =>
    Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
             col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
             col("l_discount").between(0.05, 0.07) &&
             col("l_quantity") < 24)
      .agg((sum(cents(col("l_extendedprice")) * cents(col("l_discount"))) / 10000.0).as("revenue"),
           count(lit(1)).as("n"))

  val filterPredicateSql: String =
    s"""SELECT
       |  cast(sum(${centsSql("l_extendedprice")} * ${centsSql("l_discount")}) as double) / 10000.0 AS revenue,
       |  count(*) AS n
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
       |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** Regex grep over the document corpus (Hadoop Grep example, map side). */
  val filterRegexGrep: Q = (s, d) =>
    Tables.documents(s, d)
      .where(col("text").rlike("hash\\s+join"))
      .select("doc_id", "lang")

  val filterRegexGrepSql: String =
    """SELECT doc_id, lang FROM documents
      |WHERE regexp_matches(text, 'hash\s+join')
      |ORDER BY doc_id""".stripMargin

  /** NULL semantics: IS NULL / null-safe equality on a derived nullable col. */
  val filterNullSemantics: Q = (s, d) =>
    Tables.customer(s, d)
      .select(col("c_custkey"),
              nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"))
      .select(col("c_custkey"), col("seg"),
              col("seg").isNull.as("seg_is_null"),
              (col("seg") <=> "MACHINERY").as("is_machinery"))

  val filterNullSemanticsSql: String =
    """SELECT c_custkey, seg, seg IS NULL AS seg_is_null,
      |       seg IS NOT DISTINCT FROM 'MACHINERY' AS is_machinery
      |FROM (SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg FROM customer)
      |ORDER BY c_custkey""".stripMargin

  // ---- §2.3 joins ---------------------------------------------------------

  /** Equi inner join (reduce-side join idiom) — row level. */
  /** Registered SORT-FREE (round 14): the shuffled equi join's output is
    * O(|orders|) and the trailing ORDER BY existed only for the hash
    * compare — it was a second full range exchange over the join output.
    * Compare order: [[joinInnerHashDumpSort]] + the oracle's ORDER BY. */
  val joinInnerHash: Q = (s, d) =>
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name", "c_mktsegment")

  /** o_orderkey is the orders PK — a total order. */
  val joinInnerHashDumpSort: Seq[String] = Seq("o_orderkey")

  val joinInnerHashSql: String =
    """SELECT o_orderkey, c_name, c_mktsegment
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin

  /** Map-side hash join (DistributedCache idiom): broadcast the dimension. */
  /** Registered SORT-FREE (round 14): a broadcast join is map-side — with
    * the comparator ORDER BY gone the whole query is exchange-FREE, which
    * is the point of broadcasting; the old trailing sort range-exchanged
    * ~30% of lineitem for the hash compare alone. Compare order:
    * [[joinBroadcastDumpSort]] + the oracle's ORDER BY. */
  val joinBroadcast: Q = (s, d) =>
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).where(col("p_size") < 15)),
            col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
              "p_brand", "p_size")

  /** (l_orderkey, l_linenumber) is the lineitem PK — a total order. */
  val joinBroadcastDumpSort: Seq[String] =
    Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")

  val joinBroadcastSql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, p_brand, p_size
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_size < 15
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin

  /** Co-sorted merge join (CompositeInputFormat idiom) — force SMJ via hint. */
  val joinSortMerge: Q = (s, d) =>
    Tables.lineitem(s, d).hint("merge")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("line_cnt"), moneySum(col("l_extendedprice")).as("sum_price"))

  val joinSortMergeSql: String =
    s"""SELECT o_orderpriority, count(*) AS line_cnt, ${moneySumSql("l_extendedprice")} AS sum_price
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  /** Left outer join: order count per customer including zero. */
  val joinLeftOuter: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("order_cnt"))

  val joinLeftOuterSql: String =
    """SELECT c_custkey, count(o_orderkey) AS order_cnt
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey
      |ORDER BY c_custkey""".stripMargin

  /** Full outer join with non-matching rows on both sides. */
  val joinFullOuter: Q = (s, d) => {
    val hiCust = Tables.customer(s, d).where(col("c_acctbal") > 9000)
      .select("c_custkey", "c_acctbal")
    val hiOrd = Tables.orders(s, d).where(col("o_totalprice") > 280000)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    hiCust.join(hiOrd, col("c_custkey") === col("o_custkey"), "full")
      .select(coalesce(col("c_custkey"), lit(-1)).as("ck"),
              coalesce(col("o_orderkey"), lit(-1)).as("ok"),
              col("c_acctbal"), col("o_totalprice"))
  }

  val joinFullOuterSql: String =
    """SELECT coalesce(c_custkey, -1) AS ck, coalesce(o_orderkey, -1) AS ok,
      |       c_acctbal, o_totalprice
      |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000) c
      |FULL JOIN (SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 280000) o
      |  ON c_custkey = o_custkey
      |ORDER BY ck, ok""".stripMargin

  /** Right outer: every big order kept, matching high-balance customer or
    * null — the mirror of left outer (Spark plans it as the flipped left
    * outer; registered so every ANSI join type runs by name). */
  val joinRightOuter: Q = (s, d) => {
    val hiCust = Tables.customer(s, d).where(col("c_acctbal") > 9000)
      .select("c_custkey", "c_acctbal")
    val hiOrd = Tables.orders(s, d).where(col("o_totalprice") > 280000)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    hiCust.join(hiOrd, col("c_custkey") === col("o_custkey"), "right")
      .select(coalesce(col("c_custkey"), lit(-1)).as("ck"),
              col("o_orderkey").as("ok"),
              col("c_acctbal"), col("o_totalprice"))
  }

  val joinRightOuterSql: String =
    """SELECT coalesce(c_custkey, -1) AS ck, o_orderkey AS ok,
      |       c_acctbal, o_totalprice
      |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000) c
      |RIGHT JOIN (SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 280000) o
      |  ON c_custkey = o_custkey
      |ORDER BY ck, ok""".stripMargin

  /** Semi join: customers having at least one big order (EXISTS). */
  val joinLeftSemi: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).where(col("o_totalprice") > 250000),
            col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")

  val joinLeftSemiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 250000)
      |ORDER BY c_custkey""".stripMargin

  /** Anti join: customers with no big order (NOT EXISTS, non-empty result). */
  val joinLeftAnti: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).where(col("o_totalprice") > 250000),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  val joinLeftAntiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 250000)
      |ORDER BY c_custkey""".stripMargin

  /** Bounded cartesian product. */
  val joinCross: Q = (s, d) =>
    Tables.region(s, d).crossJoin(Tables.nation(s, d))
      .select("r_name", "n_name")

  val joinCrossSql: String =
    """SELECT r_name, n_name FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin

  /** Theta/range join: price-band classification of parts.
    * At scale: the band table is tiny → BroadcastNestedLoopJoin, which is the
    * right plan; a big-big band join would instead bucket on floor(price/step)
    * and equi-join buckets + residual predicate (see joinInterval).
    */
  val joinThetaRange: Q = (s, d) => {
    import s.implicits._
    val bands = Seq(("low", 0.0, 700.0), ("mid", 700.0, 1400.0),
                    ("high", 1400.0, 100000.0))
      .toDF("band", "lo", "hi")
    Tables.part(s, d)
      .join(broadcast(bands),
            col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .select("p_partkey", "band", "p_retailprice")
  }

  val joinThetaRangeSql: String =
    """SELECT p_partkey, band, p_retailprice
      |FROM part JOIN (VALUES ('low', 0.0, 700.0), ('mid', 700.0, 1400.0),
      |                       ('high', 1400.0, 100000.0)) AS b(band, lo, hi)
      |  ON p_retailprice >= lo AND p_retailprice < hi
      |ORDER BY p_partkey, band""".stripMargin

  /** Six-table multiway join (TPC-H Q5 shape: local supplier volume) — the
    * end-to-end join-planning proof. region/nation broadcast, the colocation
    * predicate (customer's nation = supplier's nation) rides the fact join,
    * and revenue uses exact scaled-long sums. At 100 TB this is the shape where
    * Catalyst's join reorder + broadcast chain replaces the hand-sequenced
    * multi-stage MapReduce pipeline a Hadoop author would write. */
  val joinMultiway: Q = (s, d) => {
    // Dimension-first, filter-before-shuffle: the region→nation→supplier
    // chain collapses to one tiny broadcast of ASIA suppliers, which cuts
    // lineitem to the ~1/5 that can contribute BEFORE the fact shuffle —
    // at 100 TB this is the difference between shuffling the whole fact
    // table and shuffling the selectivity fraction. The one genuine
    // shuffle left is lineitem ⨝ (customer⨝orders) on l_orderkey; the
    // shuffle_hash hint skips the sort-merge sorts (both sides hash-build
    // fine, and neither is pre-sorted). The colocation predicate
    // (customer's nation = supplier's nation) rides that fact join.
    val asiaSupp = Tables.supplier(s, d)
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "ASIA")
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val li = Tables.lineitem(s, d)
      .join(broadcast(asiaSupp), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("s_nationkey"), col("n_name"),
              discPriceMicro.as("dp_micro"))
    val co = Tables.customer(s, d).hint("broadcast")
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .select(col("o_orderkey"), col("c_nationkey"))
    li.join(co.hint("shuffle_hash"),
            col("l_orderkey") === col("o_orderkey") &&
            col("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg((sum(col("dp_micro")) / 10000.0).as("revenue"),
           count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val joinMultiwaySql: String =
    s"""SELECT n_name, $discPriceSumSql AS revenue,
       |  count(*) AS n_lines
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  /** Null-safe equi join (`<=>` / IS NOT DISTINCT FROM): NULL keys match
    * each other instead of vanishing — the semantics MERGE/dedup pipelines
    * need when the join key is itself nullable. Keys are synthesized with
    * nullif (fixtures carry no NULLs), and the null-match rows prove the
    * behavior. Plans as an ordinary shuffled hash join: the null-safe
    * comparison is still an equi-key (EqualNullSafe), NOT a theta join —
    * NULL keys hash to one partition like any other value. */
  val joinNullSafe: Q = (s, d) => {
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"),
              nullif(col("c_nationkey") % 5, lit(0)).as("k"))
    val dim = Tables.nation(s, d).where(col("n_nationkey") < 5)
      .select(nullif(col("n_nationkey") % 5, lit(0)).as("k"),
              col("n_name"))
    cust.join(dim, cust("k") <=> dim("k"))
      .groupBy(dim("k").as("k"), col("n_name"))
      .agg(count(lit(1)).as("n"))
  }

  val joinNullSafeSql: String =
    """WITH cust AS (
      |  SELECT c_custkey, nullif(c_nationkey % 5, 0) AS k FROM customer),
      |dim AS (
      |  SELECT nullif(n_nationkey % 5, 0) AS k, n_name
      |  FROM nation WHERE n_nationkey < 5)
      |SELECT dim.k, n_name, count(*) AS n
      |FROM cust JOIN dim ON cust.k IS NOT DISTINCT FROM dim.k
      |GROUP BY dim.k, n_name
      |ORDER BY n_name""".stripMargin

  val queries: Map[String, Q] = Map(
    "join_null_safe" -> joinNullSafe,
    "join_multiway" -> joinMultiway,
    "scan_parquet" -> scanParquet,
    "project_select" -> projectSelectNoSort,
    "filter_predicate" -> filterPredicate,
    "filter_regex_grep" -> filterRegexGrep,
    "filter_null_semantics" -> filterNullSemantics,
    "join_inner_hash" -> joinInnerHash,
    "join_broadcast" -> joinBroadcast,
    "join_sort_merge" -> joinSortMerge,
    "join_left_outer" -> joinLeftOuter,
    "join_full_outer" -> joinFullOuter,
    "join_right_outer" -> joinRightOuter,
    "join_left_semi" -> joinLeftSemi,
    "join_left_anti" -> joinLeftAnti,
    "join_cross" -> joinCross,
    "join_theta_range" -> joinThetaRange,
  )

  val oracle: Map[String, String] = Map(
    "join_null_safe" -> joinNullSafeSql,
    "join_multiway" -> joinMultiwaySql,
    "scan_parquet" -> scanParquetSql,
    "project_select" -> projectSelectSql,
    "filter_predicate" -> filterPredicateSql,
    "filter_regex_grep" -> filterRegexGrepSql,
    "filter_null_semantics" -> filterNullSemanticsSql,
    "join_inner_hash" -> joinInnerHashSql,
    "join_broadcast" -> joinBroadcastSql,
    "join_sort_merge" -> joinSortMergeSql,
    "join_left_outer" -> joinLeftOuterSql,
    "join_full_outer" -> joinFullOuterSql,
    "join_right_outer" -> joinRightOuterSql,
    "join_left_semi" -> joinLeftSemiSql,
    "join_left_anti" -> joinLeftAntiSql,
    "join_cross" -> joinCrossSql,
    "join_theta_range" -> joinThetaRangeSql,
  )

  /** Registered SORT-FREE (round 15, tranche 3): join results are keyed
    * lookups downstream — the trailing ORDER BY was comparator-only (each
    * paid an extra AQE stage + range exchange per suite pass). Keys are
    * unique in every output (c_custkey per-customer; (ck, ok) for the
    * outer joins since ok = o_orderkey is unique and ck-only rows carry
    * ok = -1 once each; (p_partkey, band) since bands are disjoint).
    * Verify applies these; each equals its oracle's trailing ORDER BY
    * (ExplainInvariantsSpec pins the coupling). */
  val dumpSort: Map[String, Seq[String]] = Map(
    "join_sort_merge" -> Seq("o_orderpriority"),
    "join_left_outer" -> Seq("c_custkey"),
    "join_full_outer" -> Seq("ck", "ok"),
    "join_right_outer" -> Seq("ck", "ok"),
    "join_left_semi" -> Seq("c_custkey"),
    "join_left_anti" -> Seq("c_custkey"),
    "join_theta_range" -> Seq("p_partkey", "band"),
    "join_null_safe" -> Seq("n_name"),
    "join_cross" -> Seq("r_name", "n_name"),
    "filter_null_semantics" -> Seq("c_custkey"),
    "filter_regex_grep" -> Seq("doc_id"),
  )
}
