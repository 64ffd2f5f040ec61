package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.7 set operations / exact dedup (SURVEY.md).
  *
  * Reference provenance: the multi-directory-input (MultipleInputs) and
  * group-on-whole-record distinct idioms of a public Hadoop release
  * (/root/reference/README.md:4). UNION ALL is metadata-only in Spark (no
  * shuffle); the distinct variants shuffle on the full row hash — at 100 TB
  * that is the unavoidable exchange, and partial aggregation trims it.
  */
object SetOps {
  type Q = (SparkSession, String) => DataFrame

  private def urgent(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).where(col("o_orderpriority") === "1-URGENT")
  private def high(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).where(col("o_orderpriority") === "2-HIGH")

  /** Bag union of conformant inputs, tagged by source. */
  val setUnionAll: Q = (s, d) =>
    urgent(s, d).select(col("o_orderkey"), lit("urgent").as("src"))
      .unionByName(high(s, d).select(col("o_orderkey"), lit("high").as("src")))

  val setUnionAllSql: String =
    """SELECT o_orderkey, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
      |UNION ALL
      |SELECT o_orderkey, 'high' AS src FROM orders WHERE o_orderpriority = '2-HIGH'
      |ORDER BY o_orderkey, src""".stripMargin

  /** Set union: distinct customers having urgent or high orders. */
  val setUnionDistinct: Q = (s, d) =>
    urgent(s, d).select("o_custkey")
      .union(high(s, d).select("o_custkey"))
      .distinct()

  val setUnionDistinctSql: String =
    """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |UNION
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
      |ORDER BY o_custkey""".stripMargin

  /** Set intersection: customers with BOTH urgent and high orders. */
  val setIntersect: Q = (s, d) =>
    urgent(s, d).select("o_custkey")
      .intersect(high(s, d).select("o_custkey"))

  val setIntersectSql: String =
    """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
      |ORDER BY o_custkey""".stripMargin

  /** Set difference: customers with orders but none urgent. */
  val setExcept: Q = (s, d) =>
    Tables.orders(s, d).select("o_custkey")
      .except(urgent(s, d).select("o_custkey"))

  val setExceptSql: String =
    """SELECT o_custkey FROM orders
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY o_custkey""".stripMargin

  /** Bag intersection (INTERSECT ALL): per-customer order-count overlap —
    * multiplicity min(urgent_n, high_n), which set-intersect silently
    * collapses to 1. Spark plans a count-tagged join, no row explosion. */
  val setIntersectAll: Q = (s, d) =>
    urgent(s, d).select("o_custkey")
      .intersectAll(high(s, d).select("o_custkey"))

  val setIntersectAllSql: String =
    """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |INTERSECT ALL
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
      |ORDER BY o_custkey""".stripMargin

  /** Bag difference (EXCEPT ALL): multiplicity max(all_n - urgent_n, 0) —
    * keeps a customer's remaining non-urgent order slots. */
  val setExceptAll: Q = (s, d) =>
    Tables.orders(s, d).select("o_custkey")
      .exceptAll(urgent(s, d).select("o_custkey"))

  val setExceptAllSql: String =
    """SELECT o_custkey FROM orders
      |EXCEPT ALL
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY o_custkey""".stripMargin

  /** Exact whole-row dedup (canonical MR distinct). */
  val distinctRows: Q = (s, d) =>
    Tables.orders(s, d)
      .select("o_orderstatus", "o_orderpriority")
      .distinct()

  val distinctRowsSql: String =
    """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  val queries: Map[String, Q] = Map(
    "set_union_all" -> setUnionAll,
    "set_union_distinct" -> setUnionDistinct,
    "set_intersect" -> setIntersect,
    "set_except" -> setExcept,
    "set_intersect_all" -> setIntersectAll,
    "set_except_all" -> setExceptAll,
    "distinct_rows" -> distinctRows,
  )

  val oracle: Map[String, String] = Map(
    "set_union_all" -> setUnionAllSql,
    "set_union_distinct" -> setUnionDistinctSql,
    "set_intersect" -> setIntersectSql,
    "set_except" -> setExceptSql,
    "set_intersect_all" -> setIntersectAllSql,
    "set_except_all" -> setExceptAllSql,
    "distinct_rows" -> distinctRowsSql,
  )

  /** Registered SORT-FREE (round 15): set results have no semantic order;
    * keys are unique (distinct/intersect/except outputs) or ties are
    * IDENTICAL single-column rows (the ALL variants), so any tie order
    * compares equal. Verify applies these; each equals the oracle's
    * trailing ORDER BY. */
  val dumpSort: Map[String, Seq[String]] = Map(
    "set_except_all" -> Seq("o_custkey"),
    "set_union_all" -> Seq("o_orderkey", "src"),
    "set_union_distinct" -> Seq("o_custkey"),
    "set_intersect" -> Seq("o_custkey"),
    "set_except" -> Seq("o_custkey"),
    "set_intersect_all" -> Seq("o_custkey"),
    "distinct_rows" -> Seq("o_orderstatus", "o_orderpriority"),
  )
}
