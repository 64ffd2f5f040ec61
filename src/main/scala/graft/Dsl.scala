package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for the DuckDB hash-match oracle (SURVEY.md §2 rules).
  *
  * The driver hash-compares our parquet output against DuckDB executing
  * `SparkEntry.oracleSql` — values must be BIT-identical, so every floating
  * aggregate here is engineered to be exact:
  *
  *  - All fixture money columns are exactly 2-decimal doubles (verified),
  *    so casting to decimal(12,2) is lossless. Decimal arithmetic is exact
  *    and associative → sums are independent of partitioning / shuffle order
  *    (Spark's double-sum is NOT: partial-aggregate merge order varies per
  *    run, which would make round(sum(x),2) flaky at rounding boundaries).
  *  - Integer-valued doubles (l_quantity) sum exactly in binary — safe as-is.
  *  - Final results are cast back to double so the output schema stays plain.
  *
  * This mirrors what a production engine does at 100 TB: money in decimals,
  * never "sum doubles then round".
  */
object Dsl {
  /** Lossless decimal view of a 2-decimal money column. */
  def dec2(c: Column): Column = c.cast("decimal(12,2)")

  /** Exact, order-independent sum of a money column, returned as double. */
  def moneySum(c: Column): Column = sum(dec2(c)).cast("double")

  /** Exact sum of an already-decimal expression, returned as double. */
  def decSum(c: Column): Column = sum(c).cast("double")

  /** l_extendedprice * (1 - l_discount), exactly (decimal(26,4)). */
  val discPrice: Column =
    dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))

  /** l_extendedprice * (1 - l_discount) * (1 + l_tax), exactly.
    * The inner product is narrowed to decimal(18,4) (still lossless — values
    * are < 10^14) so the second multiply fits decimal precision 38 in BOTH
    * engines without any rounding.
    */
  val charge: Column =
    discPrice.cast("decimal(18,4)") * (lit(1) + dec2(col("l_tax")))

  /** Oracle-side (DuckDB SQL) twins of the expressions above. */
  val discPriceSql: String =
    "cast(l_extendedprice as decimal(12,2)) * (1 - cast(l_discount as decimal(12,2)))"
  val chargeSql: String =
    s"cast($discPriceSql as decimal(18,4)) * (1 + cast(l_tax as decimal(12,2)))"
  def moneySumSql(col: String): String =
    s"cast(sum(cast($col as decimal(12,2))) as double)"

  /** Deterministic mean: exact double sum (decimal-backed) / count. Double
    * division of identical operands is identical in both engines. */
  def moneyAvg(c: Column): Column = moneySum(c) / count(lit(1))
  def moneyAvgSql(col: String): String = s"${moneySumSql(col)} / count(*)"
}
