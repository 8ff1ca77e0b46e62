package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator family (SURVEY.md §2 Tier B): scans, filters,
  * hash aggregation with partial/final, broadcast + shuffle joins,
  * semi/anti joins, window functions, rollup/cube, set ops, sort/top-k.
  *
  * All queries are pure DataFrame-DSL logical plans — Catalyst handles
  * predicate pushdown, column pruning and join strategy; small dims are
  * explicitly `broadcast()` so fact-dim joins never shuffle the fact
  * side. Double-typed aggregates are rounded (2dp sums / 4dp avgs) so
  * results hash-match a single-threaded oracle engine regardless of
  * Spark's partial-aggregation summation order.
  */
object Relational {

  /** TPC-H Q1 shape: pricing summary over lineitem.
    * scan -> filter (pushed to parquet) -> partial/final hash agg -> sort.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")), 2).as("sum_charge"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_extendedprice"), 4).as("avg_price"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1PricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity), 2) AS sum_qty,
      | round(sum(l_extendedprice), 2) AS sum_base_price,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      | round(avg(l_quantity), 4) AS avg_qty,
      | round(avg(l_extendedprice), 4) AS avg_price,
      | round(avg(l_discount), 4) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
