package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator family (SURVEY.md §2 Tier B): scans, filters,
  * hash aggregation with partial/final combine, broadcast + shuffle
  * joins, semi/anti joins, window functions, rollup/cube, set ops,
  * sort/top-k, as-of and range joins, JSON extraction.
  *
  * Scale design notes (100 TB / 1000-executor target):
  *  - Dim tables (region/nation/customer/supplier/part) are always
  *    `broadcast()` so fact-side rows never shuffle for dim joins.
  *  - Fact-fact joins (orders x lineitem) shuffle once on the join key;
  *    at scale the same plans benefit from bucketing both tables on
  *    orderkey (see engine.Sink bucketed write support).
  *  - The as-of join is a union+window merge: ONE shuffle on the
  *    partition key, no point-in-time cross join. The range self-join
  *    is bucketized (probe rows exploded into adjacent time buckets) so
  *    the join stays equi-key and skew-bounded instead of O(n^2).
  *  - Double aggregates are rounded (2dp sums / 4dp avgs) so results
  *    hash-match a single-threaded oracle engine regardless of Spark's
  *    partial-aggregation summation order.
  */
object Relational extends QueryFamily {

  /** TPC-H Q1 shape: pricing summary over lineitem.
    * scan -> filter (pushed to parquet) -> partial/final hash agg -> sort. */
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

  /** TPC-H Q3 shape: shipping priority. customer x orders x lineitem,
    * date-banded, top-10 revenue order keys. No broadcast hint on
    * customer: it scales with the fact tables (SF x 150k rows), so a
    * forced broadcast dies at cluster scale — AQE broadcasts it while
    * its filtered side stays under the threshold and falls back to a
    * shuffle join when it doesn't. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cutoff = lit("1998-01-01").cast("timestamp")
    val cust = T.customer(spark, dir).filter($"c_mktsegment" === "BUILDING")
    val ord = T.orders(spark, dir).filter($"o_orderdate" < cutoff)
    val li = T.lineitem(spark, dir).filter($"l_shipdate" > cutoff)
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("orderdate"))
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  val q3ShippingPrioritySql: String =
    """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H Q5 shape: local-supplier revenue per nation. 6-way join:
    * the fixed-cardinality dims (nation 25 rows, region 5) are
    * explicitly broadcast; supplier/customer scale with SF, so their
    * join strategy is left to AQE (broadcast while small, shuffle at
    * cluster scale). */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = T.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
              $"o_orderdate" <  lit("1998-01-01").cast("timestamp"))
    val region = T.region(spark, dir).filter($"r_name" === "ASIA")
    T.lineitem(spark, dir)
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(T.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .join(T.customer(spark, dir),
        $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(T.nation(spark, dir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  val q5LocalSupplierSql: String =
    """SELECT n_name,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q8-shaped market share: of all MEDIUM-part revenue bought by
    * ASIA customers, the fraction supplied from NATION_7, by order
    * year. The deepest join tree in the suite — seven relations with
    * `nation` playing TWO roles (customer side filters the market,
    * supplier side tags the origin). Only the fixed-size dimensions
    * (nation x2, region) carry broadcast hints; the SF-scaled sides
    * (part, supplier, customer) are left to AQE, per the round-2
    * lesson. The share divides two unrounded co-grouped sums, so
    * cross-engine FP noise cancels to ~1e-12 before the 4dp display
    * rounding. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val part = T.part(spark, dir).filter($"p_type" === "MEDIUM")
    val region = T.region(spark, dir).filter($"r_name" === "ASIA")
    val nationC = T.nation(spark, dir)
      .select($"n_nationkey".as("cn_key"), $"n_regionkey".as("cn_region"))
    val nationS = T.nation(spark, dir)
      .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))
    T.lineitem(spark, dir)
      .join(part, $"l_partkey" === $"p_partkey")
      .join(T.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(T.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(nationC), $"c_nationkey" === $"cn_key")
      .join(broadcast(region), $"cn_region" === $"r_regionkey")
      .join(T.supplier(spark, dir), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(nationS), $"s_nationkey" === $"sn_key")
      .select(year($"o_orderdate").as("o_year"),
        ($"l_extendedprice" * (lit(1) - $"l_discount")).as("vol"),
        $"supp_nation")
      .groupBy($"o_year")
      .agg(round(
        sum(when($"supp_nation" === "NATION_7", $"vol").otherwise(0.0))
          / sum($"vol"), 4).as("mkt_share"))
      .orderBy($"o_year")
  }

  val q8MarketShareSql: String =
    """SELECT year(o_orderdate) AS o_year,
      | round(sum(CASE WHEN ns.n_name = 'NATION_7'
      |               THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
      |       / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
      |FROM lineitem
      |JOIN part     ON l_partkey = p_partkey
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation nc ON c_nationkey = nc.n_nationkey
      |JOIN region   ON nc.n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ns ON s_nationkey = ns.n_nationkey
      |WHERE p_type = 'MEDIUM' AND r_name = 'ASIA'
      |GROUP BY 1 ORDER BY o_year""".stripMargin

  /** Left-semi join (EXISTS): orders having at least one heavy lineitem. */
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val heavy = T.lineitem(spark, dir).filter($"l_quantity" > 45).select($"l_orderkey")
    T.orders(spark, dir)
      .join(heavy, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  val qSemiJoinSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Left-anti join (NOT EXISTS): customers with no recent orders
    * (none on/after 2000-01-01). */
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val recent = T.orders(spark, dir)
      .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
      .select($"o_custkey")
    T.customer(spark, dir)
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_cust"))
      .orderBy($"c_mktsegment")
  }

  val qAntiJoinSql: String =
    """SELECT c_mktsegment, count(*) AS n_cust
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Per-group top-k. `l_returnflag` has 3 distinct values, so a naive
    * ranking window funnels all of lineitem into 3 tasks; instead this
    * runs [[Skew.twoPhaseTopK]] — salted local top-3, then the final
    * window over the few survivors. Identical rows to the single-window
    * form (same DuckDB oracle). */
  def qTopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = T.lineitem(spark, dir)
      .select($"l_returnflag", $"l_orderkey", $"l_linenumber", $"l_extendedprice")
    Skew.twoPhaseTopK(base, Seq($"l_returnflag"),
        Seq(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber")),
        k = 3, rankName = "rn")
      .select($"l_returnflag", $"rn", $"l_orderkey", $"l_linenumber",
        round($"l_extendedprice", 2).as("price"))
      .orderBy($"l_returnflag", $"rn")
  }

  val qTopkPerGroupSql: String =
    """SELECT l_returnflag, rn, l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
      |FROM (
      |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
      |    row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      |  FROM lineitem)
      |WHERE rn <= 3
      |ORDER BY l_returnflag, rn""".stripMargin

  /** Analytic windows: lag, frame-bounded running sum, rank. */
  def qWindowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wSeq = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val wRank = Window.partitionBy($"o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    T.orders(spark, dir).select(
        $"o_custkey", $"o_orderkey",
        round(lag($"o_totalprice", 1).over(wSeq), 2).as("prev_price"),
        round(sum($"o_totalprice")
          .over(wSeq.rowsBetween(Window.unboundedPreceding, 0)), 2).as("running_total"),
        // long: exact dtype parity with the oracle's BIGINT rank
        rank().over(wRank).cast("long").as("price_rank"))
      .orderBy($"o_orderkey")
  }

  val qWindowAnalyticsSql: String =
    """SELECT o_custkey, o_orderkey,
      | round(lag(o_totalprice, 1) OVER w_seq, 2) AS prev_price,
      | round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
      | rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
      |FROM orders
      |WINDOW w_seq AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  /** Value-based (RANGE) window frame: per customer, total spend in the
    * trailing 90 days relative to each order. */
  def qWindowRange(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"day")
      .rangeBetween(-90, 0)
    T.orders(spark, dir)
      .withColumn("day",
        (unix_micros($"o_orderdate".cast("timestamp")) / lit(86400000000L)).cast("long"))
      .select($"o_custkey", $"o_orderkey", $"day",
        round(sum($"o_totalprice").over(w), 2).as("spend_90d"))
      .orderBy($"o_orderkey")
  }

  val qWindowRangeSql: String =
    """SELECT o_custkey, o_orderkey, day,
      | round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY day
      |   RANGE BETWEEN 90 PRECEDING AND CURRENT ROW), 2) AS spend_90d
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        epoch_us(o_orderdate) // 86400000000 AS day FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  /** Distribution window functions: ntile, percent_rank, cume_dist. */
  def qWindowRanks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderstatus")
      .orderBy($"o_totalprice", $"o_orderkey")
    T.orders(spark, dir).select(
        $"o_orderstatus", $"o_orderkey",
        // long: exact dtype parity with the oracle's BIGINT ntile
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy($"o_orderkey")
  }

  val qWindowRanksSql: String =
    """SELECT o_orderstatus, o_orderkey,
      | ntile(4) OVER w AS quartile,
      | round(percent_rank() OVER w, 6) AS pct_rank,
      | round(cume_dist() OVER w, 6) AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  /** ROLLUP grouping over lineitem flags. */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.lineitem(spark, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(round(sum($"l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  val qRollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** CUBE grouping over order status x priority. */
  def qCube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.orders(spark, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  val qCubeSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      | round(sum(o_totalprice), 2) AS total
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Set operations: INTERSECT / EXCEPT between customer and supplier
    * nation sets, tagged and unioned. */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cn = T.customer(spark, dir).select($"c_nationkey".as("nationkey")).distinct()
    val sn = T.supplier(spark, dir).select($"s_nationkey".as("nationkey")).distinct()
    cn.intersect(sn).withColumn("tag", lit("both"))
      .unionByName(cn.except(sn).withColumn("tag", lit("cust_only")))
      .orderBy($"tag", $"nationkey")
  }

  val qSetOpsSql: String =
    """WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
      |     sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
      |SELECT nationkey, 'both' AS tag FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
      |UNION ALL
      |SELECT nationkey, 'cust_only' AS tag FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
      |ORDER BY tag, nationkey""".stripMargin

  /** Multiset set operations (INTERSECT ALL / EXCEPT ALL): duplicate-
    * preserving overlap between the nation keys of two order slices. */
  def qSetOpsAll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def slice(lo: String, hi: String) = T.orders(spark, dir)
      .filter($"o_orderdate" >= lit(lo).cast("timestamp") &&
              $"o_orderdate" < lit(hi).cast("timestamp"))
      .select($"o_custkey")
    val a = slice("1996-01-01", "1997-01-01")
    val b = slice("1997-01-01", "1998-01-01")
    a.intersectAll(b).withColumn("tag", lit("both_years"))
      .unionByName(a.exceptAll(b).withColumn("tag", lit("only_1996")))
      .groupBy($"tag")
      .agg(count(lit(1)).as("n"), countDistinct($"o_custkey").as("n_distinct"))
      .orderBy($"tag")
  }

  val qSetOpsAllSql: String =
    """WITH a AS (SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'),
      |b AS (SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'),
      |u AS (
      |  SELECT o_custkey, 'both_years' AS tag FROM (
      |    SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b)
      |  UNION ALL
      |  SELECT o_custkey, 'only_1996' AS tag FROM (
      |    SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b))
      |SELECT tag, count(*) AS n, count(DISTINCT o_custkey) AS n_distinct
      |FROM u GROUP BY tag ORDER BY tag""".stripMargin

  /** Schema-drift-safe union: unionByName(allowMissingColumns) across
    * heterogeneous exports (customer vs supplier). */
  def qUnionDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = T.customer(spark, dir).select(
      $"c_name".as("name"), $"c_acctbal".as("acctbal"),
      $"c_nationkey".as("nationkey"), $"c_mktsegment".as("mktsegment"),
      lit("customer").as("kind"))
    val s = T.supplier(spark, dir).select(
      $"s_name".as("name"), $"s_acctbal".as("acctbal"),
      $"s_nationkey".as("nationkey"), lit("supplier").as("kind"))
    c.unionByName(s, allowMissingColumns = true).orderBy($"kind", $"name")
  }

  val qUnionDriftSql: String =
    """SELECT c_name AS name, c_acctbal AS acctbal, c_nationkey AS nationkey,
      |       c_mktsegment AS mktsegment, 'customer' AS kind
      |FROM customer
      |UNION ALL
      |SELECT s_name, s_acctbal, s_nationkey, NULL, 'supplier' FROM supplier
      |ORDER BY kind, name""".stripMargin

  /** Exact distinct counts (shuffle-dedup per group). */
  def qDistinctCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.orders(spark, dir)
      .groupBy($"o_orderstatus")
      .agg(
        countDistinct($"o_custkey").as("n_cust"),
        countDistinct(year($"o_orderdate")).as("n_years"),
        count(lit(1)).as("n_orders"))
      .orderBy($"o_orderstatus")
  }

  val qDistinctCountsSql: String =
    """SELECT o_orderstatus,
      | count(DISTINCT o_custkey) AS n_cust,
      | count(DISTINCT year(o_orderdate)) AS n_years,
      | count(*) AS n_orders
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** HLL approximate distinct — sketch-based, constant memory at any
    * scale. No SQL oracle BY CHOICE, not by gap (round-10 verdict task
    * 6): the raw HLL++ estimates are estimator-specific, so this row
    * is kept rows-only as the DISPLAY TWIN of
    * [[qApproxDistinctAudit]], which runs the identical
    * `approx_count_distinct(rsd = 0.01)` aggregation over the same
    * scan and oracle-pins its accuracy contract (exact counts +
    * within-3-sigma booleans hash-compared against DuckDB). Dropping
    * this row would lose the operator's actual output shape (the
    * estimates themselves) from the registry; keeping it costs one
    * rows-only entry whose estimator is already oracle-gated. The
    * no_oracle ledger therefore reads: 2 by nature (image decode), 1
    * by documented choice (this row). */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_partkey", 0.01).as("approx_parts"),
        approx_count_distinct($"l_orderkey", 0.01).as("approx_orders"))
      .orderBy($"l_returnflag")
  }

  /** Self-verifying audit of [[qApproxDistinct]]'s HLL++ estimates
    * (round-8 advice: the last meaningfully-oracle-able rows-only
    * entry): per-returnflag `approx_count_distinct(rsd = 0.01)` is
    * checked against the exact distinct from the same scan; the
    * emitted row is (flag, exact counts, within-bound booleans) with
    * the bound at 3x the requested rsd (HLL++'s rsd is a standard
    * error — 3 sigma absorbs per-group variance). The oracle
    * reproduces the exact counts and pins the booleans at true, so
    * the hash compare IS the accuracy-contract check — the
    * q_hll_union_audit / q_kll_quantile_audit design. The exact and
    * approximate sides run as SEPARATE aggregates joined on the 3-row
    * flag key: mixing countDistinct with approx_count_distinct in one
    * agg makes Catalyst route the HLL++ buffers through the
    * count-distinct Expand — a 16 KB sketch per (flag, key) group,
    * gigabytes of buffer at sf0.1 (measured 63 s; split form is
    * sub-second). */
  def qApproxDistinctAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val eps = 0.03
    val li = T.lineitem(spark, dir)
      .select($"l_returnflag", $"l_partkey", $"l_orderkey")
    val exact = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_orderkey").as("n_orders"))
    val apx = li.groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey", 0.01).as("apx_parts"),
        approx_count_distinct($"l_orderkey", 0.01).as("apx_orders"))
    exact.join(apx, Seq("l_returnflag"))
      .select($"l_returnflag", $"n_parts", $"n_orders",
        (abs($"apx_parts" - $"n_parts") <= lit(eps) * $"n_parts").as("ok_parts"),
        (abs($"apx_orders" - $"n_orders") <= lit(eps) * $"n_orders").as("ok_orders"))
      .orderBy($"l_returnflag")
  }

  val qApproxDistinctAuditSql: String =
    """SELECT l_returnflag,
      | count(DISTINCT l_partkey) AS n_parts,
      | count(DISTINCT l_orderkey) AS n_orders,
      | true AS ok_parts, true AS ok_orders
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Self-verifying audit of Datasketches-HLL partial-sketch merge —
    * the distributed distinct-count shape at 100 TB: each supplier
    * shard builds its own sketch INDEPENDENTLY (hll_sketch_agg, a
    * partial-combining hash aggregate), the shards' sketches merge
    * without touching the data again (hll_union_agg), and the merged
    * estimate is checked against the exact distinct computed from the
    * same scan. The emitted row is (exact count, within-2%-bound
    * boolean); the oracle reproduces the exact count and pins the
    * boolean at true — same verification trick as the approx-quantile
    * and Bloom audits, so a hash match proves the sketch-merge met its
    * accuracy contract. */
  def qHllUnionAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = T.lineitem(spark, dir).select($"l_suppkey", $"l_partkey")
    val shardSketches = li.groupBy($"l_suppkey")
      .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
    val merged = shardSketches
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    li.agg(countDistinct($"l_partkey").as("n_exact"))
      .crossJoin(broadcast(merged))
      .select($"n_exact",
        (abs($"est" - $"n_exact") <= lit(0.02) * $"n_exact").as("within_bound"))
  }

  val qHllUnionAuditSql: String =
    """SELECT count(DISTINCT l_partkey) AS n_exact, true AS within_bound
      |FROM lineitem""".stripMargin

  /** Mergeable-quantile-sketch audit (the KLL twin of
    * [[qHllUnionAudit]]): per-shard KLL sketches built map-side
    * (shards = supplier mod 16), merged with `kll_merge_agg_double` —
    * the associative path a 1000-executor quantile computation takes —
    * then each merged quartile estimate is audited by computing its
    * EXACT rank (count of values ≤ estimate / n) and checking it
    * lies within the sketch's rank-error bound of the target
    * quantile. The oracle emits the exact row count and literal
    * `true`s, so the hash comparison IS the bound check — the
    * q_hll_union_audit self-verification design. */
  def qKllQuantileAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = T.lineitem(spark, dir)
      .select(($"l_suppkey" % 16).as("shard"), $"l_extendedprice".as("v"))
    val shardSketches = li.groupBy($"shard")
      .agg(expr("kll_sketch_agg_double(v)").as("sk"))
    val merged = shardSketches.agg(
      expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.25)").as("e25"),
      expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.5)").as("e50"),
      expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.75)").as("e75"))
    // default k=200 KLL: single-sided rank error <= ~1.65% at 99%
    // confidence; 3% absorbs the merge
    val eps = 0.03
    li.crossJoin(broadcast(merged))
      .agg(
        count(lit(1)).as("n"),
        (sum(when($"v" <= $"e25", 1L).otherwise(0L)) / count(lit(1))).as("r25"),
        (sum(when($"v" <= $"e50", 1L).otherwise(0L)) / count(lit(1))).as("r50"),
        (sum(when($"v" <= $"e75", 1L).otherwise(0L)) / count(lit(1))).as("r75"))
      .select($"n",
        (abs($"r25" - 0.25) <= eps).as("ok_q25"),
        (abs($"r50" - 0.5) <= eps).as("ok_q50"),
        (abs($"r75" - 0.75) <= eps).as("ok_q75"))
  }

  val qKllQuantileAuditSql: String =
    """SELECT count(*) AS n, true AS ok_q25, true AS ok_q50, true AS ok_q75
      |FROM lineitem""".stripMargin

  /** As-of join: each purchase event matched to the latest prior click
    * of the same user. Implemented as union + running-max window — one
    * shuffle on user_id, no point-in-time cross join (merge-asof at any
    * scale). Ties (click at the same microsecond as the purchase) count
    * as "prior" on both sides. */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = T.events(spark, dir)
    val clicks = ev.filter($"event_type" === "click").select(
      $"user_id", $"ts".as("c_ts"),
      lit(null).cast("timestamp").as("p_ts"), lit(null).cast("long").as("event_id"),
      lit(0).as("tag"))
    val purchases = ev.filter($"event_type" === "purchase").select(
      $"user_id", lit(null).cast("timestamp").as("c_ts"),
      $"ts".as("p_ts"), $"event_id", lit(1).as("tag"))
    val w = Window.partitionBy($"user_id")
      .orderBy(coalesce($"c_ts", $"p_ts").asc, $"tag".asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    clicks.unionByName(purchases)
      .withColumn("last_click", max($"c_ts").over(w))
      .filter($"tag" === 1)
      .select($"event_id",
        unix_micros($"p_ts").as("p_us"),
        unix_micros($"last_click").as("click_us"))
      .orderBy($"event_id")
  }

  val qAsofJoinSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |             make_timestamp(epoch_ns(ts)//1000) AS ts FROM events),
      | c AS (SELECT user_id, ts AS c_ts FROM e WHERE event_type = 'click'),
      | p AS (SELECT event_id, user_id, ts AS p_ts FROM e WHERE event_type = 'purchase')
      |SELECT p.event_id, epoch_us(p.p_ts) AS p_us,
      | (SELECT max(epoch_us(c.c_ts)) FROM c
      |   WHERE c.user_id = p.user_id AND c.c_ts <= p.p_ts) AS click_us
      |FROM p ORDER BY p.event_id""".stripMargin

  /** As-of join WITH TOLERANCE (pandas merge_asof's `tolerance`
    * knob): each purchase matches its latest prior click only if that
    * click landed within the last hour — beyond it the match is NULL,
    * which is the attribution-window semantics ad systems bill on.
    * Same single-shuffle union + running-max-window plan as
    * [[qAsofJoin]]; the tolerance is a post-filter on the matched
    * timestamp, so the scale shape is unchanged (no inequality join,
    * no per-row range scan). */
  def qAsofTolerance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tolUs = 3600000000L // 1 hour
    val ev = T.events(spark, dir)
    val clicks = ev.filter($"event_type" === "click").select(
      $"user_id", $"ts".as("c_ts"),
      lit(null).cast("timestamp").as("p_ts"), lit(null).cast("long").as("event_id"),
      lit(0).as("tag"))
    val purchases = ev.filter($"event_type" === "purchase").select(
      $"user_id", lit(null).cast("timestamp").as("c_ts"),
      $"ts".as("p_ts"), $"event_id", lit(1).as("tag"))
    val w = Window.partitionBy($"user_id")
      .orderBy(coalesce($"c_ts", $"p_ts").asc, $"tag".asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    clicks.unionByName(purchases)
      .withColumn("last_click", max($"c_ts").over(w))
      .filter($"tag" === 1)
      .select($"event_id",
        unix_micros($"p_ts").as("p_us"),
        when(unix_micros($"p_ts") - unix_micros($"last_click") <= tolUs,
          unix_micros($"last_click")).as("click_us"))
      .orderBy($"event_id")
  }

  val qAsofToleranceSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |             make_timestamp(epoch_ns(ts)//1000) AS ts FROM events),
      | c AS (SELECT user_id, ts AS c_ts FROM e WHERE event_type = 'click'),
      | p AS (SELECT event_id, user_id, ts AS p_ts FROM e WHERE event_type = 'purchase'),
      | m AS (SELECT p.event_id, epoch_us(p.p_ts) AS p_us,
      |   (SELECT max(epoch_us(c.c_ts)) FROM c
      |     WHERE c.user_id = p.user_id AND c.c_ts <= p.p_ts) AS raw_click
      |  FROM p)
      |SELECT event_id, p_us,
      |  CASE WHEN p_us - raw_click <= 3600000000 THEN raw_click END AS click_us
      |FROM m ORDER BY event_id""".stripMargin

  /** As-of join through the native operator ([[graft.plans.AsOfJoin]]:
    * custom logical plan + planner strategy + sort-merge physical exec)
    * instead of the union + running-max window of [[qAsofJoin]]. The
    * native path carries the WHOLE matched right row — here the prior
    * click's id and value alongside its timestamp — which the window
    * encoding cannot (a running max per column is not "the matching
    * row"). Oracle: DuckDB's built-in ASOF LEFT JOIN. */
  def qAsofNative(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = T.events(spark, dir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("c_ts"),
        $"event_id".as("click_id"), $"value".as("click_value"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts".as("p_ts"))
    graft.plans.AsOfJoin.asof(purchases, clicks, Seq("user_id"), "p_ts", "c_ts")
      .select($"event_id", unix_micros($"p_ts").as("p_us"),
        $"click_id", unix_micros($"c_ts").as("click_us"), $"click_value")
      .orderBy($"event_id")
  }

  val qAsofNativeSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type, value,
      |             make_timestamp(epoch_ns(ts)//1000) AS ts FROM events),
      | c AS (SELECT user_id, ts AS c_ts, event_id AS click_id, value AS click_value
      |       FROM e WHERE event_type = 'click'),
      | p AS (SELECT event_id, user_id, ts AS p_ts FROM e WHERE event_type = 'purchase')
      |SELECT p.event_id, epoch_us(p.p_ts) AS p_us,
      | c.click_id, epoch_us(c.c_ts) AS click_us, c.click_value
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.p_ts >= c.c_ts
      |ORDER BY p.event_id""".stripMargin

  /** Range self-join, bucketized: for every event, how many events of
    * the same user happened in the preceding hour. Probe rows explode
    * into their own and the previous 1-hour bucket, so the join is
    * equi-key on (user_id, bucket) — O(n * density), never O(n^2). */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourUs = 3600L * 1000000L
    val e = T.events(spark, dir)
      .select($"event_id", $"user_id", unix_micros($"ts").as("us"))
    val cand = e.select($"user_id", $"us".as("r_us"), ($"us" divide hourUs).cast("long").as("b"))
    val probes = e.select($"event_id", $"user_id", $"us",
      explode(array(($"us" divide hourUs).cast("long"), ($"us" divide hourUs).cast("long") - 1)).as("b"))
    val counts = probes.join(cand, Seq("user_id", "b"))
      .filter($"r_us" >= $"us" - hourUs && $"r_us" < $"us")
      .groupBy($"event_id").agg(count(lit(1)).as("n_prev"))
    e.select($"event_id")
      .join(counts, Seq("event_id"), "left")
      .withColumn("n_prev", coalesce($"n_prev", lit(0L)))
      .orderBy($"event_id")
  }

  val qRangeJoinSql: String =
    """WITH e AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS us FROM events)
      |SELECT e1.event_id, count(e2.event_id) AS n_prev
      |FROM e e1
      |LEFT JOIN e e2 ON e1.user_id = e2.user_id
      |  AND e2.us >= e1.us - 3600000000 AND e2.us < e1.us
      |GROUP BY e1.event_id
      |ORDER BY e1.event_id""".stripMargin

  /** JSON extraction from events.props + aggregation. */
  def qJsonExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.events(spark, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("int"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"k").cast("long").as("sum_k"),
        round(avg($"k"), 4).as("avg_k"))
      .orderBy($"event_type")
  }

  val qJsonExtractSql: String =
    """SELECT event_type, count(*) AS n,
      | CAST(sum(json_extract(props, '$.k')::INT) AS BIGINT) AS sum_k,
      | round(avg(json_extract(props, '$.k')::INT), 4) AS avg_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Scalar function surface: string / math / modulo over part. */
  def qScalarFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.part(spark, dir).select(
        $"p_partkey",
        lower($"p_name").as("lname"),
        substring($"p_type", 1, 6).as("t6"),
        length($"p_name").as("ln"),
        concat_ws("-", $"p_brand", $"p_type").as("bt"),
        round(sqrt($"p_retailprice"), 4).as("sq"),
        ($"p_partkey" % 7).as("m7"),
        abs($"p_size" - 25).as("sz"))
      .orderBy($"p_partkey")
  }

  val qScalarFuncsSql: String =
    """SELECT p_partkey, lower(p_name) AS lname, substr(p_type, 1, 6) AS t6,
      | length(p_name) AS ln, concat_ws('-', p_brand, p_type) AS bt,
      | round(sqrt(p_retailprice), 4) AS sq,
      | p_partkey % 7 AS m7, abs(p_size - 25) AS sz
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Date bucketing: per year/month order stats. */
  def qDateAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.orders(spark, dir)
      .groupBy(year($"o_orderdate").as("y"), month($"o_orderdate").as("m"))
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
      .orderBy($"y", $"m")
  }

  val qDateAggSql: String =
    """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
      | count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin

  /** Time-series gap fill: dense month spine x priority grid with
    * zero-filled missing buckets — the resampling step before rate /
    * trend analysis, where absent groups must surface as zeros rather
    * than silently missing rows. The spine derives from a 1-row
    * min/max aggregate and is exploded in-plan (always tiny: bounded
    * by the time range, not the data volume), the dimension grid is a
    * distinct over one column, and only the per-bucket aggregate
    * touches the fact table — one scan, one shuffle. */
  def qGapFill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = T.orders(spark, dir)
    val spine = orders
      .agg(min(trunc($"o_orderdate", "MM")).as("lo"), max(trunc($"o_orderdate", "MM")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 month)")).as("mon"))
    val grid = spine.crossJoin(orders.select($"o_orderpriority".as("prio")).distinct())
    val actual = orders
      .groupBy(trunc($"o_orderdate", "MM").as("mon"), $"o_orderpriority".as("prio"))
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
    grid.join(actual, Seq("mon", "prio"), "left_outer")
      .select(date_format($"mon", "yyyy-MM-dd").as("mon"), $"prio",
        coalesce($"n", lit(0L)).as("n"),
        coalesce($"total", lit(0.0)).as("total"))
      .orderBy($"mon", $"prio")
  }

  val qGapFillSql: String =
    """WITH b AS (SELECT date_trunc('month', min(o_orderdate)) AS lo,
      |                  date_trunc('month', max(o_orderdate)) AS hi FROM orders),
      |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS mon FROM b),
      |grid AS (SELECT mon, prio FROM spine
      |         CROSS JOIN (SELECT DISTINCT o_orderpriority AS prio FROM orders)),
      |actual AS (SELECT date_trunc('month', o_orderdate) AS mon,
      |    o_orderpriority AS prio, count(*) AS n, round(sum(o_totalprice), 2) AS total
      |  FROM orders GROUP BY 1, 2)
      |SELECT strftime(g.mon, '%Y-%m-%d') AS mon, g.prio AS prio,
      |  coalesce(a.n, 0) AS n, coalesce(a.total, 0.0) AS total
      |FROM grid g LEFT JOIN actual a ON a.mon = g.mon AND a.prio = g.prio
      |ORDER BY 1, 2""".stripMargin

  /** Global sort + limit (top-n by price). */
  def qGlobalSort(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.orders(spark, dir)
      .select($"o_orderkey", $"o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(20)
  }

  val qGlobalSortSql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** Global row numbering WITHOUT the single-partition window: every
    * order ranked by price via [[Skew.globalRowNumber]] — range
    * repartition, local rank, broadcast prefix-sum offsets. Same
    * answer as `row_number() OVER (ORDER BY ...)` (the oracle), but
    * the widest task ever holds 1/parts of the data; ScaleSpec pins
    * both the equality and the no-SinglePartition-exchange plan
    * shape. The (price, key) composite is a total order, so ranks are
    * boundary-independent. */
  def qGlobalRank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Skew.globalRowNumber(
        T.orders(spark, dir).select($"o_orderkey", $"o_totalprice"),
        Seq(desc("o_totalprice"), asc("o_orderkey")))
      .orderBy($"rn")
  }

  val qGlobalRankSql: String =
    """SELECT o_orderkey, o_totalprice,
      | row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |FROM orders ORDER BY rn""".stripMargin

  /** Regex predicate on data (reference's REGEXP_LIKE generalized,
    * SURVEY.md A3/A4): parts whose type matches a pattern. */
  def qRegexFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.part(spark, dir)
      .filter($"p_type".rlike("^(STANDARD|LARGE)") && !$"p_name".rlike("green"))
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n"), round(avg($"p_retailprice"), 4).as("avg_price"))
      .orderBy($"p_brand")
  }

  val qRegexFilterSql: String =
    """SELECT p_brand, count(*) AS n, round(avg(p_retailprice), 4) AS avg_price
      |FROM part
      |WHERE regexp_matches(p_type, '^(STANDARD|LARGE)')
      |  AND NOT regexp_matches(p_name, 'green')
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** Pivot (wide aggregation): order counts per priority x status. */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select($"o_orderpriority",
        coalesce($"F", lit(0L)).as("n_f"),
        coalesce($"O", lit(0L)).as("n_o"),
        coalesce($"P", lit(0L)).as("n_p"))
      .orderBy($"o_orderpriority")
  }

  val qPivotSql: String =
    """SELECT o_orderpriority,
      | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      | CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      | CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** GROUPING SETS through the SQL front-end (temp view + spark.sql). */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    T.orders(spark, dir).createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  val qGroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Exact per-group percentiles via [[Quantiles.exact]] — bucketed
    * rank location, no per-group value buffer (the exact-`percentile`
    * aggregate's O(group) memory), so the widest status group costs a
    * bounded histogram plus one located-bucket sort at any SF. */
  def qMedian(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Quantiles.exact(
        T.orders(spark, dir).select($"o_orderstatus", $"o_totalprice"),
        Seq("o_orderstatus"), "o_totalprice", Seq(0.5, 0.9))
      .groupBy($"o_orderstatus")
      .agg(
        round(max(when($"p" === 0.5, $"q")), 4).as("median_price"),
        round(max(when($"p" === 0.9, $"q")), 4).as("p90_price"),
        max($"n").as("n"))
      .orderBy($"o_orderstatus")
  }

  val qMedianSql: String =
    """SELECT o_orderstatus,
      | round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
      | round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
      | count(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Custom typed UDAF (graft.functions.Aggregators.GeoMean): geometric
    * mean of order totals per priority, with map-side partial merge. */
  def qGeoMean(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(round(graft.functions.Aggregators.geoMean($"o_totalprice"), 4).as("geo_price"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderpriority")
  }

  val qGeoMeanSql: String =
    """SELECT o_orderpriority,
      | round(exp(sum(ln(o_totalprice)) / count(*)), 4) AS geo_price,
      | count(*) AS n
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Correlated scalar subquery through the SQL front-end — Catalyst
    * decorrelates it into an aggregate + join; the DSL never needs a
    * hand-written decorrelation. */
  def qCorrelated(spark: SparkSession, dir: String): DataFrame = {
    T.orders(spark, dir).createOrReplaceTempView("orders_corr")
    spark.sql(
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        |FROM orders_corr o
        |WHERE o_totalprice > 1.5 * (SELECT avg(o2.o_totalprice)
        |                            FROM orders_corr o2
        |                            WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val qCorrelatedSql: String =
    """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
      |FROM orders o
      |WHERE o_totalprice > 1.5 * (SELECT avg(o2.o_totalprice)
      |                            FROM orders o2
      |                            WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  /** Event funnel: users reaching view -> click-after-view ->
    * purchase-after-click, counted per stage. ONE scan of the fact
    * table: the three stage timestamps are chained per-user window
    * minima (each conditions on the previous stage's partition-wide
    * value), which share a single user_id exchange; the per-user
    * rollup then reuses that distribution, so the whole funnel is one
    * scan + one shuffle at any scale — the earlier stage-per-stage
    * join formulation re-read events six times. */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id")
    T.events(spark, dir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      .filter($"event_type".isin("view", "click", "purchase"))
      .withColumn("v_us",
        min(when($"event_type" === "view", $"us")).over(w))
      .withColumn("c_us",
        min(when($"event_type" === "click" && $"us" >= $"v_us", $"us")).over(w))
      .withColumn("p_us",
        min(when($"event_type" === "purchase" && $"us" >= $"c_us", $"us")).over(w))
      .groupBy($"user_id")
      .agg(max($"v_us").as("v_us"), max($"c_us").as("c_us"),
        max($"p_us").as("p_us"))
      .agg(
        sum(when($"v_us".isNotNull, 1L).otherwise(0L)).as("n_view"),
        sum(when($"c_us".isNotNull, 1L).otherwise(0L)).as("n_click_after_view"),
        sum(when($"p_us".isNotNull, 1L).otherwise(0L)).as("n_purchase_after_click"))
  }

  val qFunnelSql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_ns(ts)//1000 AS us FROM events),
      |v AS (SELECT user_id, min(us) AS v_us FROM e WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(us) AS c_us FROM e JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND us >= v_us GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(us) AS p_us FROM e JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND us >= c_us GROUP BY e.user_id)
      |SELECT (SELECT count(*) FROM v) AS n_view,
      |       (SELECT count(*) FROM c) AS n_click_after_view,
      |       (SELECT count(*) FROM p) AS n_purchase_after_click""".stripMargin

  /** Edit-distance histogram (built-in levenshtein, identical DP
    * definition in both engines). */
  def qEditDistance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.part(spark, dir)
      .withColumn("d", levenshtein($"p_type", lit("STANDARD BRUSHED COPPER")))
      .groupBy($"d").agg(count(lit(1)).as("n"))
      .orderBy($"d")
  }

  val qEditDistanceSql: String =
    """SELECT levenshtein(p_type, 'STANDARD BRUSHED COPPER') AS d, count(*) AS n
      |FROM part GROUP BY 1 ORDER BY d""".stripMargin

  /** Referential-integrity audit over the exported star schema — the
    * check a snapshot-consistent (AS OF SCN) export should pass and a
    * drifting per-table export would fail: orphan counts per foreign
    * key. */
  def qIntegrityAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val liOrph = T.lineitem(spark, dir)
      .join(T.orders(spark, dir).select($"o_orderkey"),
        $"l_orderkey" === $"o_orderkey", "left_anti")
      .agg(count(lit(1)).as("lineitem_orphans"))
    val ordOrph = T.orders(spark, dir)
      .join(T.customer(spark, dir).select($"c_custkey"),
        $"o_custkey" === $"c_custkey", "left_anti")
      .agg(count(lit(1)).as("order_orphans"))
    val custOrph = T.customer(spark, dir)
      .join(broadcast(T.nation(spark, dir).select($"n_nationkey")),
        $"c_nationkey" === $"n_nationkey", "left_anti")
      .agg(count(lit(1)).as("customer_orphans"))
    liOrph.crossJoin(ordOrph).crossJoin(custOrph)
  }

  val qIntegrityAuditSql: String =
    """SELECT
      | (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
      |   (SELECT o_orderkey FROM orders)) AS lineitem_orphans,
      | (SELECT count(*) FROM orders WHERE o_custkey NOT IN
      |   (SELECT c_custkey FROM customer)) AS order_orphans,
      | (SELECT count(*) FROM customer WHERE c_nationkey NOT IN
      |   (SELECT n_nationkey FROM nation)) AS customer_orphans""".stripMargin

  /** Statistical aggregates: sample stddev/variance, Pearson
    * correlation, covariance. */
  def qStatsAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        round(stddev_samp($"l_quantity"), 4).as("sd_qty"),
        round(var_samp($"l_discount"), 6).as("var_disc"),
        round(corr($"l_quantity", $"l_extendedprice"), 4).as("corr_qty_price"),
        round(covar_samp($"l_quantity", $"l_extendedprice"), 2).as("cov_qty_price"))
      .orderBy($"l_returnflag")
  }

  val qStatsAggSql: String =
    """SELECT l_returnflag,
      | round(stddev_samp(l_quantity), 4) AS sd_qty,
      | round(var_samp(l_discount), 6) AS var_disc,
      | round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
      | round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qty_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Exact decimal aggregation: casting to DECIMAL(18,2) BEFORE summing
    * makes the arithmetic associative and exact — the deterministic
    * alternative to rounding double sums, and the fidelity contract for
    * Oracle NUMBER(p,s) columns (SURVEY §7.4.3). The exact sums are
    * emitted as strings because the engines widen sum(DECIMAL(18,s))
    * differently (Spark DECIMAL(28,s), DuckDB DECIMAL(38,s)) and the
    * driver's hash is sensitive to the physical decimal width; the
    * digit string is identical and keeps full exactness. */
  def qDecimalAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        sum($"l_extendedprice".cast("decimal(18,2)")).cast("string").as("sum_price_exact"),
        sum($"l_discount".cast("decimal(18,4)")).cast("string").as("sum_disc_exact"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  val qDecimalAggSql: String =
    """SELECT l_returnflag,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS sum_price_exact,
      | CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS sum_disc_exact,
      | count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** CASE-based segmentation: price bands with conditional aggregates. */
  def qCaseBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.orders(spark, dir)
      .withColumn("band",
        when($"o_totalprice" < 100000, "low")
          .when($"o_totalprice" < 300000, "mid")
          .otherwise("high"))
      .groupBy($"band")
      .agg(count(lit(1)).as("n"),
        round(min($"o_totalprice"), 2).as("min_p"),
        round(max($"o_totalprice"), 2).as("max_p"))
      .orderBy($"band")
  }

  val qCaseBucketsSql: String =
    """SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
      |            WHEN o_totalprice < 300000 THEN 'mid'
      |            ELSE 'high' END AS band,
      | count(*) AS n, round(min(o_totalprice), 2) AS min_p,
      | round(max(o_totalprice), 2) AS max_p
      |FROM orders GROUP BY 1 ORDER BY band""".stripMargin

  /** String shaping functions: reverse, lpad, translate, trim, repeat. */
  def qStringShape(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.part(spark, dir)
      .filter($"p_partkey" < 100)
      .select(
        $"p_partkey",
        reverse($"p_brand").as("rev"),
        lpad($"p_brand", 12, "*").as("padded"),
        translate($"p_type", "AEO", "430").as("leet"),
        trim(lit("  x  ")).as("trimmed"),
        expr("repeat('-', CAST(p_size % 5 AS INT))").as("dashes"))
      .orderBy($"p_partkey")
  }

  val qStringShapeSql: String =
    """SELECT p_partkey, reverse(p_brand) AS rev, lpad(p_brand, 12, '*') AS padded,
      | translate(p_type, 'AEO', '430') AS leet, trim('  x  ') AS trimmed,
      | repeat('-', p_size % 5) AS dashes
      |FROM part WHERE p_partkey < 100 ORDER BY p_partkey""".stripMargin

  /** first_value / last_value over an explicit full-partition frame. */
  def qWindowFirstLast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    T.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey",
        first($"o_orderkey").over(w).as("first_order"),
        last($"o_orderkey").over(w).as("last_order"))
      .orderBy($"o_orderkey")
  }

  val qWindowFirstLastSql: String =
    """SELECT o_custkey, o_orderkey,
      | first_value(o_orderkey) OVER w AS first_order,
      | last_value(o_orderkey) OVER w AS last_order
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderkey""".stripMargin

  /** Deterministic argmax via struct ordering: max(struct(value, key))
    * compares fields lexicographically in both engines, so ties on the
    * value resolve by key — no nondeterministic max_by. */
  def qArgmax(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.orders(spark, dir)
      .groupBy($"o_orderstatus")
      .agg(max(struct($"o_totalprice".as("p"), $"o_orderkey".as("k"))).as("m"))
      .select($"o_orderstatus",
        round($"m.p", 2).as("best_price"), $"m.k".as("best_key"))
      .orderBy($"o_orderstatus")
  }

  val qArgmaxSql: String =
    """SELECT o_orderstatus, round(m['p'], 2) AS best_price, m['k'] AS best_key
      |FROM (SELECT o_orderstatus, max({'p': o_totalprice, 'k': o_orderkey}) AS m
      |      FROM orders GROUP BY o_orderstatus)
      |ORDER BY o_orderstatus""".stripMargin

  /** Mode (most frequent value) per group, deterministic tie-break by
    * value — two hash aggregates plus a ranking window. */
  def qMode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = T.lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_quantity")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"l_returnflag").orderBy(desc("n"), asc("l_quantity"))
    counts.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"l_returnflag", $"l_quantity".as("mode_qty"), $"n")
      .orderBy($"l_returnflag")
  }

  val qModeSql: String =
    """SELECT l_returnflag, l_quantity AS mode_qty, n FROM (
      |  SELECT l_returnflag, l_quantity, count(*) AS n,
      |    row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY count(*) DESC, l_quantity) AS rn
      |  FROM lineitem GROUP BY l_returnflag, l_quantity)
      |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin

  /** Event-sequence transition matrix: counts of consecutive event-type
    * pairs per user timeline (Markov-chain estimation input). */
  def qTransitions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    T.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("us"))
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"from_type", $"to_type")
  }

  val qTransitionsSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type, epoch_ns(ts)//1000 AS us FROM events),
      |seq AS (SELECT event_type,
      |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS next_type
      |  FROM e)
      |SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
      |FROM seq WHERE next_type IS NOT NULL
      |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin

  /** Full outer join: customer vs supplier presence per nation key —
    * nations with only one side populated survive with zero-filled
    * counts. */
  def qOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = T.customer(spark, dir).groupBy($"c_nationkey".as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val s = T.supplier(spark, dir).groupBy($"s_nationkey".as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(s, Seq("nationkey"), "full_outer")
      .select($"nationkey",
        coalesce($"n_cust", lit(0L)).as("n_cust"),
        coalesce($"n_supp", lit(0L)).as("n_supp"))
      .orderBy($"nationkey")
  }

  val qOuterJoinSql: String =
    """WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust FROM customer GROUP BY 1),
      |s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp FROM supplier GROUP BY 1)
      |SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
      | coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
      |FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
      |ORDER BY nationkey""".stripMargin

  /** Date arithmetic: quarter bucketing, interval shifting, weekday
    * distribution (Spark weekday == ISO dow - 1). */
  def qDateArith(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.orders(spark, dir)
      .withColumn("q", date_format(date_trunc("quarter", $"o_orderdate"), "yyyy-MM-dd"))
      .withColumn("due", date_format($"o_orderdate" + expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"))
      .withColumn("wd", weekday($"o_orderdate"))
      .groupBy($"q")
      .agg(count(lit(1)).as("n"),
        round(avg($"wd"), 4).as("avg_weekday"),
        max($"due").as("max_due"))
      .orderBy($"q")
  }

  val qDateArithSql: String =
    """SELECT strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS q,
      | count(*) AS n,
      | round(avg(isodow(o_orderdate) - 1), 4) AS avg_weekday,
      | max(strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')) AS max_due
      |FROM orders GROUP BY 1 ORDER BY q""".stripMargin

  /** Ordered string aggregation: nations per region as a sorted
    * comma-joined list (deterministic listagg via
    * array_join(array_sort(collect_list))). */
  def qCollectAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.nation(spark, dir)
      .join(broadcast(T.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(
        expr("array_join(array_sort(collect_list(n_name)), ',')").as("nations"),
        count(lit(1)).as("n"))
      .orderBy($"r_name")
  }

  val qCollectAggSql: String =
    """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations, count(*) AS n
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** Day-over-day retention: users active on day d who return on d+1. */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val days = T.events(spark, dir)
      .select($"user_id", (unix_micros($"ts") / lit(86400000000L)).cast("long").as("day"))
      .distinct()
    days.as("d0")
      .join(days.as("d1"),
        $"d0.user_id" === $"d1.user_id" && $"d1.day" === $"d0.day" + 1)
      .groupBy($"d0.day".as("day"))
      .agg(countDistinct($"d0.user_id").as("retained"))
      .join(days.groupBy($"day").agg(countDistinct($"user_id").as("active")), Seq("day"))
      .withColumn("retention", round($"retained".cast("double") / $"active", 4))
      .select($"day", $"active", $"retained", $"retention")
      .orderBy($"day")
  }

  val qRetentionSql: String =
    """WITH days AS (SELECT DISTINCT user_id, epoch_ns(ts)//1000 // 86400000000 AS day FROM events),
      |ret AS (SELECT d0.day, count(DISTINCT d0.user_id) AS retained
      |  FROM days d0 JOIN days d1 ON d0.user_id = d1.user_id AND d1.day = d0.day + 1
      |  GROUP BY d0.day),
      |act AS (SELECT day, count(DISTINCT user_id) AS active FROM days GROUP BY day)
      |SELECT day, active, retained, round(retained::DOUBLE / active, 4) AS retention
      |FROM ret JOIN act USING (day) ORDER BY day""".stripMargin

  /** Fixed-width value histogram over events.value. */
  def qHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.events(spark, dir)
      .withColumn("bin", floor($"value" / 10.0).cast("long"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"), round(avg($"value"), 4).as("avg_v"))
      .orderBy($"bin")
  }

  val qHistogramSql: String =
    """SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin, count(*) AS n,
      | round(avg(value), 4) AS avg_v
      |FROM events GROUP BY 1 ORDER BY bin""".stripMargin

  /** NULL semantics: nullif/coalesce/null-safe aggregation over derived
    * nulls (count ignores nulls, count(*) does not; sums skip nulls). */
  def qNullSemantics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.orders(spark, dir)
      .withColumn("maybe", when($"o_orderkey" % 5 === 0, lit(null).cast("double"))
        .otherwise($"o_totalprice"))
      .groupBy($"o_orderstatus")
      .agg(
        count(lit(1)).as("n_rows"),
        count($"maybe").as("n_nonnull"),
        round(sum($"maybe"), 2).as("sum_nonnull"),
        round(sum(coalesce($"maybe", lit(0.0))), 2).as("sum_coalesced"),
        count(when($"maybe".isNull, 1)).as("n_null"))
      .orderBy($"o_orderstatus")
  }

  val qNullSemanticsSql: String =
    """WITH t AS (SELECT o_orderstatus,
      |  CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice END AS maybe
      |  FROM orders)
      |SELECT o_orderstatus, count(*) AS n_rows, count(maybe) AS n_nonnull,
      | round(sum(maybe), 2) AS sum_nonnull,
      | round(sum(coalesce(maybe, 0.0)), 2) AS sum_coalesced,
      | count(CASE WHEN maybe IS NULL THEN 1 END) AS n_null
      |FROM t GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Z-score outlier detection: per-event-type mean/stddev, then flag
    * events more than 3 sigma from their group mean. The group stats
    * are a 1-row-per-type aggregate broadcast back onto the stream —
    * the fact table is scanned twice but never shuffled on a skewed
    * key, so the plan is a map-side join at any scale. */
  def qAnomalyZscore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = T.events(spark, dir)
    val stats = e.groupBy($"event_type")
      .agg(avg($"value").as("m"), stddev($"value").as("sd"))
    val z = ($"value" - $"m") / $"sd"
    e.join(broadcast(stats), Seq("event_type"))
      .filter(abs(z) > 3)
      .select($"event_id", $"event_type", round($"value", 2).as("value"),
        round(z, 4).as("z"))
      .orderBy($"event_id")
  }

  val qAnomalyZscoreSql: String =
    """WITH e AS (SELECT event_id, event_type, value FROM events),
      |s AS (SELECT event_type, avg(value) AS m, stddev(value) AS sd
      |  FROM e GROUP BY event_type)
      |SELECT event_id, event_type, round(value, 2) AS value,
      | round((value - m) / sd, 4) AS z
      |FROM e JOIN s USING (event_type)
      |WHERE abs((value - m) / sd) > 3 ORDER BY event_id""".stripMargin

  /** 7-day rolling revenue per order priority. The scale trick is
    * grain reduction BEFORE the window: the fact table collapses to
    * one row per (priority, day) with an ordinary partial-combined
    * aggregate, and the range-frame window then runs over that tiny
    * relation — never over raw fact rows. */
  def qRolling7d(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = T.orders(spark, dir)
      .groupBy($"o_orderpriority",
        datediff(to_date($"o_orderdate"), lit("1970-01-01")).as("day_num"))
      .agg(sum($"o_totalprice").as("day_total"), count(lit(1)).as("n_orders"))
    val w = Window.partitionBy($"o_orderpriority").orderBy($"day_num")
      .rangeBetween(-6, 0)
    daily
      .select($"o_orderpriority", $"day_num",
        round($"day_total", 2).as("day_total"), $"n_orders",
        round(sum($"day_total").over(w), 2).as("roll_7d_total"),
        sum($"n_orders").over(w).as("roll_7d_orders"))
      .orderBy($"o_orderpriority", $"day_num")
  }

  val qRolling7dSql: String =
    """WITH daily AS (SELECT o_orderpriority,
      |  date_diff('day', DATE '1970-01-01', o_orderdate::DATE) AS day_num,
      |  sum(o_totalprice) AS day_total, count(*) AS n_orders
      |  FROM orders GROUP BY 1, 2)
      |SELECT o_orderpriority, day_num, round(day_total, 2) AS day_total,
      | n_orders,
      | round(sum(day_total) OVER w, 2) AS roll_7d_total,
      | (sum(n_orders) OVER w)::BIGINT AS roll_7d_orders
      |FROM daily
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day_num
      |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderpriority, day_num""".stripMargin

  /** Full quantile profile (p25/p50/p75/p90/p99) of extended price per
    * return flag, one row per (flag, quantile). The interpolated
    * values come from [[Quantiles.exact]] — bucketed rank location
    * with bit-identical `quantile_cont` interpolation, bounded memory
    * at any group size — replacing the exact-`percentile` value
    * buffer this query shipped with through round 6. */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // 4-dp rounding, not 2: an even-count quantile interpolates to an
    // exact half-cent (.xx5) — a 2-dp round midpoint where a last-ulp
    // difference between engines flips the cent (seen at sf0.001)
    Quantiles.exact(
        T.lineitem(spark, dir).select($"l_returnflag", $"l_extendedprice"),
        Seq("l_returnflag"), "l_extendedprice",
        Seq(0.25, 0.5, 0.75, 0.9, 0.99))
      .select($"l_returnflag", $"p".as("q"), round($"q", 4).as("q_value"))
      .orderBy($"l_returnflag", $"q")
  }

  val qPercentilesSql: String =
    """WITH agg AS (SELECT l_returnflag,
      |  quantile_cont(l_extendedprice, [0.25, 0.5, 0.75, 0.9, 0.99]) AS qs
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, p AS q, round(qs[i], 4) AS q_value
      |FROM agg, (SELECT unnest([1,2,3,4,5]) AS i,
      |           unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS p)
      |ORDER BY l_returnflag, q""".stripMargin

  /** Self-verifying audit of the `percentile_approx` sketch — the
    * bounded-memory quantile path that replaces exact `percentile` at
    * 100 TB. For each (return flag, q) the sketch value's TRUE rank is
    * recomputed exactly, and the row reports whether it honors the
    * sketch's rank-error contract (|rank - q*n| <= 2n/accuracy). The
    * oracle is the expected constant relation — the same
    * verification trick as the Bloom decontamination false-positive
    * audit: a hash match IS the proof the sketch met its guarantee. */
  def qApproxQuantileAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val acc = 1000
    val li = T.lineitem(spark, dir).select($"l_returnflag", $"l_extendedprice")
    val approx = li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        percentile_approx($"l_extendedprice",
          array(lit(0.5), lit(0.9)), lit(acc)).as("vs"))
      .select($"l_returnflag", $"n", posexplode($"vs").as(Seq("i", "v")))
      .withColumn("q", element_at(lit(Array(0.5, 0.9)), $"i" + 1))
      .drop("i")
    li.join(broadcast(approx), Seq("l_returnflag"))
      .groupBy($"l_returnflag", $"q", $"n")
      .agg(sum(when($"l_extendedprice" <= $"v", 1L).otherwise(0L)).as("rank"))
      .select($"l_returnflag", $"q",
        (abs($"rank" - $"q" * $"n") <= lit(2.0) * $"n" / acc).as("within_bound"))
      .orderBy($"l_returnflag", $"q")
  }

  val qApproxQuantileAuditSql: String =
    """SELECT l_returnflag, q, true AS within_bound
      |FROM (SELECT DISTINCT l_returnflag FROM lineitem),
      |     (SELECT unnest([0.5, 0.9]) AS q)
      |ORDER BY l_returnflag, q""".stripMargin

  /** Salted skewed-key join, registered end-to-end: every `orders` row
    * joins a 5-row priority dimension, so each key carries ~20% of the
    * fact table — the hot-key profile where a plain shuffle join piles
    * one key's rows onto one reducer. [[Skew.saltedJoin]] spreads each
    * key over 8 salt values (the dim is replicated 8x, still tiny) and
    * the post-join aggregate partial-combines map-side, so no single
    * task ever holds a whole hot key. Same rows as the plain join;
    * ScaleSpec asserts both the equality and the salt-explode plan. */
  /** Bloom semi-join reduction — the 100 TB join technique where a
    * compact Bloom sketch of the selective build side (urgent orders,
    * ~20 % of keys) broadcasts to the fact scan and drops non-matching
    * rows BEFORE the join shuffle; the exact equi-join afterwards
    * removes the sketch's false positives, so the result is
    * bit-identical to the plain join (which is exactly what the
    * oracle runs). The sketch is one 512 KiB (2^22-bit) mergeable aggregate
    * ([[graft.functions.Aggregators.bloomSketch]]); the probe is the
    * codegen'd [[graft.functions.F.bloomMightContain]] projection —
    * zero shuffle added, shuffle volume cut to the semi-join's
    * survivors. Spark 4 can inject this automatically
    * (spark.sql.optimizer.runtime.bloomFilter.enabled); this operator
    * is the explicit, always-on form a pipeline uses when it KNOWS the
    * build side is selective. */
  def qBloomSemiReduction(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val urgent = T.orders(spark, dir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey", date_format($"o_orderdate", "yyyy-MM").as("mon"))
    val bloom = urgent.select(xxhash64($"o_orderkey").as("h"))
      .agg(graft.functions.Aggregators.bloomSketch(1 << 22, 5)($"h").as("bloom"))
    val reduced = T.lineitem(spark, dir)
      .select($"l_orderkey", round($"l_extendedprice" * 100).cast("long").as("c"))
      .crossJoin(broadcast(bloom))
      .filter(graft.functions.F.bloomMightContain($"bloom", xxhash64($"l_orderkey"), 5))
      .drop("bloom")
    reduced.join(urgent, $"l_orderkey" === $"o_orderkey")
      .groupBy($"mon")
      .agg(count(lit(1)).as("n_items"),
        round(sum($"c") / 100.0, 2).as("revenue"))
      .orderBy($"mon")
  }

  val qBloomSemiReductionSql: String =
    """SELECT strftime(o_orderdate, '%Y-%m') AS mon, count(*) AS n_items,
      |  round(CAST(sum(round(l_extendedprice * 100)::BIGINT) AS BIGINT) / 100.0, 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY 1 ORDER BY mon""".stripMargin

  def qSkewJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = T.orders(spark, dir)
    val dim = orders.select($"o_orderpriority".as("d_priority")).distinct()
      .withColumn("d_urgency", substring($"d_priority", 1, 1).cast("int"))
    Skew.saltedJoin(orders, dim, "o_orderpriority", "d_priority", salts = 8)
      .groupBy($"d_urgency", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("sum_price"))
      .orderBy($"d_urgency")
  }

  val qSkewJoinSql: String =
    """WITH d AS (SELECT DISTINCT o_orderpriority AS d_priority,
      |  substr(o_orderpriority, 1, 1)::INT AS d_urgency FROM orders)
      |SELECT d_urgency, o_orderpriority, count(*) AS n,
      | round(sum(o_totalprice), 2) AS sum_price
      |FROM orders JOIN d ON o_orderpriority = d_priority
      |GROUP BY 1, 2 ORDER BY d_urgency""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q1_pricing_summary", q1PricingSummary, Some(q1PricingSummarySql)),
    QueryDef("q3_shipping_priority", q3ShippingPriority, Some(q3ShippingPrioritySql)),
    QueryDef("q5_local_supplier", q5LocalSupplier, Some(q5LocalSupplierSql)),
    QueryDef("q8_market_share", q8MarketShare, Some(q8MarketShareSql)),
    QueryDef("q_semi_join", qSemiJoin, Some(qSemiJoinSql)),
    QueryDef("q_anti_join", qAntiJoin, Some(qAntiJoinSql)),
    QueryDef("q_topk_per_group", qTopkPerGroup, Some(qTopkPerGroupSql)),
    QueryDef("q_window_analytics", qWindowAnalytics, Some(qWindowAnalyticsSql)),
    QueryDef("q_window_range", qWindowRange, Some(qWindowRangeSql)),
    QueryDef("q_window_ranks", qWindowRanks, Some(qWindowRanksSql)),
    QueryDef("q_rollup", qRollup, Some(qRollupSql)),
    QueryDef("q_cube", qCube, Some(qCubeSql)),
    QueryDef("q_set_ops", qSetOps, Some(qSetOpsSql)),
    QueryDef("q_set_ops_all", qSetOpsAll, Some(qSetOpsAllSql)),
    QueryDef("q_union_drift", qUnionDrift, Some(qUnionDriftSql)),
    QueryDef("q_distinct_counts", qDistinctCounts, Some(qDistinctCountsSql)),
    QueryDef("q_approx_distinct", qApproxDistinct, None),
    QueryDef("q_asof_tolerance", qAsofTolerance, Some(qAsofToleranceSql)),
    QueryDef("q_approx_distinct_audit", qApproxDistinctAudit, Some(qApproxDistinctAuditSql)),
    QueryDef("q_hll_union_audit", qHllUnionAudit, Some(qHllUnionAuditSql)),
    QueryDef("q_kll_quantile_audit", qKllQuantileAudit, Some(qKllQuantileAuditSql)),
    QueryDef("q_asof_join", qAsofJoin, Some(qAsofJoinSql)),
    QueryDef("q_asof_native", qAsofNative, Some(qAsofNativeSql)),
    QueryDef("q_range_join", qRangeJoin, Some(qRangeJoinSql)),
    QueryDef("q_json_extract", qJsonExtract, Some(qJsonExtractSql)),
    QueryDef("q_scalar_funcs", qScalarFuncs, Some(qScalarFuncsSql)),
    QueryDef("q_date_agg", qDateAgg, Some(qDateAggSql)),
    QueryDef("q_gapfill", qGapFill, Some(qGapFillSql)),
    QueryDef("q_global_sort", qGlobalSort, Some(qGlobalSortSql)),
    QueryDef("q_global_rank", qGlobalRank, Some(qGlobalRankSql)),
    QueryDef("q_regex_filter", qRegexFilter, Some(qRegexFilterSql)),
    QueryDef("q_pivot", qPivot, Some(qPivotSql)),
    QueryDef("q_grouping_sets", qGroupingSets, Some(qGroupingSetsSql)),
    QueryDef("q_median", qMedian, Some(qMedianSql)),
    QueryDef("q_geomean", qGeoMean, Some(qGeoMeanSql)),
    QueryDef("q_correlated", qCorrelated, Some(qCorrelatedSql)),
    QueryDef("q_funnel", qFunnel, Some(qFunnelSql)),
    QueryDef("q_edit_distance", qEditDistance, Some(qEditDistanceSql)),
    QueryDef("q_retention", qRetention, Some(qRetentionSql)),
    QueryDef("q_histogram", qHistogram, Some(qHistogramSql)),
    QueryDef("q_null_semantics", qNullSemantics, Some(qNullSemanticsSql)),
    QueryDef("q_collect_agg", qCollectAgg, Some(qCollectAggSql)),
    QueryDef("q_outer_join", qOuterJoin, Some(qOuterJoinSql)),
    QueryDef("q_date_arith", qDateArith, Some(qDateArithSql)),
    QueryDef("q_integrity_audit", qIntegrityAudit, Some(qIntegrityAuditSql)),
    QueryDef("q_stats_agg", qStatsAgg, Some(qStatsAggSql)),
    QueryDef("q_mode", qMode, Some(qModeSql)),
    QueryDef("q_argmax", qArgmax, Some(qArgmaxSql)),
    QueryDef("q_case_buckets", qCaseBuckets, Some(qCaseBucketsSql)),
    QueryDef("q_decimal_agg", qDecimalAgg, Some(qDecimalAggSql)),
    QueryDef("q_string_shape", qStringShape, Some(qStringShapeSql)),
    QueryDef("q_window_firstlast", qWindowFirstLast, Some(qWindowFirstLastSql)),
    QueryDef("q_transitions", qTransitions, Some(qTransitionsSql)),
    QueryDef("q_anomaly_zscore", qAnomalyZscore, Some(qAnomalyZscoreSql)),
    QueryDef("q_rolling_7d", qRolling7d, Some(qRolling7dSql)),
    QueryDef("q_percentiles", qPercentiles, Some(qPercentilesSql)),
    QueryDef("q_approx_quantile_audit", qApproxQuantileAudit, Some(qApproxQuantileAuditSql)),
    QueryDef("q_skew_join", qSkewJoin, Some(qSkewJoinSql)),
    QueryDef("q_bloom_semi_reduction", qBloomSemiReduction, Some(qBloomSemiReductionSql)),
    QueryDef("q_skew_diag",
      (s: SparkSession, d: String) =>
        Skew.keyHistogram(T.lineitem(s, d), org.apache.spark.sql.functions.col("l_suppkey"), 20),
      Some("""SELECT l_suppkey AS key, count(*) AS n FROM lineitem
             |GROUP BY l_suppkey ORDER BY n DESC, key LIMIT 20""".stripMargin)),
  )
}
