package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-analytics operator family: reshaping (unpivot), null-safe
  * keys, batch sessionization, SCD2 history rebuild, decile/lift
  * profiling, time-series autocorrelation, robust dispersion (MAD) and
  * exponentially weighted smoothing. All are classic downstream-
  * analytics shapes a user of the exported Parquet runs daily; none
  * exist in the reference (its only operator surface is the export
  * pipeline itself, reference: src/oracle_parquet_exporter/
  * main.py:129-189), so like the rest of Tier B they are north-star
  * engine surface, each with a DuckDB oracle twin.
  */
object Analytics extends QueryFamily {

  /** Wide-to-long reshape via native `unpivot` (Spark's melt): a
    * per-status metrics table (count / revenue / avg price) becomes
    * (status, metric, val) rows. Unpivot is a zero-shuffle projection
    * — each input row expands to k output rows map-side — so it
    * composes freely at any scale; the only cost is the upstream
    * aggregate. */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wide = T.orders(spark, dir)
      .groupBy($"o_orderstatus")
      .agg(
        count(lit(1)).cast("double").as("n_orders"),
        round(sum($"o_totalprice"), 2).as("revenue"),
        round(avg($"o_totalprice"), 4).as("avg_price"))
    wide.unpivot(
        Array($"o_orderstatus"),
        Array($"n_orders", $"revenue", $"avg_price"),
        "metric", "val")
      .orderBy($"o_orderstatus", $"metric")
  }

  val qUnpivotSql: String =
    """WITH wide AS (
      |  SELECT o_orderstatus, count(*)::DOUBLE AS n_orders,
      |         round(sum(o_totalprice), 2) AS revenue,
      |         round(avg(o_totalprice), 4) AS avg_price
      |  FROM orders GROUP BY o_orderstatus)
      |SELECT o_orderstatus, metric, val FROM (
      |  SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS val FROM wide
      |  UNION ALL
      |  SELECT o_orderstatus, 'revenue', revenue FROM wide
      |  UNION ALL
      |  SELECT o_orderstatus, 'avg_price', avg_price FROM wide)
      |ORDER BY o_orderstatus, metric""".stripMargin

  /** Null-safe equi-join (`<=>`): both sides bucket orders by a
    * derived key that is NULL for urgent orders, and the join must
    * match the NULL buckets to each other — the semantic SQL `=` can
    * never express (NULL = NULL is NULL). Spark plans `<=>` as a
    * regular hash join with a null-safe comparator, so the shape keeps
    * every scale property of a plain equi-join. */
  def qNullsafeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def side(parity: Int, outName: String): DataFrame =
      T.orders(spark, dir)
        .filter($"o_orderkey" % 2 === parity)
        .withColumn("k",
          when($"o_orderpriority" === "1-URGENT", lit(null).cast("string"))
            .otherwise($"o_orderpriority"))
        .groupBy($"k").agg(count(lit(1)).as(outName))
    val even = side(0, "n_even")
    val odd = side(1, "n_odd").withColumnRenamed("k", "k2")
    even.join(odd, $"k" <=> $"k2")
      .select($"k".as("priority_key"), $"n_even", $"n_odd")
      .orderBy($"priority_key".asc_nulls_first)
  }

  val qNullsafeJoinSql: String =
    """WITH e AS (
      |  SELECT nullif(o_orderpriority, '1-URGENT') AS k, count(*) AS n_even
      |  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1),
      |o AS (
      |  SELECT nullif(o_orderpriority, '1-URGENT') AS k, count(*) AS n_odd
      |  FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1)
      |SELECT e.k AS priority_key, n_even, n_odd
      |FROM e JOIN o ON e.k IS NOT DISTINCT FROM o.k
      |ORDER BY priority_key NULLS FIRST""".stripMargin

  /** Batch gap-based sessionization: a new session starts after a
    * > 30 min silence in a user's event stream. One window pass keyed
    * on user_id computes the new-session flags and their running sum
    * (the session id), then a hash aggregate rolls sessions up. The
    * partition key is the user — millions of small partitions, never
    * one big one — which is exactly how this shape stays healthy at
    * 100 TB (contrast a global ORDER BY sessionizer). Durations stay
    * in integer microseconds: exact in both engines, no FP rounding
    * boundary. */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val gapUs = 1800000000L // 30 min
    T.events(spark, dir)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
      .withColumn("flag",
        when(coalesce($"us" - lag($"us", 1).over(w), lit(gapUs + 1)) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum($"flag").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"), (max($"us") - min($"us")).as("dur_us"))
      .orderBy($"user_id", $"session_id")
  }

  val qSessionizeSql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_ns(ts)//1000 AS us FROM events),
      |f AS (SELECT user_id, us,
      |  CASE WHEN coalesce(us - lag(us, 1) OVER
      |         (PARTITION BY user_id ORDER BY us, event_id), 1800000001)
      |       > 1800000000 THEN 1 ELSE 0 END AS flag,
      |  event_id FROM e),
      |s AS (SELECT user_id, us,
      |  CAST(sum(flag) OVER (PARTITION BY user_id ORDER BY us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM f)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  max(us) - min(us) AS dur_us
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** SCD Type-2 history rebuild: treat each customer's order stream as
    * a priority change log and reconstruct versioned validity
    * intervals — keep only rows where the priority differs from the
    * previous one, then close each version with the next version's
    * start (lead). Two window passes over the same per-customer
    * partitioning, so the second reuses the first's shuffle (one
    * exchange in the plan). The canonical lakehouse dimension-history
    * shape. */
  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val changes = T.orders(spark, dir)
      .select($"o_custkey", $"o_orderpriority", $"o_orderdate", $"o_orderkey")
      .withColumn("prev", lag($"o_orderpriority", 1).over(w))
      .filter($"prev".isNull || $"prev" =!= $"o_orderpriority")
    val w2 = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    changes
      .withColumn("next_from", lead($"o_orderdate", 1).over(w2))
      .select(
        $"o_custkey",
        $"o_orderpriority",
        date_format($"o_orderdate", "yyyy-MM-dd").as("valid_from"),
        date_format($"next_from", "yyyy-MM-dd").as("valid_to"),
        when($"next_from".isNull, 1).otherwise(0).as("is_current"))
      .orderBy($"o_custkey", $"valid_from")
  }

  val qScd2Sql: String =
    """WITH chg AS (
      |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
      |    lag(o_orderpriority, 1) OVER
      |      (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
      |  FROM orders),
      |vers AS (
      |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
      |    lead(o_orderdate, 1) OVER
      |      (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_from
      |  FROM chg WHERE prev IS NULL OR prev <> o_orderpriority)
      |SELECT o_custkey, o_orderpriority,
      |  strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
      |  strftime(next_from, '%Y-%m-%d') AS valid_to,
      |  CASE WHEN next_from IS NULL THEN 1 ELSE 0 END AS is_current
      |FROM vers ORDER BY o_custkey, valid_from""".stripMargin

  /** Point-in-time (temporal validity) join: every lineitem resolves
    * the customer's priority version that was valid AT ITS SHIP DATE
    * against the [[qScd2]]-style change log — the lakehouse question
    * "what did the dimension say when the fact happened", answered
    * without materializing a day-grain snapshot table. ISO-formatted
    * dates compare lexicographically so the ordering stays a plain
    * string comparison on both engines. Each key's FIRST version opens
    * at -infinity ('0000-01-01') — the standard SCD2 clamp, so facts
    * predating recorded history (the fixture ships 47% of items before
    * their order date) still resolve and every fact matches exactly
    * one version, spec-asserted. The oracle keeps the equivalent
    * interval-containment formulation (valid_from <= ship < valid_to),
    * with the same o_orderkey tiebreak in its version ordering. */
  def qTemporalJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // As-of UNION+WINDOW encoding (the q_attribution pattern), not an
    // interval-residual join: at high versions-per-customer the
    // residual join fans each fact out over all same-key versions
    // before filtering; here dim change-events and fact events merge
    // into ONE custkey-partitioned window and each fact reads the last
    // version at-or-before its ship date — one shuffle on custkey,
    // zero fan-out. Ordering is (date, kind, o_orderkey): dim events
    // sort before same-day facts (valid_from is inclusive), and the
    // o_orderkey tiebreak makes same-day version order deterministic
    // on both engines.
    val wLog = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val dimEvents = T.orders(spark, dir)
      .select($"o_custkey", $"o_orderpriority", $"o_orderdate", $"o_orderkey")
      .withColumn("prev", lag($"o_orderpriority", 1).over(wLog))
      .filter($"prev".isNull || $"prev" =!= $"o_orderpriority")
      .withColumn("vn", row_number().over(wLog))
      .select($"o_custkey",
        // first version opens at -infinity: the standard SCD2 clamp
        when($"vn" === 1, lit("0000-01-01"))
          .otherwise(date_format($"o_orderdate", "yyyy-MM-dd")).as("at"),
        lit(0).as("kind"), $"o_orderkey".as("seq"),
        $"o_orderpriority".as("prio"), lit(null).cast("double").as("l_extendedprice"))
    val factEvents = T.lineitem(spark, dir)
      .join(T.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey",
        date_format($"l_shipdate", "yyyy-MM-dd").as("at"),
        lit(1).as("kind"), $"l_orderkey".as("seq"),
        lit(null).cast("string").as("prio"), $"l_extendedprice")
    val wAsof = Window.partitionBy($"o_custkey").orderBy($"at", $"kind", $"seq")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dimEvents.unionByName(factEvents)
      .withColumn("prio_at_ship", last($"prio", ignoreNulls = true).over(wAsof))
      .filter($"kind" === 1)
      .groupBy($"prio_at_ship")
      .agg(count(lit(1)).as("n_items"),
        round(sum($"l_extendedprice"), 2).as("revenue"))
      .orderBy($"prio_at_ship")
  }

  val qTemporalJoinSql: String =
    """WITH chg AS (
      |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
      |    lag(o_orderpriority, 1) OVER
      |      (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
      |  FROM orders),
      |vers AS (
      |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
      |    lead(o_orderdate, 1) OVER
      |      (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_from
      |  FROM chg WHERE prev IS NULL OR prev <> o_orderpriority),
      |dim AS (
      |  SELECT o_custkey AS d_custkey, o_orderpriority AS prio_at_ship,
      |    CASE WHEN row_number() OVER (PARTITION BY o_custkey
      |           ORDER BY o_orderdate, o_orderkey) = 1
      |      THEN '0000-01-01' ELSE strftime(o_orderdate, '%Y-%m-%d') END
      |      AS valid_from,
      |    strftime(next_from, '%Y-%m-%d') AS valid_to
      |  FROM vers),
      |fact AS (
      |  SELECT o.o_custkey, strftime(l.l_shipdate, '%Y-%m-%d') AS ship,
      |    l.l_extendedprice
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
      |SELECT prio_at_ship, count(*) AS n_items,
      |  round(sum(l_extendedprice), 2) AS revenue
      |FROM fact JOIN dim ON o_custkey = d_custkey
      |  AND ship >= valid_from AND (valid_to IS NULL OR ship < valid_to)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Decile/lift profile: rank (nation, segment) cohorts by average
    * account balance into ntile(10) deciles, then aggregate customers
    * and balance per decile. ntile needs a total order — a global
    * window — so the input is GRAIN-REDUCED first: the window runs over
    * the ~|nations|x|segments| aggregate, never the raw customer table
    * (the same discipline as q_rolling_7d). Money flows through the
    * whole query as integer CENTS: FP summation order (which varies
    * with DuckDB's own thread scheduling, not just across engines)
    * once flipped a 4dp-rounded average sitting exactly on a rounding
    * boundary — integer sums have no boundary to sit on. The ordering
    * key is the one double (a single IEEE division of two exact
    * integers, deterministic), tie-broken by the group keys. */
  def qDecileLift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cohorts = T.customer(spark, dir)
      .groupBy($"c_nationkey", $"c_mktsegment")
      .agg(
        sum(round($"c_acctbal" * 100).cast("long")).as("bal_cents"),
        count(lit(1)).as("n_cust"))
    val w = Window.orderBy(
      ($"bal_cents".cast("double") / $"n_cust").asc,
      $"c_nationkey", $"c_mktsegment")
    cohorts
      .withColumn("decile", ntile(10).over(w))
      .groupBy($"decile")
      .agg(
        count(lit(1)).as("n_cohorts"),
        sum($"n_cust").as("n_cust"),
        sum($"bal_cents").as("bal_cents"))
      .orderBy($"decile")
  }

  val qDecileLiftSql: String =
    """WITH cohorts AS (
      |  SELECT c_nationkey, c_mktsegment,
      |         CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents,
      |         count(*) AS n_cust
      |  FROM customer GROUP BY 1, 2),
      |ranked AS (
      |  SELECT *, ntile(10) OVER (ORDER BY bal_cents::DOUBLE / n_cust,
      |                            c_nationkey, c_mktsegment) AS decile
      |  FROM cohorts)
      |SELECT decile, count(*) AS n_cohorts, sum(n_cust)::BIGINT AS n_cust,
      |  CAST(sum(bal_cents) AS BIGINT) AS bal_cents
      |FROM ranked GROUP BY decile ORDER BY decile""".stripMargin

  /** Lag-1 autocorrelation of the daily revenue series: is today's
    * revenue predictive of tomorrow's? Grain-reduced like the decile
    * profile — the fact table collapses to one row per day FIRST (hash
    * aggregate, scales), and only the tiny daily series flows through
    * the global lag window and the corr aggregate. Pearson correlation
    * is normalization-invariant, so sample-vs-population conventions
    * cannot diverge between engines. */
  def qAutocorr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = T.orders(spark, dir)
      .groupBy(date_format(date_trunc("day", $"o_orderdate"), "yyyy-MM-dd").as("day"))
      .agg(sum($"o_totalprice").as("rev"))
    val w = Window.orderBy($"day")
    daily
      .withColumn("prev", lag($"rev", 1).over(w))
      .agg(
        count($"prev").as("n_pairs"),
        round(corr($"rev", $"prev"), 4).as("autocorr_lag1"))
  }

  val qAutocorrSql: String =
    """WITH daily AS (
      |  SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS day,
      |         sum(o_totalprice) AS rev
      |  FROM orders GROUP BY 1),
      |paired AS (
      |  SELECT rev, lag(rev, 1) OVER (ORDER BY day) AS prev FROM daily)
      |SELECT count(prev) AS n_pairs, round(corr(rev, prev), 4) AS autocorr_lag1
      |FROM paired""".stripMargin

  /** Median absolute deviation per return flag — the robust dispersion
    * statistic outlier gates use where stddev is poisoned by the very
    * outliers being hunted. Two-phase: exact interpolating median per
    * group, broadcast back (3 rows), then the median of absolute
    * deviations.
    *
    * Both medians use BUCKETED RANK LOCATION — the exact-quantile
    * plan that survives wide groups: (1) per-group min/max/count and
    * the two middle target ranks; (2) a 4096-bucket histogram (one
    * map-side-combined hash agg, bounded size); (3) a cumulative-count
    * window over the tiny histogram locates each target's bucket and
    * within-bucket rank; (4) a row_number window sorts ONLY the one
    * located bucket per group (~n/4096 rows) to pull the middle
    * value(s). The average of the selected values is exactly
    * `quantile_cont(0.5)` interpolation. No per-group value buffer
    * (the exact-`percentile` ObjectHashAggregate failure mode) and no
    * full-group sort window (the 3-partition skew failure mode) —
    * deeper groups just recurse the same bucketing one level. */
  def qMad(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val buckets = 4096L
    def exactMedian(src0: DataFrame, key: String, outName: String): DataFrame = {
      val src = src0.cache()
      val stats = src.groupBy(col(key)).agg(
          min($"v").as("vmin"), max($"v").as("vmax"), count(lit(1)).as("n"))
        .withColumn("r1", expr("(n + 1) div 2"))
        .withColumn("r2", expr("(n + 2) div 2"))
        .withColumn("width",
          greatest(($"vmax" - $"vmin") / buckets, lit(1e-12)))
      val bucketed = src.join(broadcast(stats), Seq(key))
        .withColumn("b",
          least(floor(($"v" - $"vmin") / $"width"), lit(buckets - 1)))
      val hist = bucketed.groupBy(col(key), $"b").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col(key)).orderBy($"b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist
        .withColumn("cum_end", sum($"c").over(w))
        .withColumn("cum_start", $"cum_end" - $"c")
      val targets = cum
        .join(broadcast(stats.select(col(key), $"r1", $"r2")), Seq(key))
        .select(col(key), $"b", $"cum_start", $"c",
          explode(array($"r1", $"r2")).as("r"))
        .filter($"r" > $"cum_start" && $"r" <= $"cum_start" + $"c")
        .select(col(key), $"b", ($"r" - $"cum_start").as("k"))
      val wanted = targets.select(col(key), $"b").distinct()
      val wv = Window.partitionBy(col(key), $"b").orderBy($"v")
      bucketed.join(broadcast(wanted), Seq(key, "b"), "left_semi")
        .withColumn("rn", row_number().over(wv))
        .join(broadcast(targets), Seq(key, "b"))
        .filter($"rn" === $"k")
        .groupBy(col(key))
        .agg((sum($"v") / count(lit(1))).as(outName))
    }
    val li = T.lineitem(spark, dir)
    // NOTE (round-16 optimization round, measured and kept as-is): two
    // rejected "optimizations" of this body are documented so they are
    // not retried. (a) Eagerly checkpointing `med` to kill its double
    // computation REGRESSED the bench 2.3 -> 5.2 s: a localCheckpoint
    // mints a fresh RDD per builder call, so every downstream plan
    // (the dev cache) stops matching Spark's plan-keyed cache across
    // the bench's min-of-N runs — the double-compute it removed was
    // already amortized by those caches. (b) Hash-spreading the cached
    // quantile sources cost more in shuffle + extra stages than the
    // wide passes saved at this row count (q_winsorized_mean
    // 1.25 -> 2.50 s).
    val med = exactMedian(
      li.select($"l_returnflag", $"l_extendedprice".as("v")),
      "l_returnflag", "med")
    val dev = li.join(broadcast(med), Seq("l_returnflag"))
      .select($"l_returnflag", abs($"l_extendedprice" - $"med").as("v"))
    exactMedian(dev, "l_returnflag", "mad")
      .join(broadcast(med), Seq("l_returnflag"))
      .select($"l_returnflag",
        round($"med", 4).as("median_price"),
        round($"mad", 4).as("mad"))
      .orderBy($"l_returnflag")
  }

  val qMadSql: String =
    """WITH med AS (
      |  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
      |  FROM lineitem GROUP BY 1)
      |SELECT l.l_returnflag, round(max(med), 4) AS median_price,
      |  round(quantile_cont(abs(l_extendedprice - med), 0.5), 4) AS mad
      |FROM lineitem l JOIN med ON med.l_returnflag = l.l_returnflag
      |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin

  /** Exponentially weighted moving average (alpha = 1/2) of each
    * user's event values over the trailing 8 events, renormalized over
    * the terms that exist near the sequence start. EWMA's recursive
    * definition doesn't window; the bounded-depth expansion does — 8
    * explicit lag terms inside ONE user-keyed window pass, all weights
    * exact powers of two so the scaling itself never rounds. Identical
    * left-to-right association on both engines keeps the FP result
    * bit-equal before the final display rounding. */
  def qEwma(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val terms = 8
    def weight(k: Int): Double = math.pow(0.5, k)
    def termCol(k: Int): Column =
      if (k == 0) $"value" else lag($"value", k).over(w)
    val num: Column = (0 until terms)
      .map(k => coalesce(termCol(k) * lit(weight(k)), lit(0.0)))
      .reduce(_ + _)
    val den: Column = (0 until terms)
      .map(k => when(termCol(k).isNotNull, lit(weight(k))).otherwise(lit(0.0)))
      .reduce(_ + _)
    T.events(spark, dir)
      .select($"user_id", $"event_id", $"value", unix_micros($"ts").as("us"))
      .withColumn("ewma", round(num / den, 4))
      .select($"user_id", $"event_id", $"ewma")
      .orderBy($"user_id", $"event_id")
  }

  val qEwmaSql: String = {
    val terms = 8
    def w = "PARTITION BY user_id ORDER BY us, event_id"
    def weight(k: Int): String = s"${math.pow(0.5, k)}"
    def term(k: Int): String =
      if (k == 0) "value" else s"lag(value, $k) OVER ($w)"
    val num = (0 until terms)
      .map(k => s"coalesce(${term(k)} * ${weight(k)}, 0.0)")
      .mkString(" + ")
    val den = (0 until terms)
      .map(k => s"CASE WHEN ${term(k)} IS NOT NULL THEN ${weight(k)} ELSE 0.0 END")
      .mkString(" + ")
    s"""WITH e AS (SELECT user_id, event_id, value, epoch_ns(ts)//1000 AS us FROM events)
       |SELECT user_id, event_id, round(($num) / ($den), 4) AS ewma
       |FROM e ORDER BY user_id, event_id""".stripMargin
  }

  /** Month-over-month revenue growth: the fact table grain-reduces to
    * one row per month (hash aggregate), then one lag window over the
    * tiny series computes the percent change. Revenue rides as integer
    * cents (exact, order-independent sums); the growth ratio is a
    * single division of two exact integers, so both engines see the
    * identical double before display rounding. */
  def qPctChange(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val monthly = T.orders(spark, dir)
      .groupBy(date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM").as("month"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("rev_cents"))
    val w = Window.orderBy($"month")
    monthly
      .withColumn("prev", lag($"rev_cents", 1).over(w))
      .select($"month", $"rev_cents",
        round(($"rev_cents" - $"prev").cast("double") / $"prev" * 100, 4)
          .as("pct_change"))
      .orderBy($"month")
  }

  val qPctChangeSql: String =
    """WITH m AS (
      |  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |p AS (SELECT month, rev_cents,
      |        lag(rev_cents, 1) OVER (ORDER BY month) AS prev FROM m)
      |SELECT month, rev_cents,
      |  round((rev_cents - prev)::DOUBLE / prev * 100, 4) AS pct_change
      |FROM p ORDER BY month""".stripMargin

  /** Chi-square test of independence between market segment and order
    * priority: contingency counts (one join + one hash aggregate),
    * marginals re-aggregated from the cell counts, expected
    * frequencies by broadcast-joining the two tiny marginal relations,
    * chi2 summed over the ~25 cells. Everything after the first
    * aggregate runs over bounded-cardinality relations — the raw fact
    * table is only touched once. */
  def qChisq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = T.orders(spark, dir)
      .join(T.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment".as("seg"), $"o_orderpriority".as("prio"))
      .agg(count(lit(1)).as("n"))
      .cache()
    val rowT = cells.groupBy($"seg").agg(sum($"n").as("row_n"))
    val colT = cells.groupBy($"prio").agg(sum($"n").as("col_n"))
    val tot = cells.agg(sum($"n").as("total"),
      countDistinct($"seg").as("n_seg"), countDistinct($"prio").as("n_prio"))
    cells
      .join(broadcast(rowT), "seg")
      .join(broadcast(colT), "prio")
      .crossJoin(broadcast(tot))
      .select($"n", $"n_seg", $"n_prio",
        ($"row_n" * $"col_n" / $"total".cast("double")).as("e"))
      .groupBy($"n_seg", $"n_prio")
      .agg(round(sum(($"n" - $"e") * ($"n" - $"e") / $"e"), 4).as("chi2"))
      .select((($"n_seg" - 1) * ($"n_prio" - 1)).as("dof"), $"chi2")
  }

  val qChisqSql: String =
    """WITH cells AS (
      |  SELECT c_mktsegment AS seg, o_orderpriority AS prio, count(*) AS n
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |rt AS (SELECT seg, CAST(sum(n) AS BIGINT) AS row_n FROM cells GROUP BY seg),
      |ct AS (SELECT prio, CAST(sum(n) AS BIGINT) AS col_n FROM cells GROUP BY prio),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total,
      |        count(DISTINCT seg) AS n_seg, count(DISTINCT prio) AS n_prio FROM cells),
      |ex AS (SELECT n, n_seg, n_prio, row_n * col_n / total::DOUBLE AS e
      |       FROM cells JOIN rt USING (seg) JOIN ct USING (prio) CROSS JOIN tot)
      |SELECT (n_seg - 1) * (n_prio - 1) AS dof,
      |  round(sum((n - e) * (n - e) / e), 4) AS chi2
      |FROM ex GROUP BY n_seg, n_prio""".stripMargin

  /** RFM customer segmentation: per-customer recency/frequency/monetary
    * rollup, quartile scores from ONE broadcast row of exact percentile
    * cuts (no per-customer ntile window), segment counts + value.
    * Money is integer cents end-to-end. The cuts come from ONE
    * metric-keyed [[Quantiles.exact]] call over the melted
    * (metric, value) pairs — bucketed rank location with the metric as
    * the partition key, so nothing buffers the customer-grain values
    * and the three quartile sets cost one pass, not three. */
  def qRfm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rfm = T.orders(spark, dir)
      .groupBy($"o_custkey".as("custkey"))
      .agg(
        datediff(lit("2001-09-01").cast("timestamp"), max($"o_orderdate")).as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(round($"o_totalprice" * 100).cast("long")).as("monetary_cents"))
      .cache()
    val melted = rfm.select(explode(array(
        struct(lit("r").as("m"), $"recency_days".cast("double").as("v")),
        struct(lit("f").as("m"), $"frequency".cast("double").as("v")),
        struct(lit("m").as("m"), $"monetary_cents".cast("double").as("v"))))
        .as("t"))
      .select($"t.m".as("m"), $"t.v".as("v"))
    val quartiles = Seq(0.25, 0.5, 0.75)
    def arr(metric: String): Column = array(quartiles.map(p =>
      max(when($"m" === metric && $"p" === p, $"q"))): _*)
    val cuts = graft.ops.Quantiles.exact(melted, Seq("m"), "v", quartiles)
      .agg(arr("r").as("rq"), arr("f").as("fq"), arr("m").as("mq"))
    def score(c: Column, q: Column): Column =
      (1 to 3).map(i => when(c > element_at(q, i), 1).otherwise(0)).reduce(_ + _) + 1
    rfm.crossJoin(broadcast(cuts))
      .select($"monetary_cents",
        (lit(5) - score($"recency_days", $"rq")).as("r_score"),
        score($"frequency", $"fq").as("f_score"),
        score($"monetary_cents", $"mq").as("m_score"))
      .groupBy($"r_score", $"f_score", $"m_score")
      .agg(count(lit(1)).as("n_cust"), sum($"monetary_cents").as("seg_cents"))
      .orderBy($"r_score", $"f_score", $"m_score")
  }

  val qRfmSql: String =
    """WITH rfm AS (
      |  SELECT o_custkey AS custkey,
      |    date_diff('day', max(o_orderdate), TIMESTAMP '2001-09-01 00:00:00') AS recency_days,
      |    count(*) AS frequency,
      |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS monetary_cents
      |  FROM orders GROUP BY 1),
      |cuts AS (
      |  SELECT quantile_cont(recency_days, [0.25, 0.5, 0.75]) AS rq,
      |         quantile_cont(frequency, [0.25, 0.5, 0.75]) AS fq,
      |         quantile_cont(monetary_cents, [0.25, 0.5, 0.75]) AS mq
      |  FROM rfm)
      |SELECT r_score, f_score, m_score, count(*) AS n_cust,
      |  CAST(sum(monetary_cents) AS BIGINT) AS seg_cents
      |FROM (
      |  SELECT monetary_cents,
      |    4 - ((recency_days > rq[1])::int + (recency_days > rq[2])::int + (recency_days > rq[3])::int) AS r_score,
      |    1 + (frequency > fq[1])::int + (frequency > fq[2])::int + (frequency > fq[3])::int AS f_score,
      |    1 + (monetary_cents > mq[1])::int + (monetary_cents > mq[2])::int + (monetary_cents > mq[3])::int AS m_score
      |  FROM rfm, cuts)
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Gaps-and-islands: maximal runs of consecutive active days per
    * user via the classic day - row_number() grouping key. The window
    * keys on user_id (unbounded cardinality — scales out), and the
    * distinct day grain bounds rows per key at 366/year. */
  def qGapsIslands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = T.events(spark, dir)
      .select($"user_id", to_date(date_trunc("day", $"ts")).as("day")).distinct()
    val w = Window.partitionBy($"user_id").orderBy($"day")
    d.withColumn("grp", date_sub($"day", row_number().over(w)))
      .groupBy($"user_id", $"grp")
      .agg(min($"day").as("start"), count(lit(1)).as("len"))
      .filter($"len" >= 3)
      .select($"user_id", date_format($"start", "yyyy-MM-dd").as("start_day"), $"len")
      .orderBy($"user_id", $"start_day")
      .limit(40)
  }

  val qGapsIslandsSql: String =
    """WITH e AS (SELECT user_id, make_timestamp(epoch_ns(ts)//1000) AS ts FROM events),
      |d AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM e),
      |r AS (SELECT user_id, day,
      |  CAST(day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INT) AS DATE) AS grp
      |  FROM d),
      |isl AS (SELECT user_id, min(day) AS start_day, count(*) AS len
      |  FROM r GROUP BY user_id, grp)
      |SELECT user_id, strftime(start_day, '%Y-%m-%d') AS start_day, len
      |FROM isl WHERE len >= 3 ORDER BY user_id, start_day LIMIT 40""".stripMargin

  /** Semi-additive measure: daily average of each user's LAST reading
    * (max_by over event time — deterministic here, (user, ts) is
    * verified tie-free in the fixtures). The balance-style aggregate:
    * additive across users, last-value across time. */
  def qSemiAdditive(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.events(spark, dir).filter($"event_type" === "view")
      .groupBy($"user_id", to_date(date_trunc("day", $"ts")).as("day"))
      .agg(max_by($"value", $"ts").as("last_value"))
      .groupBy(date_format($"day", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_users"), round(avg($"last_value"), 4).as("avg_last_value"))
      .orderBy($"day")
  }

  val qSemiAdditiveSql: String =
    """WITH e AS (SELECT user_id, value, event_type,
      |             make_timestamp(epoch_ns(ts)//1000) AS ts FROM events),
      |latest AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    arg_max(value, ts) AS last_value
      |  FROM e WHERE event_type = 'view' GROUP BY 1, 2)
      |SELECT strftime(day, '%Y-%m-%d') AS day, count(*) AS n_users,
      |  round(avg(last_value), 4) AS avg_last_value
      |FROM latest GROUP BY 1 ORDER BY 1""".stripMargin

  /** 2-D skyline (Pareto frontier) over the part catalog: the parts no
    * other part dominates on (cheaper-or-equal price, larger-or-equal
    * size, strict somewhere) — the classic preference-query operator.
    * The naive formulation is an all-pairs dominance anti-join (the
    * oracle's NOT EXISTS, O(n²) — fine for DuckDB at oracle scale,
    * lethal at catalog scale). The distributed shape grain-reduces
    * first: dominance only depends on the per-price MAX size, so one
    * hash aggregate drops the input to |distinct prices| rows; the
    * frontier test "did any strictly-cheaper price already reach this
    * size" is [[Skew.globalCumMaxExclusive]] — a range-partitioned
    * sweep with broadcast per-partition prefix maxima, no
    * single-task window (the q_zipf_fit discipline). Survivors join
    * back equi-key on price to recover every part achieving its
    * price's max size, so equal (price, size) co-achievers all stay
    * on the frontier, exactly matching the strict-dominance oracle. */
  def qSkyline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = T.part(spark, dir)
      .select($"p_partkey", $"p_retailprice".as("price"), $"p_size".as("size"))
    val g = p.groupBy($"price").agg(max($"size").as("msize"))
    val frontier = Skew
      .globalCumMaxExclusive(g, Seq(asc("price")), col("msize"))
      .filter($"prevmax".isNull || $"msize" > $"prevmax")
      // rename: frontier shares lineage with p (derived from the same
      // scan), so the join keys need unambiguous names
      .select($"price".as("f_price"), $"msize")
    p.join(frontier, $"price" === $"f_price" && $"size" === $"msize")
      .select($"p_partkey", $"price", $"size")
      .orderBy($"price", $"p_partkey")
  }

  val qSkylineSql: String =
    """SELECT a.p_partkey, a.p_retailprice AS price, a.p_size AS size
      |FROM part a
      |WHERE NOT EXISTS (SELECT 1 FROM part b
      |  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
      |    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
      |ORDER BY price, a.p_partkey""".stripMargin

  /** Cohort lifetime-value matrix: customers cohorted by first-order
    * month, revenue tracked by month-age since that first order, and
    * cumulative LTV per cohort member — the (cohort × age) triangle
    * every retention/LTV readout is built from. One fact scan: the
    * cohort month rides a customer-keyed window min (no first-orders
    * self-join), the (cohort, age) rollup is a hash aggregate with
    * integer-cents exact revenue, cohort size is the age-0 row joined
    * back from the SAME small grouped relation, and the running LTV is
    * a cohort-keyed window over O(months) rows per cohort. Nothing
    * after the first aggregate ever sees fact-table cardinality. */
  def qCohortLtv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wCust = Window.partitionBy($"o_custkey")
    val facts = T.orders(spark, dir)
      .select($"o_custkey",
        (year($"o_orderdate") * 12 + month($"o_orderdate")).as("ym"),
        date_format($"o_orderdate", "yyyy-MM").as("mon"),
        round($"o_totalprice" * 100).cast("long").as("c"))
      .withColumn("cym", min($"ym").over(wCust))
      .withColumn("cohort", min($"mon").over(wCust))
    val g = facts.groupBy($"cohort", ($"ym" - $"cym").cast("long").as("age"))
      .agg(countDistinct($"o_custkey").as("n_active"), sum($"c").as("rev_c"))
      .ckpt()
    val size = g.filter($"age" === 0)
      .select($"cohort", $"n_active".as("cohort_size"))
    val wCum = Window.partitionBy($"cohort").orderBy($"age")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.join(size, Seq("cohort"))
      .withColumn("cum_c", sum($"rev_c").over(wCum))
      // per-member LTV resolved to whole cents in INTEGER arithmetic
      // (half-up): (2a + b) div 2b never touches a double, so no
      // engine can flip a rounding boundary
      .withColumn("ltv_c",
        expr("(2 * cum_c + cohort_size) div (2 * cohort_size)"))
      .select($"cohort", $"age", $"n_active",
        round($"rev_c" / 100.0, 2).as("revenue"),
        round($"ltv_c" / 100.0, 2).as("ltv_cum"))
      .orderBy($"cohort", $"age")
  }

  val qCohortLtvSql: String =
    """WITH o AS (SELECT o_custkey,
      |    year(o_orderdate) * 12 + month(o_orderdate) AS ym,
      |    strftime(o_orderdate, '%Y-%m') AS mon,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS c
      |  FROM orders),
      |w AS (SELECT o_custkey, ym, c,
      |    min(ym) OVER (PARTITION BY o_custkey) AS cym,
      |    min(mon) OVER (PARTITION BY o_custkey) AS cohort
      |  FROM o),
      |g AS (SELECT cohort, CAST(ym - cym AS BIGINT) AS age,
      |    count(DISTINCT o_custkey) AS n_active,
      |    CAST(sum(c) AS BIGINT) AS rev_c
      |  FROM w GROUP BY 1, 2),
      |sz AS (SELECT cohort, n_active AS cohort_size FROM g WHERE age = 0),
      |cum AS (SELECT g.cohort, g.age, g.n_active, g.rev_c, s.cohort_size,
      |    CAST(sum(g.rev_c) OVER (PARTITION BY g.cohort ORDER BY g.age) AS BIGINT) AS cum_c
      |  FROM g JOIN sz s USING (cohort))
      |SELECT cohort, age, n_active, round(rev_c / 100.0, 2) AS revenue,
      |  round(((2 * cum_c + cohort_size) // (2 * cohort_size)) / 100.0, 2) AS ltv_cum
      |FROM cum ORDER BY cohort, age""".stripMargin

  /** Day-of-week × hour activity heatmap with traffic shares — the
    * first chart every event pipeline draws, and the load profile a
    * capacity plan reads. One hash aggregate on the (dow, hour) pair
    * (≤ 168 cells at any SF) plus a 1-row total broadcast for shares.
    * Spark's dayofweek is 1-based Sunday-first; the −1 shift pins the
    * cross-engine convention (0 = Sunday) explicitly. */
  def qActivityHeatmap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = T.events(spark, dir)
      .groupBy((dayofweek($"ts") - 1).cast("int").as("dow"),
        hour($"ts").cast("int").as("hr"))
      .agg(count(lit(1)).as("n"))
      .ckpt()
    val tot = cells.agg(sum($"n").cast("double").as("total"))
    cells.crossJoin(broadcast(tot))
      .select($"dow", $"hr", $"n", round($"n" / $"total", 6).as("share"))
      .orderBy($"dow", $"hr")
  }

  val qActivityHeatmapSql: String =
    """WITH g AS (SELECT dayofweek(ts) AS dow, hour(ts) AS hr, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT sum(n)::DOUBLE AS total FROM g)
      |SELECT dow, hr, n, round(n / (SELECT total FROM t), 6) AS share
      |FROM g ORDER BY dow, hr""".stripMargin

  /** Batch sessionization through Spark's NATIVE `session_window`
    * (the same merging-session operator the streaming path uses),
    * proven equivalent to the hand-rolled gap-flag sessionization of
    * [[qSessionize]] — the oracle replays the identical ≥-gap
    * semantics (session_window starts a NEW session when the gap is
    * exactly the timeout; the lag-flag form must use `>=` to match).
    * Per-user session ordinals come from a user-keyed window over the
    * session starts. One shuffle on user_id; session merge happens
    * inside the aggregate. */
  def qSessionNative(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = T.events(spark, dir)
      .select($"user_id", $"ts", unix_micros($"ts").as("us"))
      .groupBy(session_window($"ts", "30 minutes").as("win"), $"user_id")
      .agg(count(lit(1)).as("n_events"), (max($"us") - min($"us")).as("dur_us"))
    val w = Window.partitionBy($"user_id").orderBy($"win.start")
    s.withColumn("session_id", row_number().over(w).cast("long"))
      .select($"user_id", $"session_id", $"n_events", $"dur_us")
      .orderBy($"user_id", $"session_id")
  }

  val qSessionNativeSql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_ns(ts)//1000 AS us FROM events),
      |f AS (SELECT user_id, us,
      |  CASE WHEN coalesce(us - lag(us, 1) OVER
      |         (PARTITION BY user_id ORDER BY us, event_id), 1800000001)
      |       >= 1800000000 THEN 1 ELSE 0 END AS flag,
      |  event_id FROM e),
      |s AS (SELECT user_id, us,
      |  CAST(sum(flag) OVER (PARTITION BY user_id ORDER BY us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM f)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  max(us) - min(us) AS dur_us
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** DAU/WAU stickiness per week — the engagement ratio (avg daily
    * active users over weekly active users) every product dashboard
    * carries. Two scans of events (per-day distinct and per-week
    * distinct are different reductions — ≤2 scans by design); both are
    * single map-side-combinable distinct aggregates keyed on bounded
    * time grains, so each is one shuffle of (grain, user) pairs at any
    * SF. Integer distinct counts make the averages exact. */
  def qStickiness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = T.events(spark, dir)
    val dau = ev
      .groupBy(date_trunc("week", $"ts").as("wk"), to_date($"ts").as("d"))
      .agg(countDistinct($"user_id").as("dau"))
      .groupBy($"wk")
      .agg(count(lit(1)).as("n_days"), round(avg($"dau"), 4).as("avg_dau"))
    val wau = ev.groupBy(date_trunc("week", $"ts").as("wk"))
      .agg(countDistinct($"user_id").as("wau"))
    dau.join(wau, Seq("wk"))
      .select($"wk", $"n_days", $"avg_dau", $"wau",
        round($"avg_dau" / $"wau", 4).as("stickiness"))
      .orderBy($"wk")
  }

  val qStickinessSql: String =
    """WITH ev AS (SELECT make_timestamp(epoch_ns(ts)//1000) AS ts, user_id FROM events),
      |dd AS (SELECT date_trunc('week', ts) AS wk, ts::DATE AS d,
      |    count(DISTINCT user_id)::BIGINT AS dau
      |  FROM ev GROUP BY 1, 2),
      |dau AS (SELECT wk, count(*)::BIGINT AS n_days,
      |    round(avg(dau), 4) AS avg_dau FROM dd GROUP BY wk),
      |wau AS (SELECT date_trunc('week', ts) AS wk,
      |    count(DISTINCT user_id)::BIGINT AS wau FROM ev GROUP BY 1)
      |SELECT dau.wk AS wk, n_days, avg_dau, wau,
      |  round(avg_dau / wau, 4) AS stickiness
      |FROM dau JOIN wau ON dau.wk = wau.wk
      |ORDER BY wk""".stripMargin

  /** Bucketed price elasticity of demand — the OLS slope of
    * ln(total quantity) on ln(unit price) across half-decade price
    * bands. Band edges are literal double comparisons (a CASE ladder),
    * never floor(log(p)): a unit price landing exactly on a boundary
    * (25000.0/25 = 1000.0 is representable) would flip buckets on the
    * 1-ulp log differences between engines. The x coordinate is the
    * band index times ln(10)/2 — a constant — so the only
    * transcendental on data is ln of the band's exact quantity total.
    * One fact scan to ≤9 band rows; the fit closes in one aggregate. */
  def qPriceElasticity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = $"l_extendedprice" / $"l_quantity"
    val band = when(p < 31.6227766017, 0).when(p < 100.0, 1)
      .when(p < 316.227766017, 2).when(p < 1000.0, 3)
      .when(p < 3162.27766017, 4).when(p < 10000.0, 5)
      .when(p < 31622.7766017, 6).when(p < 100000.0, 7).otherwise(8)
    val halfDecade = 1.1512925464970228 // ln(10)/2
    val bands = T.lineitem(spark, dir)
      .groupBy(band.as("band"))
      .agg(count(lit(1)).as("n_items"),
        sum($"l_quantity".cast("long")).as("qty"))
      .select($"band", $"n_items", $"qty",
        ($"band" * halfDecade).as("x"), log($"qty".cast("double")).as("y"))
    bands.agg(count(lit(1)).as("n_bands"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sx2"))
      .select($"n_bands",
        round(($"n_bands" * $"sxy" - $"sx" * $"sy") /
          ($"n_bands" * $"sx2" - $"sx" * $"sx"), 4).as("elasticity"))
  }

  val qPriceElasticitySql: String =
    """WITH li AS (SELECT l_extendedprice / l_quantity AS p, l_quantity FROM lineitem),
      |b AS (SELECT CASE WHEN p < 31.6227766017 THEN 0 WHEN p < 100.0 THEN 1
      |    WHEN p < 316.227766017 THEN 2 WHEN p < 1000.0 THEN 3
      |    WHEN p < 3162.27766017 THEN 4 WHEN p < 10000.0 THEN 5
      |    WHEN p < 31622.7766017 THEN 6 WHEN p < 100000.0 THEN 7
      |    ELSE 8 END AS band, l_quantity FROM li),
      |bands AS (SELECT band, count(*)::BIGINT AS n_items,
      |    sum(l_quantity::BIGINT)::BIGINT AS qty FROM b GROUP BY band),
      |xy AS (SELECT band * 1.1512925464970228 AS x, ln(qty::DOUBLE) AS y
      |  FROM bands),
      |a AS (SELECT count(*)::BIGINT AS n_bands, sum(x) AS sx, sum(y) AS sy,
      |    sum(x * y) AS sxy, sum(x * x) AS sx2 FROM xy)
      |SELECT n_bands,
      |  round((n_bands * sxy - sx * sy) / (n_bands * sx2 - sx * sx), 4)
      |    AS elasticity
      |FROM a""".stripMargin

  /** Keyed exact percentiles — P50/P90/P99 of order value per
    * priority, the per-group latency-style report every SLA dashboard
    * carries, through the group-keyed [[graft.ops.Quantiles.exact]]
    * primitive: bucketed rank location partitioned by the group key,
    * so all 15 quantiles cost ONE pass over the facts and the windows
    * run on per-group 4096-bucket histograms, never the raw rows. */
  def qGroupPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = T.orders(spark, dir)
      .select($"o_orderpriority".as("grp"), $"o_totalprice")
    graft.ops.Quantiles.exact(src, Seq("grp"), "o_totalprice", Seq(0.5, 0.9, 0.99))
      .select($"grp", $"p", round($"q", 2).as("q"), $"n")
      .orderBy($"grp", $"p")
  }

  val qGroupPercentilesSql: String =
    """WITH g AS (SELECT o_orderpriority AS grp, count(*)::BIGINT AS n,
      |    quantile_cont(o_totalprice, 0.5) AS q50,
      |    quantile_cont(o_totalprice, 0.9) AS q90,
      |    quantile_cont(o_totalprice, 0.99) AS q99
      |  FROM orders GROUP BY 1)
      |SELECT grp, p, round(q, 2) AS q, n FROM (
      |  SELECT grp, 0.5 AS p, q50 AS q, n FROM g
      |  UNION ALL SELECT grp, 0.9, q90, n FROM g
      |  UNION ALL SELECT grp, 0.99, q99, n FROM g)
      |ORDER BY grp, p""".stripMargin

  /** Per-user behavioral entropy — Shannon entropy of each user's
    * event-type TRANSITION distribution, the sessionization-level
    * diversity signal (bots repeat one loop → H≈0; explorers spread
    * mass → H→ln(#pairs)). One windowed lead per user timeline, one
    * hash aggregate to (user, from, to) counts, and the entropy closes
    * per user from exact integer ratios. Top-20 by entropy then user. */
  def qSessionEntropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val tr = T.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("us"))
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
      .groupBy($"user_id", $"event_type", $"next_type")
      .agg(count(lit(1)).as("c"))
    val tot = tr.groupBy($"user_id").agg(sum($"c").as("n_trans"))
    tr.join(tot, Seq("user_id"))
      .groupBy($"user_id")
      .agg(max($"n_trans").as("n_trans"),
        (-sum(($"c".cast("double") / $"n_trans") *
          log($"c".cast("double") / $"n_trans"))).as("h"))
      .select($"user_id", $"n_trans", round($"h", 4).as("entropy"))
      .orderBy(desc("entropy"), asc("user_id"))
      .limit(20)
  }

  val qSessionEntropySql: String =
    """WITH ev AS (SELECT user_id, event_id, event_type,
      |    epoch_ns(ts)//1000 AS us FROM events),
      |seq AS (SELECT user_id, event_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |      AS next_type
      |  FROM ev),
      |tr AS (SELECT user_id, event_type, next_type, count(*)::BIGINT AS c
      |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2, 3),
      |tot AS (SELECT user_id, sum(c)::BIGINT AS n_trans FROM tr GROUP BY 1),
      |h AS (SELECT tr.user_id AS user_id, max(n_trans) AS n_trans,
      |    -sum((c::DOUBLE / n_trans) * ln(c::DOUBLE / n_trans)) AS h
      |  FROM tr JOIN tot ON tr.user_id = tot.user_id
      |  GROUP BY tr.user_id)
      |SELECT user_id, n_trans, round(h, 4) AS entropy
      |FROM h ORDER BY entropy DESC, user_id LIMIT 20""".stripMargin

  /** MATCH_RECOGNIZE-style row-sequence pattern detection — the SQL:2016
    * feature Spark has no native operator for, composed from keyed
    * windows: per user, count purchases that complete the pattern
    * `view -> click -> purchase` with NO error event between the view
    * and the purchase. One pass computes, for every event, the latest
    * prior ts of each role (user-keyed running max — distributes at any
    * user count); the click row matched by a purchase already carries
    * "latest view before me" from the SAME pass, so the pattern closes
    * with one user-keyed equi-join back to click rows instead of a
    * per-pattern-step self-join cascade. An error is "between" iff the
    * latest error before the purchase postdates the matched view.
    *
    * Tie contract: two events sharing (user_id, ts) are ordered by
    * event_id (unique), in BOTH the window ordering and the ROWS frame,
    * so "prior" is deterministic and engine-stable even on fixtures
    * with timestamp collisions. */
  def qPatternMatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = T.events(spark, dir).select($"user_id", $"ts", $"event_type", $"event_id")
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val marked = ev
      .withColumn("last_click", max(when($"event_type" === "click", $"ts")).over(w))
      .withColumn("last_view", max(when($"event_type" === "view", $"ts")).over(w))
      .withColumn("last_error", max(when($"event_type" === "error", $"ts")).over(w))
    val clicks = marked.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("click_ts"), $"last_view")
      .groupBy($"c_user", $"click_ts")
      .agg(max($"last_view").as("view_ts"))
    val matched = marked.filter($"event_type" === "purchase")
      .join(clicks,
        $"user_id" === $"c_user" && $"last_click" === $"click_ts", "left")
      .select($"user_id", $"ts", $"last_error", $"view_ts")
      .withColumn("ok",
        $"view_ts".isNotNull &&
          ($"last_error".isNull || $"last_error" < $"view_ts"))
    matched.groupBy($"user_id")
      .agg(count(lit(1)).as("n_purchases"),
        sum($"ok".cast("long")).as("n_matched"))
      .orderBy($"user_id")
  }

  val qPatternMatchSql: String =
    """WITH m AS (SELECT user_id, ts, event_type,
      |  max(CASE WHEN event_type = 'click' THEN ts END)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click,
      |  max(CASE WHEN event_type = 'view' THEN ts END)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view,
      |  max(CASE WHEN event_type = 'error' THEN ts END)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_error
      |  FROM events),
      |clicks AS (SELECT user_id, ts AS click_ts, max(last_view) AS view_ts
      |  FROM m WHERE event_type = 'click' GROUP BY 1, 2),
      |p AS (SELECT m.user_id, m.last_error, c.view_ts,
      |    (c.view_ts IS NOT NULL
      |      AND (m.last_error IS NULL OR m.last_error < c.view_ts)) AS ok
      |  FROM m LEFT JOIN clicks c
      |    ON c.user_id = m.user_id AND c.click_ts = m.last_click
      |  WHERE m.event_type = 'purchase')
      |SELECT user_id, count(*) AS n_purchases,
      |  CAST(sum(ok::int) AS BIGINT) AS n_matched
      |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_pattern_match", qPatternMatch, Some(qPatternMatchSql)),
    QueryDef("q_group_percentiles", qGroupPercentiles, Some(qGroupPercentilesSql)),
    QueryDef("q_session_entropy", qSessionEntropy, Some(qSessionEntropySql)),
    QueryDef("q_stickiness", qStickiness, Some(qStickinessSql)),
    QueryDef("q_price_elasticity", qPriceElasticity, Some(qPriceElasticitySql)),
    QueryDef("q_session_native", qSessionNative, Some(qSessionNativeSql)),
    QueryDef("q_activity_heatmap", qActivityHeatmap, Some(qActivityHeatmapSql)),
    QueryDef("q_cohort_ltv", qCohortLtv, Some(qCohortLtvSql)),
    QueryDef("q_skyline", qSkyline, Some(qSkylineSql)),
    QueryDef("q_rfm", qRfm, Some(qRfmSql)),
    QueryDef("q_gaps_islands", qGapsIslands, Some(qGapsIslandsSql)),
    QueryDef("q_semi_additive", qSemiAdditive, Some(qSemiAdditiveSql)),
    QueryDef("q_unpivot", qUnpivot, Some(qUnpivotSql)),
    QueryDef("q_nullsafe_join", qNullsafeJoin, Some(qNullsafeJoinSql)),
    QueryDef("q_sessionize", qSessionize, Some(qSessionizeSql)),
    QueryDef("q_scd2", qScd2, Some(qScd2Sql)),
    QueryDef("q_temporal_join", qTemporalJoin, Some(qTemporalJoinSql)),
    QueryDef("q_decile_lift", qDecileLift, Some(qDecileLiftSql)),
    QueryDef("q_autocorr", qAutocorr, Some(qAutocorrSql)),
    QueryDef("q_mad", qMad, Some(qMadSql)),
    QueryDef("q_ewma", qEwma, Some(qEwmaSql)),
    QueryDef("q_pct_change", qPctChange, Some(qPctChangeSql)),
    QueryDef("q_chisq", qChisq, Some(qChisqSql)))
}
