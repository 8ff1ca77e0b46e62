package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Statistical / mining operators over the fact tables: market-basket
  * co-occurrence, regression + correlation aggregates, exact global
  * decile bucketing, PMI-scored collocations, and last-touch
  * attribution.
  *
  * Scale design (100 TB / 1000-executor target):
  *  - Basket pairs self-join on the order key AFTER a per-order
  *    distinct, so join fan-out is bounded by (items-per-order choose
  *    2), never corpus-squared.
  *  - Regression/correlation are single-pass codegen'd aggregates
  *    (covar_pop/var_pop/corr) — no second scan, no driver math.
  *  - Decile bucketing broadcasts ONE row of exact percentile cuts and
  *    buckets with nine comparisons — a global ntile() window (single
  *    partition sort of the whole table) is the anti-pattern here.
  *  - PMI joins the bigram relation to the unigram relation on the
  *    token key (two bounded-vocabulary equi-joins) and broadcasts the
  *    1-row corpus totals.
  *  - Attribution reuses the union + running-window as-of encoding:
  *    ONE shuffle on user_id, no per-purchase subquery.
  */
object Mining extends QueryFamily {

  /** Market-basket co-occurrence: part pairs bought together in ≥ 2
    * orders. Per-order distinct first (dedups multi-line repeats of the
    * same part), then an orderkey equi-self-join with `a < b` to keep
    * each unordered pair once. */
  def qBasketPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val items = T.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").distinct()
    val a = items.select($"l_orderkey".as("o"), $"l_partkey".as("part_a"))
    val b = items.select($"l_orderkey".as("o2"), $"l_partkey".as("part_b"))
    a.join(b, $"o" === $"o2" && $"part_a" < $"part_b")
      .groupBy($"part_a", $"part_b")
      .agg(count(lit(1)).as("n_orders"))
      .filter($"n_orders" >= 2)
      .orderBy(desc("n_orders"), asc("part_a"), asc("part_b"))
      .limit(50)
  }

  val qBasketPairsSql: String =
    """SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
      |FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      |JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |GROUP BY 1, 2 HAVING count(*) >= 2
      |ORDER BY n_orders DESC, part_a, part_b LIMIT 50""".stripMargin

  /** Per-group simple linear regression (price ~ quantity) from
    * single-pass moment aggregates: slope = covar_pop/var_pop,
    * intercept = mean(y) - slope*mean(x), r2 = corr^2. */
  def qRegrFit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        covar_pop($"l_extendedprice", $"l_quantity").as("cov"),
        var_pop($"l_quantity").as("vx"),
        avg($"l_extendedprice").as("my"),
        avg($"l_quantity").as("mx"),
        corr($"l_extendedprice", $"l_quantity").as("r"),
        count(lit(1)).as("n"))
      .select($"l_returnflag",
        round($"cov" / $"vx", 4).as("slope"),
        round($"my" - ($"cov" / $"vx") * $"mx", 4).as("intercept"),
        round($"r" * $"r", 4).as("r2"),
        $"n")
      .orderBy($"l_returnflag")
  }

  val qRegrFitSql: String =
    """SELECT l_returnflag,
      |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
      |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
      |  round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
      |  count(*) AS n
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** Pairwise correlation panel per line status — three corr()
    * aggregates in one pass. */
  def qCorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.lineitem(spark, dir)
      .groupBy($"l_linestatus")
      .agg(
        round(corr($"l_quantity", $"l_extendedprice"), 4).as("corr_qty_price"),
        round(corr($"l_quantity", $"l_discount"), 4).as("corr_qty_disc"),
        round(corr($"l_extendedprice", $"l_tax"), 4).as("corr_price_tax"))
      .orderBy($"l_linestatus")
  }

  val qCorrMatrixSql: String =
    """SELECT l_linestatus,
      |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
      |  round(corr(l_quantity, l_discount), 4) AS corr_qty_disc,
      |  round(corr(l_extendedprice, l_tax), 4) AS corr_price_tax
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** Exact global decile profile of document lengths. The nine cut
    * points come from one exact-percentile aggregate (1 row,
    * broadcast); each doc then buckets with nine comparisons. Exactly
    * reproducible in the oracle — unlike ntile(), whose tie placement
    * depends on engine sort order. */
  def qDocDeciles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = T.documents(spark, dir)
    val cuts = docs.agg(expr(
      "percentile(n_chars, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))").as("qs"))
    val bucket = (1 to 9).map(i => when($"n_chars" > element_at($"qs", i), 1).otherwise(0))
      .reduce(_ + _) + 1
    docs.crossJoin(broadcast(cuts))
      .select(bucket.as("bucket"), $"n_chars")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_docs"),
        min($"n_chars").as("min_chars"),
        max($"n_chars").as("max_chars"))
      .orderBy($"bucket")
  }

  val qDocDecilesSql: String =
    """WITH cuts AS (
      |  SELECT quantile_cont(n_chars, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs
      |  FROM documents)
      |SELECT bucket, count(*) AS n_docs,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
      |FROM (SELECT n_chars,
      |    1 + (n_chars > qs[1])::int + (n_chars > qs[2])::int + (n_chars > qs[3])::int
      |      + (n_chars > qs[4])::int + (n_chars > qs[5])::int + (n_chars > qs[6])::int
      |      + (n_chars > qs[7])::int + (n_chars > qs[8])::int + (n_chars > qs[9])::int AS bucket
      |  FROM documents, cuts)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** PMI-scored bigram collocations: log(p(ab) / (p(a)p(b))) over the
    * corpus token stream. Bigram and unigram counts are two hash
    * aggregates over one exploded scan shape; corpus totals are a 1-row
    * broadcast. All-integer inputs make the PMI doubles identical
    * across engines. */
  def qPmiBigrams(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = T.documents(spark, dir).withColumn("w", split($"text", " "))
    val bi = docs
      .withColumn("bg", expr(
        "transform(slice(w, 1, size(w) - 1), (x, i) -> struct(x AS w1, element_at(w, i + 2) AS w2))"))
      .select(explode($"bg").as("b"))
      .select($"b.w1", $"b.w2")
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("c_ab"))
    val uni = docs.select(explode($"w").as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("c"))
    val totals = bi.agg(sum($"c_ab").as("n_bi"))
      .crossJoin(uni.agg(sum($"c").as("n_uni")))
    bi.filter($"c_ab" >= 25)
      .join(uni.select($"tok".as("t1"), $"c".as("c1")), $"w1" === $"t1")
      .join(uni.select($"tok".as("t2"), $"c".as("c2")), $"w2" === $"t2")
      .crossJoin(broadcast(totals))
      .select($"w1", $"w2", $"c_ab",
        round(log(($"c_ab" * $"n_uni" * $"n_uni").cast("double") /
                  ($"n_bi" * $"c1" * $"c2").cast("double")), 4).as("pmi"))
      .orderBy(desc("pmi"), asc("w1"), asc("w2"))
      .limit(30)
  }

  val qPmiBigramsSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
      |         generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM documents),
      |bi AS (SELECT a.tok AS w1, b.tok AS w2, count(*) AS c_ab
      |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      |  GROUP BY 1, 2),
      |uni AS (SELECT tok AS w, count(*) AS c FROM toks GROUP BY 1),
      |tot AS (SELECT (SELECT sum(c_ab) FROM bi) AS n_bi,
      |               (SELECT sum(c) FROM uni) AS n_uni)
      |SELECT w1, w2, c_ab,
      |  round(ln((c_ab * n_uni * n_uni) / (n_bi * u1.c * u2.c)), 4) AS pmi
      |FROM bi JOIN uni u1 ON w1 = u1.w JOIN uni u2 ON w2 = u2.w, tot
      |WHERE c_ab >= 25
      |ORDER BY pmi DESC, w1, w2 LIMIT 30""".stripMargin

  /** Last-touch attribution: each purchase credits the latest click (by
    * event time; ties -> lowest channel) from the same user, revenue
    * rolled up per channel. Channel is a JSON prop bucket. Same
    * union + running-window as-of encoding as [[Relational.qAsofJoin]]:
    * one shuffle on user_id. Window order (ts, tag, channel DESC) makes
    * `last(channel)` pick max-ts then min-channel — mirroring the
    * oracle's ORDER BY ts DESC, channel LIMIT 1. */
  def qAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = T.events(spark, dir)
    val clicks = ev.filter($"event_type" === "click").select(
      $"user_id", $"ts",
      (get_json_object($"props", "$.k").cast("int") % 5).as("channel"),
      lit(null).cast("double").as("value"), lit(0).as("tag"))
    val purchases = ev.filter($"event_type" === "purchase").select(
      $"user_id", $"ts", lit(null).cast("int").as("channel"),
      $"value", lit(1).as("tag"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"tag".asc, $"channel".desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    clicks.unionByName(purchases)
      .withColumn("attr_channel", last($"channel", ignoreNulls = true).over(w))
      .filter($"tag" === 1 && $"attr_channel".isNotNull)
      .groupBy($"attr_channel".as("channel"))
      .agg(count(lit(1)).as("n_purchases"), round(sum($"value"), 2).as("revenue"))
      .orderBy($"channel")
  }

  val qAttributionSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type, value, props,
      |             make_timestamp(epoch_ns(ts)//1000) AS ts FROM events),
      |clicks AS (SELECT user_id, ts,
      |    CAST(json_extract(props, '$.k') AS INT) % 5 AS channel
      |  FROM e WHERE event_type = 'click'),
      |purch AS (SELECT event_id, user_id, ts, value FROM e
      |  WHERE event_type = 'purchase'),
      |matched AS (
      |  SELECT p.event_id, p.value, (
      |      SELECT c.channel FROM clicks c
      |      WHERE c.user_id = p.user_id AND c.ts <= p.ts
      |      ORDER BY c.ts DESC, c.channel LIMIT 1) AS channel
      |  FROM purch p)
      |SELECT channel, count(*) AS n_purchases, round(sum(value), 2) AS revenue
      |FROM matched WHERE channel IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_basket_pairs", qBasketPairs, Some(qBasketPairsSql)),
    QueryDef("q_regr_fit", qRegrFit, Some(qRegrFitSql)),
    QueryDef("q_corr_matrix", qCorrMatrix, Some(qCorrMatrixSql)),
    QueryDef("q_doc_deciles", qDocDeciles, Some(qDocDecilesSql)),
    QueryDef("q_pmi_bigrams", qPmiBigrams, Some(qPmiBigramsSql)),
    QueryDef("q_attribution", qAttribution, Some(qAttributionSql)))
}
