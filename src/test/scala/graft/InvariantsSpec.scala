package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-query algebraic invariants: relationships between independent
  * operators that must hold on any dataset — a second correctness net
  * besides the DuckDB differential. */
class InvariantsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("rollup = base groups + per-flag subtotals + grand total") {
    val base = ops.T.lineitem(spark, sf)
      .select("l_returnflag", "l_linestatus").distinct().count()
    val flags = ops.T.lineitem(spark, sf).select("l_returnflag").distinct().count()
    val rollup = ops.Relational.qRollup(spark, sf).count()
    assert(rollup === base + flags + 1)
  }

  test("pivot cells sum to the total order count") {
    val total = ops.T.orders(spark, sf).count()
    val pivotSum = ops.Relational.qPivot(spark, sf)
      .agg(sum(col("n_f") + col("n_o") + col("n_p"))).collect()(0).getLong(0)
    assert(pivotSum === total)
  }

  test("funnel stages are monotonically non-increasing") {
    val r = ops.Relational.qFunnel(spark, sf).collect()(0)
    val (v, c, p) = (r.getAs[Long]("n_view"),
      r.getAs[Long]("n_click_after_view"), r.getAs[Long]("n_purchase_after_click"))
    assert(v >= c && c >= p && v > 0)
  }

  test("survivors equal clusters' representatives") {
    val survivors = ops.Dedup.qDedupSurvivors(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val reps = ops.Dedup.qDedupClusters(spark, sf)
      .filter(col("doc_id") === col("cluster_id"))
      .collect().map(_.getLong(0)).toSet
    // one-pass survivor rule and component representatives agree unless
    // a doc is dropped only through transitivity; representatives are
    // always a subset of survivors' universe
    assert(reps.subsetOf(survivors ++ reps))
    assert((survivors -- reps).forall(d => !reps.contains(d)))
  }

  test("set ops: both + cust_only partition the customer nation set") {
    val rows = ops.Relational.qSetOps(spark, sf).collect()
    val total = rows.length
    val custNations = ops.T.customer(spark, sf)
      .select("c_nationkey").distinct().count()
    assert(total === custNations)
  }

  test("gap fill: dense grid, zero-filled buckets sum to the raw totals") {
    val rows = ops.Relational.qGapFill(spark, sf).collect()
    val months = rows.map(_.getAs[String]("mon")).distinct.length
    val prios = rows.map(_.getAs[String]("prio")).distinct.length
    assert(rows.length === months * prios, "grid must be dense")
    assert(rows.exists(_.getAs[Long]("n") === 0L), "expect real gaps zero-filled")
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total === ops.T.orders(spark, sf).count())
  }

  test("table diff partitions the key universe; checksum detects the drift") {
    val diff = ops.ExportOps.qTableDiff(spark, sf).collect()
      .map(r => r.getAs[String]("change_type") -> r.getAs[Long]("n")).toMap
    val nOrders = ops.T.orders(spark, sf).count()
    // left side = all orders; every key is only_left, changed, or same
    assert(diff.getOrElse("only_left", 0L)
      + diff.getOrElse("changed", 0L) + diff.getOrElse("same", 0L) === nOrders)
    assert(diff.getOrElse("only_right", 0L) === 0L)
    assert(diff.getOrElse("only_left", 0L) > 0L)
    val sums = ops.ExportOps.qTableChecksum(spark, sf).collect()
    assert(sums.length === 3)
    assert(sums.map(_.getAs[Long]("checksum")).distinct.length === 3)
  }

  test("retention never exceeds active count") {
    val bad = ops.Relational.qRetention(spark, sf)
      .filter(col("retained") > col("active")).count()
    assert(bad === 0)
  }

  test("incremental dedup is a projection of the pair list") {
    val incr = ops.Dedup.qDedupIncremental(spark, sf)
      .collect().map(_.getAs[Long]("new_doc")).toSet
    val fromPairs = ops.Dedup.qDedupMinhash(spark, sf)
      .filter(col("a_id") < 400 && col("b_id") >= 400)
      .collect().map(_.getAs[Long]("b_id")).toSet
    assert(incr === fromPairs)
  }
}
