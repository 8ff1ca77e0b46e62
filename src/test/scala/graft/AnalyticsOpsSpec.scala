package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant specs for the round-5 analytics operators. The t2 harness
  * hash-checks these against DuckDB; here we pin the semantic
  * properties a hash can't express (bounds, monotonicity, dominance).
  */
class AnalyticsOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("anomaly z-scores are all beyond the 3-sigma gate") {
    val rows = ops.Relational.qAnomalyZscore(spark, sf).collect()
    rows.foreach(r => assert(math.abs(r.getAs[Double]("z")) > 3.0))
  }

  test("rolling 7d totals dominate the daily totals they include") {
    val rows = ops.Relational.qRolling7d(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("roll_7d_total") >= r.getAs[Double]("day_total") - 1e-6)
      assert(r.getAs[Long]("roll_7d_orders") >= r.getAs[Long]("n_orders"))
    }
  }

  test("percentile profile is monotone in q within each flag") {
    val rows = ops.Relational.qPercentiles(spark, sf).collect()
      .groupBy(_.getAs[String]("l_returnflag"))
    rows.values.foreach { grp =>
      val vals = grp.sortBy(_.getAs[Double]("q")).map(_.getAs[Double]("q_value"))
      assert(vals.zip(vals.tail).forall { case (a, b) => a <= b })
    }
  }

  test("approx-quantile sketch honors its rank-error contract") {
    val rows = ops.Relational.qApproxQuantileAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("within_bound")))
  }

  test("upsert keeps version 2 exactly for delta keys, version 1 elsewhere") {
    val rows = ops.ExportOps.qUpsertLatest(spark, sf).collect()
    rows.foreach { r =>
      val key = r.getAs[Long]("o_orderkey")
      val expected = if (key % 10 == 0) 2 else 1
      assert(r.getAs[Int]("version") === expected, s"key $key")
      if (key % 10 == 0) assert(r.getAs[String]("o_orderstatus") === "U")
    }
  }

  test("incremental export: merge-then-read == rebuild, and the counts balance") {
    val r = ops.ExportOps.qExportIncremental(spark, sf).collect()
    assert(r.length === 1)
    val row = r.head
    // the differential the query embeds: base snapshot + changelog
    // MERGE reproduces the fresh full export bit-for-bit
    assert(row.getAs[Boolean]("merge_equals_rebuild"),
      "incremental merge diverged from the full rebuild")
    // conservation: final keys = base + inserts - deletes (updates and
    // no-op tombstones don't change the key count)
    assert(row.getAs[Long]("n_final") ===
      row.getAs[Long]("n_base") + row.getAs[Long]("rows_inserted") -
        row.getAs[Long]("rows_deleted"))
    // the touched set partitions into the four outcomes
    assert(row.getAs[Long]("keys_touched") ===
      row.getAs[Long]("rows_inserted") + row.getAs[Long]("rows_updated") +
        row.getAs[Long]("rows_deleted") + row.getAs[Long]("noop_deletes"))
    // non-vacuous at the spec fixture: a delta with no inserts, no
    // updates, AND no deletes would prove nothing
    assert(row.getAs[Long]("rows_updated") > 0)
    assert(row.getAs[Long]("n_delta_ops") > 0)
  }

  test("schema evolution through the incremental export: backfill and evolved rows partition the table") {
    val r = ops.ExportOps.qExportEvolve(spark, sf).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Boolean]("merge_equals_rebuild"),
      "evolved merge diverged from the fresh post-evolution export")
    assert(row.getAs[Long]("n_final") ===
      row.getAs[Long]("rows_evolved") + row.getAs[Long]("rows_backfilled"))
    // both paths must exist or the differential proves nothing: rows
    // that got the new column AND pre-evolution rows left NULL
    assert(row.getAs[Long]("rows_evolved") > 0)
    assert(row.getAs[Long]("rows_backfilled") > 0)
  }

  test("copy-on-write partition audit: untouched partitions are byte-stable") {
    val rows = ops.ExportOps.qExportPartitionAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    // the copy-on-write contract: a partition the delta never touched
    // must carry an UNCHANGED checksum and row count
    rows.filter(!_.getAs[Boolean]("touched")).foreach { r =>
      assert(r.getAs[Boolean]("stable"),
        s"untouched partition ${r.getAs[Long]("pt")} changed under the MERGE")
    }
    // non-vacuous both ways: the delta touches something, and the
    // carve leaves untouched partitions to prove stability on
    assert(rows.exists(_.getAs[Boolean]("touched")))
    assert(rows.exists(!_.getAs[Boolean]("touched")))
    // and the MERGE actually changed state somewhere (not all
    // tombstone no-ops)
    assert(rows.exists(r => r.getAs[Boolean]("touched") && !r.getAs[Boolean]("stable")))
  }

  test("k-means assignment covers every vector and is label-dominant") {
    val rows = ops.Similarity.qKmeansAssign(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    val corpus = ops.T.embeddings(spark, sf).count()
    assert(total === corpus)
    // the fixture's labels overlap in raw L2 space (the IVF recall
    // audits quantify the same), so the operator invariant is that
    // nearest-centroid assignment beats random assignment decisively,
    // not that clusters are tight: diagonal mass >> 1/k
    val k = rows.map(_.getAs[Int]("assigned")).distinct.length
    val diag = rows.filter(r => r.getAs[Int]("label") === r.getAs[Int]("assigned"))
      .map(_.getAs[Long]("n")).sum
    assert(diag.toDouble / total > 2.0 / k,
      s"diagonal $diag of $total with k=$k — no better than random")
  }

  test("bm25 scores are positive and non-increasing down the ranking") {
    val scores = ops.Text.qBm25(spark, sf).collect().map(_.getAs[Double]("score"))
    assert(scores.nonEmpty)
    assert(scores.forall(_ > 0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("zipf fit slopes downward with a sane r2") {
    val r = ops.Text.qZipfFit(spark, sf).collect().head
    assert(r.getAs[Double]("zipf_slope") < 0)
    val r2 = r.getAs[Double]("r2")
    assert(r2 >= 0 && r2 <= 1)
  }

  test("sessionize partitions every event into exactly one session") {
    val rows = ops.Analytics.qSessionize(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total === ops.T.events(spark, sf).count())
    rows.foreach(r => assert(r.getAs[Long]("dur_us") >= 0))
    // session ids are contiguous 1..k per user
    rows.groupBy(_.getAs[Long]("user_id")).values.foreach { ss =>
      val ids = ss.map(_.getAs[Long]("session_id")).sorted
      assert(ids === (1L to ids.length.toLong))
    }
  }

  test("scd2 versions chain: one open interval per customer") {
    val rows = ops.Analytics.qScd2(spark, sf).collect()
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    byCust.values.foreach { vs =>
      assert(vs.count(_.getAs[Int]("is_current") == 1) === 1)
      vs.foreach { v =>
        val open = v.isNullAt(v.fieldIndex("valid_to"))
        assert(open === (v.getAs[Int]("is_current") == 1))
        if (!open)
          assert(v.getAs[String]("valid_from") <= v.getAs[String]("valid_to"))
      }
    }
  }

  test("decile profile covers all cohorts with balanced deciles") {
    val rows = ops.Analytics.qDecileLift(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("decile")).toSeq.sorted === (1 to 10))
    val nCohorts = rows.map(_.getAs[Long]("n_cohorts")).sum
    val direct = ops.T.customer(spark, sf)
      .select("c_nationkey", "c_mktsegment").distinct().count()
    assert(nCohorts === direct)
    // ntile balance: cohort counts differ by at most 1 across deciles
    val sizes = rows.map(_.getAs[Long]("n_cohorts"))
    assert(sizes.max - sizes.min <= 1)
  }

  test("autocorrelation is a valid correlation coefficient") {
    val r = ops.Analytics.qAutocorr(spark, sf).collect().head
    val ac = r.getAs[Double]("autocorr_lag1")
    assert(ac >= -1.0 && ac <= 1.0)
    assert(r.getAs[Long]("n_pairs") > 0)
  }

  test("MAD is non-negative and below the group's median") {
    val rows = ops.Analytics.qMad(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mad = r.getAs[Double]("mad")
      assert(mad >= 0)
      assert(mad <= r.getAs[Double]("median_price"))
    }
  }

  test("ewma stays inside the global value envelope") {
    val vals = ops.T.events(spark, sf).select("value").collect()
      .map(_.getAs[Double]("value"))
    val (lo, hi) = (vals.min, vals.max)
    ops.Analytics.qEwma(spark, sf).collect().foreach { r =>
      val e = r.getAs[Double]("ewma")
      assert(e >= lo - 1e-4 && e <= hi + 1e-4)
    }
  }

  test("unpivot emits each metric once per status") {
    val rows = ops.Analytics.qUnpivot(spark, sf).collect()
    val byStatus = rows.groupBy(_.getAs[String]("o_orderstatus"))
    byStatus.values.foreach { ms =>
      assert(ms.map(_.getAs[String]("metric")).sorted
        === Seq("avg_price", "n_orders", "revenue"))
    }
  }

  test("null-safe join matches the NULL buckets to each other") {
    val rows = ops.Analytics.qNullsafeJoin(spark, sf).collect()
    assert(rows.count(_.isNullAt(0)) === 1)
    val total = rows.map(r => r.getAs[Long]("n_even") + r.getAs[Long]("n_odd")).sum
    assert(total === ops.T.orders(spark, sf).count())
  }

  test("merged HLL shard sketches honor the 2% accuracy contract") {
    val r = ops.Relational.qHllUnionAudit(spark, sf).collect().head
    assert(r.getAs[Boolean]("within_bound"))
    assert(r.getAs[Long]("n_exact") > 0)
  }

  test("chi-square statistic is non-negative with the right dof") {
    val r = ops.Analytics.qChisq(spark, sf).collect().head
    assert(r.getAs[Double]("chi2") >= 0)
    val nSeg = ops.T.customer(spark, sf).select("c_mktsegment").distinct().count()
    val nPrio = ops.T.orders(spark, sf).select("o_orderpriority").distinct().count()
    assert(r.getAs[Long]("dof") === (nSeg - 1) * (nPrio - 1))
  }

  test("pct change is null only for the first month and cents-consistent") {
    val rows = ops.Analytics.qPctChange(spark, sf).collect()
      .sortBy(_.getAs[String]("month"))
    assert(rows.head.isNullAt(rows.head.fieldIndex("pct_change")))
    assert(rows.tail.forall(r => !r.isNullAt(r.fieldIndex("pct_change"))))
    val totalCents = rows.map(_.getAs[Long]("rev_cents")).sum
    val direct = ops.T.orders(spark, sf)
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("o_totalprice") * 100).cast("long")))
      .collect().head.getLong(0)
    assert(totalCents === direct)
  }

  test("jsonl roundtrip preserves per-lang doc counts") {
    val rt = ops.ExportOps.qJsonlRoundtrip(spark, sf).collect()
    val direct = ops.T.documents(spark, sf).groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    rt.foreach { r =>
      assert(r.getAs[Long]("n_docs") === direct(r.getAs[String]("lang")))
    }
  }

  test("cohort LTV: every cohort starts at age 0 with its full size, LTV is monotone") {
    val rows = ops.Analytics.qCohortLtv(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[String]("cohort"))
    byCohort.foreach { case (c, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("age"))
      assert(sorted.head.getAs[Long]("age") === 0L, s"cohort $c missing age-0 row")
      val size = sorted.head.getAs[Long]("n_active")
      sorted.foreach(r => assert(r.getAs[Long]("n_active") <= size,
        s"cohort $c: active exceeds cohort size"))
      val ltv = sorted.map(_.getAs[Double]("ltv_cum"))
      assert(ltv.zip(ltv.tail).forall { case (a, b) => b >= a },
        s"cohort $c: cumulative LTV decreased")
    }
    // cohort sizes sum to the distinct customer count
    val total = byCohort.values.map(_.minBy(_.getAs[Long]("age")).getAs[Long]("n_active")).sum
    assert(total === ops.T.orders(spark, sf).select("o_custkey").distinct().count())
  }

  test("native session_window equals hand-rolled gap sessionization") {
    // the fixture has no gap of exactly 30:00.000000, so the >= / >
    // boundary convention cannot differ and the two paths must agree
    // row-for-row
    val native = ops.Analytics.qSessionNative(spark, sf).collect().map(_.toString)
    val handRolled = ops.Analytics.qSessionize(spark, sf).collect().map(_.toString)
    assert(native.length === handRolled.length)
    assert(native.toSeq === handRolled.toSeq)
  }

  test("activity heatmap cells partition all events with unit share mass") {
    val rows = ops.Analytics.qActivityHeatmap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("dow") >= 0 && r.getAs[Int]("dow") <= 6)
      assert(r.getAs[Int]("hr") >= 0 && r.getAs[Int]("hr") <= 23)
    }
    assert(rows.map(r => (r.getAs[Int]("dow"), r.getAs[Int]("hr"))).distinct.length === rows.length)
    assert(rows.map(_.getAs[Long]("n")).sum === ops.T.events(spark, sf).count())
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-3)
  }

  test("stickiness: avg DAU never exceeds WAU, weeks have <= 7 days") {
    val rows = ops.Analytics.qStickiness(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("stickiness")
      assert(s > 0.0 && s <= 1.0, s"stickiness $s out of (0,1]")
      assert(r.getAs[Long]("n_days") >= 1 && r.getAs[Long]("n_days") <= 7)
      assert(r.getAs[Double]("avg_dau") <= r.getAs[Long]("wau").toDouble)
    }
  }

  test("group percentiles: monotone within group, all 5x3 cells present") {
    val rows = ops.Analytics.qGroupPercentiles(spark, sf).collect()
    assert(rows.length === 15)
    val byGrp = rows.groupBy(_.getAs[String]("grp"))
    assert(byGrp.size === 5)
    byGrp.values.foreach { g =>
      val qs = g.sortBy(_.getAs[Double]("p")).map(_.getAs[Double]("q"))
      assert(qs.zip(qs.tail).forall { case (a, b) => a <= b },
        "quantiles must be monotone in p")
    }
  }

  test("session entropy: bounded by log of the pair space, top-20 ordered") {
    val rows = ops.Analytics.qSessionEntropy(spark, sf).collect()
    // top-20 cap; the sf0.001 fixture has fewer active users
    assert(rows.length >= 10 && rows.length <= 20)
    val hs = rows.map(_.getAs[Double]("entropy"))
    assert(hs.zip(hs.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy")
      // <=5 event types -> <=25 transition pairs -> H <= ln 25
      assert(h >= 0.0 && h <= math.log(25.0) + 1e-9)
      assert(r.getAs[Long]("n_trans") > 0)
    }
  }

  test("price elasticity: demand slopes down across the full band ladder") {
    val r = ops.Analytics.qPriceElasticity(spark, sf).collect().head
    assert(r.getAs[Long]("n_bands") >= 3, "need >=3 price bands for a slope")
    assert(r.getAs[Double]("elasticity") < 0.0,
      "fixture demand curve must slope down")
  }

  test("pattern match: counts bounded by purchases and replayed exactly by a per-user scan") {
    val rows = ops.Analytics.qPatternMatch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_matched") >= 0L)
      assert(r.getAs[Long]("n_matched") <= r.getAs[Long]("n_purchases"))
    }
    // brute-force replay of the pattern semantics on the driver: for
    // each purchase, latest prior click; that click's latest prior
    // view; no error in (view, purchase)
    val ev = ops.T.events(spark, sf)
      .select("user_id", "ts", "event_type").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts").getTime * 1000 +
          r.getAs[java.sql.Timestamp]("ts").getNanos / 1000 % 1000,
        r.getAs[String]("event_type")))
      .groupBy(_._1).map { case (u, es) => u -> es.sortBy(_._2) }
    val expected = ev.flatMap { case (u, es) =>
      val purchases = es.filter(_._3 == "purchase")
      if (purchases.isEmpty) None
      else {
        val matched = purchases.count { p =>
          val before = es.filter(_._2 < p._2)
          before.reverse.find(_._3 == "click").exists { c =>
            val beforeClick = es.filter(_._2 < c._2)
            beforeClick.reverse.find(_._3 == "view").exists { v =>
              !es.exists(e => e._3 == "error" && e._2 > v._2 && e._2 < p._2)
            }
          }
        }
        Some(u -> (purchases.length.toLong, matched.toLong))
      }
    }
    val got = rows.map(r => r.getAs[Long]("user_id") ->
      (r.getAs[Long]("n_purchases"), r.getAs[Long]("n_matched"))).toMap
    assert(got === expected)
  }
}
