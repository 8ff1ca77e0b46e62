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

  test("jsonl roundtrip preserves per-lang doc counts") {
    val rt = ops.ExportOps.qJsonlRoundtrip(spark, sf).collect()
    val direct = ops.T.documents(spark, sf).groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    rt.foreach { r =>
      assert(r.getAs[Long]("n_docs") === direct(r.getAs[String]("lang")))
    }
  }
}
