package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the statistical-test family — the DuckDB
  * differential proves cross-engine equality; these pin the
  * STATISTICS themselves to known properties. */
class StatsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("mann-whitney: U within [0, n1*n2] and z finite") {
    val r = ops.Stats.qMannWhitney(spark, sf).collect().head
    val (na, nb) = (r.getAs[Long]("na"), r.getAs[Long]("nb"))
    val u1 = r.getAs[Double]("u1")
    assert(na > 0 && nb > 0)
    assert(u1 >= 0.0 && u1 <= na.toDouble * nb)
    assert(!r.getAs[Double]("z").isNaN)
  }

  test("welch t: df between min(n)-1 and n_r+n_a-2") {
    val r = ops.Stats.qWelchTtest(spark, sf).collect().head
    val (nr, na) = (r.getAs[Long]("n_r"), r.getAs[Long]("n_a"))
    val df = r.getAs[Double]("df")
    assert(df >= math.min(nr, na) - 1.0 && df <= (nr + na - 2).toDouble)
  }

  test("BH rejections form a prefix of the p-ordered list") {
    val rows = ops.Stats.qFdrBh(spark, sf).collect()
    assert(rows.length === 25)
    val byP = rows.sortBy(_.getAs[Double]("p"))
    val flags = byP.map(_.getAs[Boolean]("bh_reject"))
    // once a false appears, no true may follow (prefix property)
    val firstFalse = flags.indexOf(false)
    if (firstFalse >= 0)
      assert(flags.drop(firstFalse).forall(_ == false),
        s"BH rejections not a prefix: ${flags.mkString(",")}")
    rows.foreach { r =>
      val p = r.getAs[Double]("p")
      assert(p >= 0.0 && p <= 1.0)
    }
  }

  test("erf-based p agrees with the exact normal tail on known quantiles") {
    // A-S 7.1.26 abs error <= 1.5e-7: check two-sided p at z = 1.96
    // and z = 2.5758 against textbook values
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(1.959963985, 2.575829304).toDF("z")
    // reuse the family's construction through a tiny local pipeline:
    // p = 1 - erf(z / sqrt(2)) computed the same way the query does
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * ($"z" / sqrt(lit(2.0))))
    val poly = ((((lit(1.061405429) * t - lit(1.453152027)) * t
      + lit(1.421413741)) * t - lit(0.284496736)) * t + lit(0.254829592)) * t
    val p = lit(1.0) - (lit(1.0) - poly * exp(-($"z" / sqrt(lit(2.0))) * ($"z" / sqrt(lit(2.0)))))
    val ps = df.select(p.as("p")).collect().map(_.getAs[Double]("p"))
    assert(math.abs(ps(0) - 0.05) < 1e-5)
    assert(math.abs(ps(1) - 0.01) < 1e-5)
  }

  test("spearman rho in [-1, 1]") {
    val r = ops.Stats.qSpearman(spark, sf).collect().head
    val rho = r.getAs[Double]("rho_s")
    assert(rho >= -1.0 && rho <= 1.0)
  }

  test("theil-sen: pair count is C(months, 2)") {
    import org.apache.spark.sql.functions._
    val months = spark.read.parquet(s"$sf/orders.parquet")
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("m"))
      .distinct().count()
    val r = ops.Stats.qTheilSen(spark, sf).collect().head
    assert(r.getAs[Long]("n_pairs") === months * (months - 1) / 2)
  }

  test("PSI: per-bucket terms are non-negative and sum to the reported total") {
    val rows = ops.Stats.qPsiDrift(spark, sf).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val terms = rows.map(_.getAs[Double]("psi_term"))
    // (a-b)ln(a/b) >= 0 always
    terms.foreach(t => assert(t >= -1e-9))
    val total = rows.head.getAs[Double]("psi_total")
    assert(math.abs(terms.sum - total) < 1e-4)
    rows.foreach { r =>
      assert(r.getAs[Double]("base_share") > 0 && r.getAs[Double]("cur_share") > 0)
    }
  }

  test("simpson check: reversal flag matches the sign comparison") {
    val rows = ops.Stats.qSimpsonCheck(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val seg = r.getAs[Double]("seg_diff")
      val pooled = r.getAs[Double]("pooled_diff")
      // rounded values can sit at 0; only assert where the sign is clear
      if (math.abs(seg) > 1e-5 && math.abs(pooled) > 1e-5)
        assert(r.getAs[Boolean]("reversed") === (seg * pooled < 0))
    }
  }

  test("cross-correlation emits all 7 lags with |corr| <= 1") {
    val rows = ops.Stats.qCrossCorr(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("lag")).toSeq === (-3 to 3))
    rows.foreach { r =>
      val c = r.getAs[Double]("xcorr")
      assert(math.abs(c) <= 1.0)
    }
  }

  test("partial correlation is bounded and consistent with its inputs") {
    val r = ops.Stats.qPartialCorr(spark, sf).collect().head
    val (raw, part) = (r.getAs[Double]("r_raw"), r.getAs[Double]("r_partial"))
    // the synthetic fixture draws price independently of quantity, so
    // both r's are near zero — assert the invariants, not a domain
    // story the fixture doesn't tell
    assert(math.abs(raw) <= 1.0 && math.abs(part) <= 1.0)
    assert(r.getAs[Long]("n") > 0)
  }

  test("cronbach alpha <= 1 and n matches the fact count") {
    val r = ops.Stats.qCronbachAlpha(spark, sf).collect().head
    assert(r.getAs[Double]("alpha") <= 1.0 + 1e-9)
    assert(r.getAs[Long]("n") === spark.read.parquet(s"$sf/lineitem.parquet").count())
  }

  test("gini stump: gain non-negative, split beats or ties the parent") {
    val r = ops.Stats.qGiniStump(spark, sf).collect().head
    val gain = r.getAs[Double]("gain")
    assert(gain >= -1e-9)
    assert(r.getAs[Double]("gini_split") <= r.getAs[Double]("gini_parent") + 1e-9)
    val t = r.getAs[Int]("threshold")
    assert(t >= 1 && t < 50, s"threshold $t must leave both sides non-empty")
  }

  test("cohen kappa: cells partition the corpus, agreement beats chance") {
    val r = ops.Stats.qCohenKappa(spark, sf).collect().head
    val n = r.getAs[Long]("n")
    assert(n === spark.read.parquet(s"$sf/documents.parquet").count())
    assert(r.getAs[Long]("n11") + r.getAs[Long]("n10") +
      r.getAs[Long]("n01") + r.getAs[Long]("n00") === n)
    val po = r.getAs[Double]("po"); val pe = r.getAs[Double]("pe")
    val kappa = r.getAs[Double]("kappa")
    assert(po >= 0.0 && po <= 1.0 && pe >= 0.0 && pe <= 1.0)
    assert(kappa >= -1.0 && kappa <= 1.0)
    // the two length heuristics are correlated by construction, so
    // agreement must be real, not chance-level
    assert(po > pe && kappa > 0.5, s"po=$po pe=$pe kappa=$kappa")
  }

  test("conformal threshold: k is the finite-sample rank, coverage near the 0.9 target") {
    val r = ops.Stats.qConformalThreshold(spark, sf).collect().head
    val nCal = r.getAs[Long]("n_cal")
    assert(r.getAs[Long]("k") === math.min(math.ceil(0.9 * (nCal + 1)).toLong, nCal))
    assert(r.getAs[Double]("threshold") > 0.0)
    val cov = r.getAs[Double]("coverage")
    // finite-sample conformal guarantee: coverage >= 0.9 in expectation;
    // sampling noise at the fixture scale justifies the loose floor
    assert(cov > 0.8 && cov <= 1.0, s"coverage $cov far from the 0.9 target")
    // splits are disjoint and exhaustive
    val total = r.getAs[Long]("n_fit") + nCal + r.getAs[Long]("n_test")
    assert(total === spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("mcnemar: discordant cells bounded by n, statistic non-negative") {
    val r = ops.Stats.qMcNemar(spark, sf).collect().head
    val (n, n10, n01) = (r.getAs[Long]("n"), r.getAs[Long]("n10"), r.getAs[Long]("n01"))
    assert(n10 + n01 <= n && n10 >= 0 && n01 >= 0)
    assert(r.getAs[Double]("chi2_cc") >= 0.0)
  }

  test("fleiss kappa: agreement probabilities and kappa within bounds") {
    val r = ops.Stats.qFleissKappa(spark, sf).collect().head
    val (po, pe, k) = (r.getAs[Double]("p_obs"), r.getAs[Double]("p_exp"),
      r.getAs[Double]("kappa"))
    // with r=3 raters and 2 categories P_i >= 1/3, so p_obs >= 1/3
    assert(po >= 1.0 / 3 - 1e-9 && po <= 1.0)
    assert(pe >= 0.5 - 1e-9 && pe <= 1.0) // p1²+(1-p1)² minimized at 1/2
    assert(k >= -1.0 && k <= 1.0)
  }

  test("anova F and levene F: positive with k=5 groups and consistent dfs") {
    for (df <- Seq(ops.Stats.qAnovaF(spark, sf), ops.Stats.qLevene(spark, sf))) {
      val r = df.collect().head
      assert(r.getAs[Long]("k") === 5L)
      assert(r.getAs[Long]("df1") === 4L)
      assert(r.getAs[Long]("df2") === r.getAs[Long]("n") - 5)
      assert(r.getAs[Double]("f") >= 0.0)
    }
  }

  test("kruskal-wallis: H non-negative, covers every order") {
    val r = ops.Stats.qKruskalWallis(spark, sf).collect().head
    assert(r.getAs[Double]("h") >= 0.0)
    assert(r.getAs[Long]("n") ===
      spark.read.parquet(s"$sf/orders.parquet").count())
  }

  test("cramers V within [0,1] on the 5x3 priority-status table") {
    val r = ops.Stats.qCramersV(spark, sf).collect().head
    assert(r.getAs[Long]("n_rows") === 5L && r.getAs[Long]("n_cols") === 3L)
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
    assert(r.getAs[Double]("chi2") >= 0.0)
  }

  test("srm check: arms partition the orders, alarm consistent with chi2") {
    val r = ops.Stats.qSrmCheck(spark, sf).collect().head
    assert(r.getAs[Long]("na") + r.getAs[Long]("nb") === r.getAs[Long]("n"))
    val chi2 = r.getAs[Double]("chi2")
    assert(chi2 >= 0.0)
    assert(r.getAs[Boolean]("srm_alarm") === (chi2 > 3.8415))
  }

  test("power analysis: requirement positive, go/no-go consistent") {
    val r = ops.Stats.qPowerAnalysis(spark, sf).collect().head
    assert(r.getAs[Double]("sigma") > 0.0 && r.getAs[Double]("mean") > 0.0)
    val req = r.getAs[Long]("n_required_per_arm")
    assert(req > 0)
    assert(r.getAs[Boolean]("powered") === (r.getAs[Long]("n") / 2 >= req))
  }

  test("jarque-bera: moments finite, JB recomputes from skew/kurt") {
    val r = ops.Stats.qJarqueBera(spark, sf).collect().head
    val (n, s, k, jb) = (r.getAs[Long]("n"), r.getAs[Double]("skew"),
      r.getAs[Double]("kurt"), r.getAs[Double]("jb"))
    assert(!s.isNaN && !k.isNaN && jb >= 0.0)
    // recompute from the 4dp-rounded components: tolerance scales with n
    assert(math.abs(jb - n / 6.0 * (s * s + k * k / 4.0)) <= n * 1e-4,
      s"jb $jb inconsistent with skew/kurt")
  }

  test("cooks distance: top-10 descending, leverage within (0,1)") {
    val rows = ops.Stats.qCooksDistance(spark, sf).collect()
    assert(rows.length === 10)
    val ds = rows.map(_.getAs[Double]("cooks_d"))
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b }, "not descending")
    rows.foreach { r =>
      val h = r.getAs[Double]("leverage")
      assert(h > 0.0 && h < 1.0, s"leverage $h out of (0,1)")
      assert(r.getAs[Double]("cooks_d") >= 0.0)
    }
  }

  test("sequential test: OBF boundary decays to the fixed-horizon cut, crossings consistent") {
    val rows = ops.Stats.qSequentialTest(spark, sf).collect()
    assert(rows.length > 5, "need a multi-day monitoring window")
    // information accumulates monotonically and ends at fraction 1
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.sameElements(ns.sorted), "cumulative n must be monotone")
    assert(rows.last.getAs[Double]("info_frac") === 1.0)
    assert(rows.last.getAs[Double]("obf_bound") === 1.96)
    // the boundary is monotone non-increasing in information
    val bounds = rows.map(_.getAs[Double]("obf_bound"))
    bounds.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi >= lo - 1e-9, s"boundary must decay: $hi -> $lo")
    }
    // crossed was decided on unrounded values; the 4dp output admits a
    // +-2e-4 boundary strip where either flag is legitimate
    rows.foreach { r =>
      val z = math.abs(r.getAs[Double]("z"))
      val b = r.getAs[Double]("obf_bound")
      if (z > b + 2e-4)
        assert(r.getAs[Boolean]("crossed"), s"|z|=$z above bound $b but not crossed")
      if (z < b - 2e-4)
        assert(!r.getAs[Boolean]("crossed"), s"|z|=$z below bound $b but crossed")
    }
  }

  test("bradley-terry: driver replay of the MM iterations matches, strengths form a simplex") {
    val rows = ops.Stats.qBradleyTerry(spark, sf).collect()
    assert(rows.length >= 2, "need at least two competitors")
    // ranks are a 1..K permutation ordered by strength desc
    assert(rows.map(_.getAs[Long]("rank")).toSeq === (1L to rows.length).toSeq)
    val s = rows.map(_.getAs[Double]("strength"))
    s.sliding(2).foreach { case Array(hi, lo) => assert(hi >= lo); case _ => }
    assert(math.abs(s.sum - 1.0) < 1e-3, s"strengths sum ${s.sum}, not a simplex")
    // full driver replay from the raw (source, token-count) pairs:
    // directed win counts, then 3 simultaneous-update MM iterations
    val toks = ops.T.documents(spark, sf)
      .selectExpr("source", "CAST(size(split(text, ' ')) AS LONG) AS t")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val srcs = toks.map(_._1).distinct.sorted
    val bySource = toks.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val wins = (for (a <- srcs; b <- srcs if a != b) yield (a, b) ->
      bySource(a).map(ta => bySource(b).count(_ < ta).toLong).sum.toDouble).toMap
    val wTot = srcs.map(a => a -> srcs.filter(_ != a).map(b => wins((a, b))).sum).toMap
    val games = (for (a <- srcs; b <- srcs if a != b) yield (a, b) ->
      (wins((a, b)) + wins((b, a)))).toMap
    var p = srcs.map(_ => 1.0)
    for (_ <- 1 to 3) {
      p = srcs.zipWithIndex.map { case (a, i) =>
        val denom = srcs.zipWithIndex.collect {
          case (b, j) if b != a && games((a, b)) > 0 => games((a, b)) / (p(i) + p(j))
        }.sum
        if (denom > 0) wTot(a) / denom else 0.0
      }
    }
    val tot = p.sum
    val expected = srcs.zip(p.map(x =>
      math.rint(x / tot * 1e5) / 1e5)).toMap
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      assert(math.abs(r.getAs[Double]("strength") - expected(src)) < 2e-5,
        s"$src: query strength ${r.getAs[Double]("strength")} != replay ${expected(src)}")
      assert(r.getAs[Long]("wins") === wTot(src).toLong)
      assert(r.getAs[Long]("games") === srcs.filter(_ != src).map(b => games((src, b))).sum.toLong)
    }
  }
}
