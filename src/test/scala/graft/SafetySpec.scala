package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Safety

class SafetySpec extends AnyFunSuite {
  import SparkTestSession._

  test("scrub masks every detector category and leaves clean text alone") {
    val session = spark
    import session.implicits._
    val rows = Seq(
      "write a.b@x.com or ping 10.0.0.1 then call 555-1234 twice 555-9999",
      "no personal data in this sentence at all")
      .toDF("s")
      .select(Safety.scrub($"s").as("clean"))
      .collect().map(_.getString(0))
    assert(rows(0) ===
      "write [EMAIL] or ping [IP] then call [PHONE] twice [PHONE]")
    assert(rows(1) === "no personal data in this sentence at all")
  }

  test("scrub is idempotent") {
    val session = spark
    import session.implicits._
    val df = Seq("a.b@x.com 10.0.0.1 555-1234").toDF("s")
    val once = df.select(Safety.scrub($"s").as("c")).collect()(0).getString(0)
    val twice = df.select(Safety.scrub(Safety.scrub($"s")).as("c"))
      .collect()(0).getString(0)
    assert(once === twice)
  }

  test("piiCount agrees with the number of maskings") {
    val session = spark
    import session.implicits._
    val df = Seq("x@y.com and z.w@q.org 555-1234 10.1.2.3 10.9.8.7 10.0.0.1")
      .toDF("s")
    val r = df.select(
      Safety.piiCount($"s", Safety.EmailPat).as("e"),
      Safety.piiCount($"s", Safety.PhonePat).as("p"),
      Safety.piiCount($"s", Safety.IpPat).as("i")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 1L, 3L)))
  }

  test("q_pii_scrub leaves no detectable PII and counts deterministically") {
    val session = spark
    import session.implicits._
    val out = ops.Safety.qPiiScrub(spark, sf).cache()
    try {
      // nothing the detectors recognize survives the scrub
      assert(out.filter(
        Safety.piiCount($"clean", Safety.EmailPat) +
          Safety.piiCount($"clean", Safety.PhonePat) +
          Safety.piiCount($"clean", Safety.IpPat) > 0).count() === 0L)
      // every contact line carries exactly one email; phones on every
      // third key, IPs on every second
      assert(out.filter($"n_email" =!= 1).count() === 0L)
      assert(out.filter($"n_phone" =!= when($"c_custkey" % 3 === 0, 1L).otherwise(0L))
        .count() === 0L)
      assert(out.filter($"n_ip" =!= when($"c_custkey" % 2 === 0, 1L).otherwise(0L))
        .count() === 0L)
    } finally out.unpersist()
  }

  test("q_pii_stats fractions are consistent with the key modulus") {
    val session = spark
    import session.implicits._
    val stats = ops.Safety.qPiiStats(spark, sf).collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      val rows = r.getAs[Long]("rows")
      val exposed = r.getAs[Double]("exposed_frac")
      assert(rows > 0)
      // phone (k%3) or ip (k%2) → 2 of every 3 keys exposed on average
      assert(exposed > 0.4 && exposed < 0.9, s"exposed_frac=$exposed")
      assert(r.getAs[Long]("emails") === rows)
    }
  }

  test("l-diversity bands partition every quasi-identifier class") {
    val session = spark
    import session.implicits._
    val rows = ops.Safety.qLDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalClasses = ops.T.documents(spark, sf)
      .groupBy($"source", floor($"n_chars" / 100)).count().count()
    assert(rows.map(_.getAs[Long]("n_classes")).sum === totalClasses)
    val totalDocs = ops.T.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === totalDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_l") >= 1L)
      assert(r.getAs[Long]("min_l") <= r.getAs[Long]("max_l"))
    }
  }

  test("dp histogram releases non-negative counts with bounded, reproducible noise") {
    val rows = ops.Safety.qDpHistogram(spark, sf).collect()
    assert(rows.nonEmpty)
    val trueCounts = ops.T.documents(spark, sf).groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("noisy_n") >= 0L)
      assert(r.getAs[Double]("epsilon") === 1.0)
      val noise = r.getAs[Double]("noise")
      // Laplace(1) draws from a 48-bit uniform stay far from the
      // ln(0) pole; anything this large means a broken transform
      assert(math.abs(noise) < 40.0)
      // released count = true count + noise, post-processed
      val expect = math.max(0.0, math.rint(trueCounts(r.getAs[String]("lang")) + noise))
      assert(math.abs(r.getAs[Long]("noisy_n") - expect) <= 1.0)
    }
    val again = ops.Safety.qDpHistogram(spark, sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("t-closeness: bands partition all quasi-identifier classes") {
    val rows = ops.Safety.qTCloseness(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Double]("min_t"), r.getAs[Double]("max_t"))
      assert(lo >= 0.0 && hi <= 1.0 && lo <= hi, s"TVD out of [0,1]: $lo..$hi")
    }
    // class count must equal the k-anonymity view of the SAME qid grid
    // restricted to (source, len_bucket): recompute directly
    import org.apache.spark.sql.functions._
    val expect = ops.T.documents(spark, sf)
      .groupBy(col("source"), floor(col("n_chars") / 100)).count().count()
    assert(rows.map(_.getAs[Long]("n_classes")).sum === expect)
  }

  test("dp mean: clipping bounds the release, epsilon recorded") {
    val rows = ops.Safety.qDpMean(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cm = r.getAs[Double]("clipped_mean")
      assert(cm > 0.0 && cm <= 500.0, s"clipped mean $cm escapes the cap")
      // Laplace(1000) noise over a >=48-char floor cannot push the
      // released mean negative at fixture group sizes
      val dp = r.getAs[Double]("dp_mean")
      assert(dp > 0.0)
      assert(r.getAs[Double]("epsilon") === 1.0)
      assert(r.getAs[Double]("clip") === 500.0)
    }
    // determinism: the content-hash noise makes the release reproducible
    val again = ops.Safety.qDpMean(spark, sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("delete cascade: affected counts consistent with direct predicates") {
    val rows = ops.Safety.qDeleteCascade(spark, sf).collect()
      .map(r => r.getAs[String]("table_name") ->
        (r.getAs[Long]("rows_total"), r.getAs[Long]("rows_affected"))).toMap
    assert(rows.keySet === Set("customer", "orders", "lineitem", "events"))
    rows.values.foreach { case (t, a) => assert(a >= 0 && a <= t) }
    // direct recomputation of the first hop
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    assert(rows("customer")._2 ===
      cust.filter("c_custkey % 97 = 0").count())
    assert(rows("customer")._1 === cust.count())
    // the cascade can only shrink relative share going down the chain
    // if referential fan-out is uniform; at minimum orders hit > 0
    assert(rows("orders")._2 > 0 && rows("lineitem")._2 > 0)
  }

  test("dp quantile: released bucket exists on the grid, rank error sane") {
    val r = ops.Safety.qDpQuantile(spark, sf).collect().head
    val n = r.getAs[Long]("n")
    assert(n === spark.read.parquet(s"$sf/orders.parquet").count())
    // the exponential mechanism picks SOME bucket; its rank error is
    // bounded by the worst utility (n/2) and the true bucket's is ~0
    val err = r.getAs[Double]("rank_err")
    assert(err >= 0.0 && err <= n / 2.0)
    assert(r.getAs[Double]("epsilon") === 0.01)
    // determinism of the hash-Gumbel release
    val again = ops.Safety.qDpQuantile(spark, sf).collect().head
    assert(r.toString === again.toString)
  }
}
