package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.F

class ExpressionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("cosine similarity: known values, both codegen and interpreted paths") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f), 1.0),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f), -1.0)).toDF("a", "b", "want")
    val got = df.withColumn("cos", F.cosineSimilarity($"a", $"b")).collect()
    got.foreach { r =>
      assert(math.abs(r.getAs[Double]("cos") - r.getAs[Double]("want")) < 1e-12)
    }
    // interpreted path (codegen off) must agree
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val got2 = df.withColumn("cos", F.cosineSimilarity($"a", $"b")).collect()
      assert(got.map(_.getAs[Double]("cos")).toSeq ===
        got2.map(_.getAs[Double]("cos")).toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("cosine similarity: zero vector yields null, null input yields null") {
    import spark.implicits._
    val df = Seq(
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f)),
      (Array(1.0f, 1.0f), Array(0.0f, 0.0f))).toDF("a", "b")
    assert(df.withColumn("c", F.cosineSimilarity($"a", $"b"))
      .filter($"c".isNull).count() === 2)
    val withNull = df.withColumn("c",
      F.cosineSimilarity(lit(null).cast("array<double>"), $"b".cast("array<double>")))
    assert(withNull.filter($"c".isNull).count() === 2)
  }

  test("hamming distance: equal, differing, mismatched-length strings") {
    import spark.implicits._
    val df = Seq(
      ("0101", "0101", Some(0)),
      ("0101", "0111", Some(1)),
      ("0000", "1111", Some(4)),
      ("01", "0101", None)).toDF("a", "b", "want")
    val got = df.withColumn("d", F.hammingDistance($"a", $"b")).collect()
    got.foreach { r =>
      val want = if (r.isNullAt(2)) null else Integer.valueOf(r.getInt(2))
      assert(r.get(3) === want, s"for ${r.getString(0)}/${r.getString(1)}")
    }
  }

  test("native cosine matches the HOF formulation on real embeddings") {
    import spark.implicits._
    val e = ops.T.embeddings(spark, sf).limit(50)
      .select($"vec_id", $"embedding")
    val a = e.select($"vec_id".as("ai"), $"embedding".as("va"))
    val b = e.select($"vec_id".as("bi"), $"embedding".as("vb"))
    val pairs = a.join(b, $"ai" < $"bi").limit(500)
      .withColumn("native", F.cosineSimilarity($"va", $"vb"))
      .withColumn("hofd", expr(
        """aggregate(zip_with(cast(va AS array<double>), cast(vb AS array<double>), (x, y) -> x * y), 0D, (acc, x) -> acc + x)
          | / sqrt(aggregate(cast(va AS array<double>), 0D, (acc, x) -> acc + x * x)
          |       * aggregate(cast(vb AS array<double>), 0D, (acc, x) -> acc + x * x))""".stripMargin))
    assert(pairs.filter($"native" =!= $"hofd").count() === 0,
      "native kernel must be bit-identical to the HOF formulation")
  }

  test("editWithin1 agrees with levenshtein <= 1 on random ASCII pairs") {
    import spark.implicits._
    // deterministic generator: base strings plus single-edit mutants
    // and a spread of >1-edit controls
    val rnd = new scala.util.Random(42)
    val alpha = "abcdef#0123456789"
    def rstr(n: Int) = (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val cases = (1 to 400).flatMap { _ =>
      val s = rstr(3 + rnd.nextInt(15))
      val i = rnd.nextInt(s.length)
      val sub = s.updated(i, alpha(rnd.nextInt(alpha.length)))
      val del = s.take(i) + s.drop(i + 1)
      val ins = s.take(i) + alpha(rnd.nextInt(alpha.length)) + s.drop(i)
      val far = rstr(3 + rnd.nextInt(15))
      Seq((s, s), (s, sub), (s, del), (s, ins), (s, far))
    }
    val df = cases.toDF("a", "b")
      .withColumn("fast", F.editWithin1($"a", $"b"))
      .withColumn("slow", levenshtein($"a", $"b") <= 1)
    assert(df.filter($"fast" =!= $"slow").count() === 0,
      "bounded two-pointer kernel must agree with full levenshtein")
    // interpreted path must agree with codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val df2 = cases.toDF("a", "b")
        .withColumn("fast", F.editWithin1($"a", $"b"))
        .withColumn("slow", levenshtein($"a", $"b") <= 1)
      assert(df2.filter($"fast" =!= $"slow").count() === 0)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("jaroWinkler: textbook values, DuckDB empty-string convention, codegen==interpreted") {
    import spark.implicits._
    val cases = Seq(
      // classic worked examples (exact rationals of the standard algorithm)
      ("martha", "marhta", 0.9611111111111111),
      ("dwayne", "duane", 0.8400000000000001),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("abc", "abc", 1.0),
      // oracle (DuckDB/rapidfuzz) convention: either side empty -> 0
      ("", "", 0.0),
      ("a", "", 0.0),
      ("", "a", 0.0),
      // no matches at all
      ("abc", "xyz", 0.0)).toDF("a", "b", "want")
    def run() = cases.withColumn("jw", F.jaroWinkler($"a", $"b")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    val got = run()
    got.foreach { case (a, b, want, jw) =>
      assert(jw === want, s"jw($a, $b)")
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run().toSeq === got.toSeq)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("jaroWinkler: symmetric, in [0,1], prefix boost only above 0.7") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefgh "
    def rstr(n: Int) = (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val cases = (1 to 300).map(_ => (rstr(1 + rnd.nextInt(20)), rstr(1 + rnd.nextInt(20))))
    val df = cases.toDF("a", "b")
      .withColumn("ab", F.jaroWinkler($"a", $"b"))
      .withColumn("ba", F.jaroWinkler($"b", $"a"))
    assert(df.filter($"ab" =!= $"ba").count() === 0, "symmetry")
    assert(df.filter($"ab" < 0 || $"ab" > 1).count() === 0, "range")
  }
}
