package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("native functions callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       graft_hamming('0101', '0001') AS h""".stripMargin).collect()(0)
    assert(math.abs(r.getAs[Double]("c") - 1.0) < 1e-12)
    assert(r.getAs[Int]("h") === 1)
    // bloom probe end-to-end in SQL: sketch one value, hit it, miss another
    val b = spark.sql(
      """WITH s AS (SELECT array(-1L) AS bloom)
        |SELECT graft_bloom_contains(transform(bloom, x -> x), xxhash64('v'), 5) AS hit
        |FROM s""".stripMargin).collect()(0)
    assert(b.getAs[Boolean]("hit"), "all-ones bitset must report contained")
  }

  test("extensions class injects the same functions into a fresh session") {
    val ext = new GraftExtensions
    // simulate what spark.sql.extensions does at session build
    val e = new org.apache.spark.sql.SparkSessionExtensions
    ext(e)
    // builder list is non-empty and builders construct the expressions
    val expr = GraftExtensions.definitions.head._3(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))))
    assert(expr.isInstanceOf[graft.functions.CosineSimilarity])
  }
}
