package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct contract of [[graft.ops.Quantiles.exact]]: bit-identical to
  * Spark's built-in exact `percentile` aggregate (quantile_cont
  * interpolation) — the whole point of the bucketed-rank-location
  * rewrite is swapping an O(group) value buffer for bounded state
  * WITHOUT changing a single output bit, so equality here is exact,
  * not approximate.
  */
class QuantilesSpec extends AnyFunSuite {
  import SparkTestSession._

  private val ps = Seq(0.0, 0.01, 0.25, 0.5, 0.9, 0.99, 1.0)

  test("global quantiles equal the built-in exact percentile bit-for-bit") {
    import spark.implicits._
    // adversarial value mix: duplicates, negatives, a heavy tie block,
    // huge outliers, and a deterministic pseudo-random bulk
    val vals = (1 to 5000).map(i => ((i * 2654435761L) % 100000L).toDouble / 7.0) ++
      Seq.fill(500)(42.0) ++ Seq(-1e12, 1e12, -0.0, 0.0)
    val df = vals.toDF("v")
    val got = ops.Quantiles.exact(df, Seq.empty, "v", ps)
      .orderBy($"p").collect().map(r => r.getAs[Double]("p") -> r.getAs[Double]("q")).toMap
    val want = df.agg(expr(
        s"percentile(v, array(${ps.mkString(",")}))").as("qs"))
      .collect()(0).getSeq[Double](0)
    ps.zip(want).foreach { case (p, w) =>
      withClue(s"p=$p: ") { assert(got(p) === w) }
    }
  }

  test("grouped quantiles equal the built-in per group on fixture data") {
    import spark.implicits._
    val src = ops.T.lineitem(spark, sf)
      .select($"l_returnflag".as("k"), $"l_extendedprice".as("v"))
    val got = ops.Quantiles.exact(src, Seq("k"), "v", ps)
      .select($"k", $"p", $"q")
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val want = src.groupBy($"k")
      .agg(expr(s"percentile(v, array(${ps.mkString(",")}))").as("qs"))
      .collect().flatMap { r =>
        val k = r.getString(0)
        ps.zip(r.getSeq[Double](1)).map { case (p, q) => (k, p) -> q }
      }.toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (key, w) =>
      withClue(s"$key: ") { assert(got(key) === w) }
    }
    // the per-key count column matches the true non-null count
    val counts = ops.Quantiles.exact(src, Seq("k"), "v", Seq(0.5))
      .select($"k", $"n").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val trueCounts = src.filter($"v".isNotNull).groupBy($"k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === trueCounts)
  }
}
