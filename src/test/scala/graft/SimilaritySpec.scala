package graft

import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  import SparkTestSession._

  private def pairs(df: org.apache.spark.sql.DataFrame, k: Int): Set[(Long, Long)] =
    df.filter(s"rank <= $k").select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("multi-probe LSH recall dominates single-bucket LSH") {
    val exact = pairs(ops.Similarity.qSimBruteforce(spark, sf), 3)
    val single = pairs(ops.Similarity.qSimLsh(spark, sf), 3)
    val multi = pairs(ops.Similarity.qSimLshMultiprobe(spark, sf), 3)
    val rSingle = (single & exact).size.toDouble / exact.size
    val rMulti = (multi & exact).size.toDouble / exact.size
    info(f"recall@3: single=$rSingle%.2f multi=$rMulti%.2f")
    assert(rMulti >= rSingle, "multi-probe must not lose recall")
  }

  test("nprobe=2 IVF recall dominates nprobe=1") {
    val exact = pairs(ops.Similarity.qSimBruteforce(spark, sf), 3)
    val one = pairs(ops.Similarity.qSimIvf(spark, sf), 3)
    val two = pairs(ops.Similarity.qSimIvfProbe2(spark, sf), 3)
    val rOne = (one & exact).size.toDouble / exact.size
    val rTwo = (two & exact).size.toDouble / exact.size
    info(f"recall@3: nprobe1=$rOne%.2f nprobe2=$rTwo%.2f")
    assert(rTwo >= rOne, "a second probe cell must not lose recall")
  }

  test("every ANN result is a genuine corpus vector with valid cosine") {
    val rows = ops.Similarity.qSimLshMultiprobe(spark, sf).collect()
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("cos")) <= 1.0 + 1e-9)
      assert(r.getAs[Long]("q_id") !== r.getAs[Long]("n_id"))
    }
  }
}
