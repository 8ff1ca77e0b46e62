package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the production MinHash banding choice (Dedup.ProductionBands)
  * to the MEASURED S-curve from qLshBandSweep, so the constant stays an
  * engineering decision backed by data rather than a frozen guess. If
  * the corpus shifts enough that 4×4 stops dominating (another layout
  * finds more true pairs, or stops costing fewer candidates than 8×2),
  * this spec fails and the constant gets re-derived from the new sweep.
  */
class LshBandingSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val sweep: Map[String, (Long, Long, Double)] =
    ops.Dedup.qLshBandSweep(spark, sf).collect().map { r =>
      r.getAs[String]("layout") -> ((
        r.getAs[Long]("n_candidates"),
        r.getAs[Long]("n_verified"),
        r.getAs[Double]("precision")))
    }.toMap

  private val prodLayout =
    s"${ops.Dedup.ProductionBands}x${ops.Dedup.SigComponents / ops.Dedup.ProductionBands}"

  test("sweep covers the three 16-component layouts incl. the production one") {
    assert(sweep.keySet === Set("8x2", "4x4", "2x8"))
    assert(sweep.contains(prodLayout))
  }

  test("production layout finds the maximal verified yield at the 0.8 threshold") {
    val (_, prodVerified, _) = sweep(prodLayout)
    val maxVerified = sweep.values.map(_._2).max
    assert(prodVerified === maxVerified,
      s"a non-production layout finds more true pairs than $prodLayout: $sweep")
  }

  test("production layout dominates the wider 8x2 layout: fewer candidates, higher precision") {
    val (prodCand, _, prodPrec) = sweep(prodLayout)
    val (wideCand, _, widePrec) = sweep("8x2")
    assert(prodCand < wideCand,
      s"$prodLayout should shuffle fewer candidates than 8x2: $sweep")
    assert(prodPrec > widePrec,
      s"$prodLayout should be more precise than 8x2: $sweep")
  }

  test("production dedup pair count equals the sweep's verified yield for its layout") {
    val (_, prodVerified, _) = sweep(prodLayout)
    val pairs = ops.Dedup.qDedupMinhash(spark, sf).count()
    assert(pairs === prodVerified,
      s"qDedupMinhash must run the same banding the sweep measured for $prodLayout")
  }
}
