package graft

import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  import SparkTestSession._

  test("pagerank is a probability distribution that favors high in-flow nodes") {
    val rows = ops.Graph.qPagerank(spark, sf).collect()
    assert(rows.length > 1)
    val ranks = rows.map(r => r.getAs[String]("t") -> r.getAs[Double]("rank")).toMap
    // total mass 1 (damping + dangling redistribution conserve it)
    assert(math.abs(ranks.values.sum - 1.0) < 1e-4)
    ranks.values.foreach(r => assert(r > 0.0 && r < 1.0))
    // the node with the highest weighted in-flow should out-rank the lowest
    val deg = ops.Graph.qGraphDegrees(spark, sf).collect()
      .map(r => r.getAs[String]("t") -> r.getAs[Long]("in_w")).toMap
    val maxIn = deg.maxBy(_._2)._1
    val minIn = deg.minBy(_._2)._1
    assert(ranks(maxIn) >= ranks(minIn))
  }

  test("degree profile is consistent with the transition matrix") {
    val edges = ops.Relational.qTransitions(spark, sf).collect()
    val totalN = edges.map(_.getAs[Long]("n")).sum
    val rows = ops.Graph.qGraphDegrees(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("out_w")).sum === totalN)
    assert(rows.map(_.getAs[Long]("in_w")).sum === totalN)
    assert(rows.map(_.getAs[Long]("out_deg")).sum === edges.length.toLong)
    assert(rows.map(_.getAs[Long]("in_deg")).sum === edges.length.toLong)
  }
}
