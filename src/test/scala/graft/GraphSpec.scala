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

  test("bfs distances satisfy the shortest-path relaxation invariant") {
    val rows = ops.Graph.qGraphBfs(spark, sf).collect()
    val dist = rows.map { r =>
      val d = if (r.isNullAt(r.fieldIndex("d"))) None else Some(r.getAs[Long]("d"))
      r.getAs[String]("t") -> d
    }.toMap
    // exactly one seed at distance 0, and it is the min node id
    val zeros = dist.filter(_._2.contains(0L)).keys.toSeq
    assert(zeros === Seq(dist.keys.min))
    // the fixture graph's diameter is far below the 4 relaxation
    // rounds, so the result is the fixpoint: every edge is relaxed
    val edges = ops.Relational.qTransitions(spark, sf).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")))
    edges.foreach { case (u, v) =>
      (dist(u), dist(v)) match {
        case (Some(du), dv) =>
          assert(dv.exists(_ <= du + 1), s"edge $u->$v not relaxed")
        case _ => // unreached source constrains nothing
      }
    }
  }

  test("triangle count matches an in-memory brute force") {
    val e = ops.Relational.qTransitions(spark, sf).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")))
      .filter { case (u, v) => u != v }
      .map { case (u, v) => if (u < v) (u, v) else (v, u) }
      .toSet
    val nodes = e.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val expected = (for {
      a <- nodes; b <- nodes if a < b && e((a, b))
      c <- nodes if b < c && e((b, c)) && e((a, c))
    } yield 1).size.toLong
    val got = ops.Graph.qGraphTriangles(spark, sf).collect().head
      .getAs[Long]("n_triangles")
    assert(got === expected)
  }

  test("hits authority and hub are L1-normalized non-negative distributions") {
    val rows = ops.Graph.qHits(spark, sf).collect()
    assert(rows.length > 1)
    val auth = rows.map(_.getAs[Double]("authority"))
    val hub = rows.map(_.getAs[Double]("hub"))
    assert(math.abs(auth.sum - 1.0) < 1e-4)
    assert(math.abs(hub.sum - 1.0) < 1e-4)
    (auth ++ hub).foreach(x => assert(x >= 0.0 && x <= 1.0))
    // node set matches the degree profile's node set
    val degNodes = ops.Graph.qGraphDegrees(spark, sf).collect()
      .map(_.getAs[String]("t")).toSet
    assert(rows.map(_.getAs[String]("t")).toSet === degNodes)
  }

  test("label propagation assigns every node a community that is itself a node") {
    val rows = ops.Graph.qLabelProp(spark, sf).collect()
    assert(rows.nonEmpty)
    val nodes = rows.map(_.getAs[String]("t")).toSet
    rows.foreach { r =>
      assert(nodes.contains(r.getAs[String]("community")),
        s"community ${r.getAs[String]("community")} is not a node")
    }
    // deterministic synchronous update: a re-run is identical
    val again = ops.Graph.qLabelProp(spark, sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("modularity contributions are bounded and consistent with the partition") {
    val rows = ops.Graph.qGraphModularity(spark, sf).collect()
    assert(rows.nonEmpty)
    var q = 0.0
    rows.foreach { r =>
      val contrib = r.getAs[Double]("contrib")
      assert(contrib >= -1.0 && contrib <= 1.0)
      q += contrib
      // deg_c counts intra edges twice (once per endpoint)
      assert(2 * r.getAs[Long]("intra_w") <= r.getAs[Long]("deg_w"))
      assert(r.getAs[Long]("n_nodes") >= 1L)
    }
    assert(q >= -1.0 && q <= 1.0, s"total modularity $q out of range")
    // every undirected-graph node is in exactly one community
    val nNodes = ops.Graph.qLabelProp(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_nodes")).sum === nNodes)
  }

  test("k-core peel: 4-round curve, monotonically non-increasing, strictly peeling") {
    val rows = ops.Graph.qKcorePeel(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("peel_round")).toSeq === Seq(0, 1, 2, 3))
    val nodes = rows.map(_.getAs[Long]("n_nodes"))
    val edges = rows.map(_.getAs[Long]("n_edges"))
    assert(nodes.zip(nodes.tail).forall { case (a, b) => a >= b })
    assert(edges.zip(edges.tail).forall { case (a, b) => a >= b })
    // the data-derived k (mean degree) must actually remove something
    assert(edges.head > edges.last,
      s"peel threshold never bit: ${edges.mkString(",")}")
  }

  test("personalized pagerank: mass conserved, seed dominates its own walk") {
    val rows = ops.Graph.qPpr(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Double]("rank")).sum
    // restart + damping conserve unit mass (up to display rounding)
    assert(math.abs(total - 1.0) < 1e-3, s"mass $total drifted")
    rows.foreach(r => assert(r.getAs[Double]("rank") >= 0.0))
    // output is rank-desc; the seed's restart mass keeps it on top here
    assert(rows.head.getAs[Boolean]("is_seed"),
      "seed must outrank non-seeds in its own personalized walk")
    assert(rows.count(_.getAs[Boolean]("is_seed")) === 1)
  }

  test("clustering coefficient: bounded, zero iff no triangle at the node") {
    val rows = ops.Graph.qClusteringCoeff(spark, sf).collect()
    assert(rows.nonEmpty)
    // corner sum over nodes = 3x the global triangle count
    val globalTri = ops.Graph.qGraphTriangles(spark, sf)
      .collect().head.getAs[Long]("n_triangles")
    assert(rows.map(_.getAs[Long]("tri")).sum === 3 * globalTri)
    rows.foreach { r =>
      val cc = r.getAs[Double]("cc")
      assert(cc >= 0.0 && cc <= 1.0, s"cc $cc out of [0,1]")
      assert((cc == 0.0) == (r.getAs[Long]("tri") == 0L ||
        r.getAs[Long]("deg") < 2))
    }
  }

  test("assortativity is a correlation: within [-1, 1]") {
    val r = ops.Graph.qAssortativity(spark, sf).collect().head
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 && a <= 1.0, s"assortativity $a out of [-1,1]")
    assert(r.getAs[Long]("n_edges") > 0)
  }
}
