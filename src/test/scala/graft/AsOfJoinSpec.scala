package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("native as-of join plans to AsOfJoinExec with clustered+sorted children") {
    val df = ops.Relational.qAsofNative(spark, sf)
    df.collect() // finalize the adaptive plan before inspecting it
    // AQE buries the operator inside QueryStageExec leaf wrappers that
    // TreeNode.collect can't cross — assert on the rendered final plan
    val rendered = df.queryExecution.executedPlan.toString
    assert(rendered.contains("AsOfJoin"), rendered)
    assert(rendered.contains("Exchange hashpartitioning(user_id"), rendered)
  }

  test("native as-of join matches the window-based encoding on the fixtures") {
    val native = ops.Relational.qAsofNative(spark, sf)
      .select("event_id", "p_us", "click_us").collect()
    val window = ops.Relational.qAsofJoin(spark, sf)
      .select("event_id", "p_us", "click_us").collect()
    assert(native.length === window.length)
    native.zip(window).foreach { case (n, w) => assert(n === w) }
  }

  test("latest-prior semantics: ties match, later rows don't, keys separate") {
    val session = spark
    import session.implicits._
    val left = Seq((1L, ts(100), "p1"), (1L, ts(200), "p2"), (2L, ts(150), "p3"))
      .toDF("k", "t", "ltag")
    val right = Seq(
      (1L, ts(50), "a"), (1L, ts(100), "b"), (1L, ts(201), "c"),
      (2L, ts(150), "d"), (3L, ts(1), "z"))
      .toDF("k", "rt", "rtag")
    val out = AsOfJoin.asof(left, right, Seq("k"), "t", "rt")
      .select($"ltag", $"rtag").orderBy($"ltag").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // p1@100 -> b (tie at 100 beats a@50); p2@200 -> still b (c is later);
    // p3@150/key2 -> d (key 1 state must not leak)
    assert(out.toSeq === Seq(("p1", "b"), ("p2", "b"), ("p3", "d")))
  }

  test("unmatched and null keys produce null right columns") {
    val session = spark
    import session.implicits._
    val left = Seq((Some(1L), ts(10), "early"), (None, ts(500), "nullkey"))
      .toDF("k", "t", "ltag")
    val right = Seq((Some(1L), ts(50), "late"), (None, ts(1), "nullmatch"))
      .toDF("k", "rt", "rtag")
    val out = AsOfJoin.asof(left, right, Seq("k"), "t", "rt")
      .select($"ltag", $"rtag").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(out("early") === None)    // only right row is after t
    assert(out("nullkey") === None)  // null keys never match
  }

  test("self-join from one scan gets fresh right-side attribute ids") {
    val session = spark
    import session.implicits._
    val ev = Seq((1L, ts(10), 5.0), (1L, ts(20), 7.0)).toDF("k", "t", "v")
    val out = AsOfJoin.asof(
      ev.select($"k", $"t", $"v"),
      ev.select($"k", $"t".as("rt"), $"v".as("rv")),
      Seq("k"), "t", "rt")
    val rows = out.orderBy($"t").select($"v", $"rv").collect()
    assert(rows.map(r => (r.getDouble(0), r.getDouble(1))).toSeq
      === Seq((5.0, 5.0), (7.0, 7.0)))
  }
}
