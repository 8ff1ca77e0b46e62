package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.scalatest.funsuite.AnyFunSuite

case class Ev(ts: Timestamp, event_type: String, value: Double, user_id: Long)
case class DEv(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)
case class LEv(event_id: Long, ts: Timestamp, user_id: Long)
case class Pur(p_id: Long, user_id: Long, p_ts: Timestamp)
case class Clk(c_id: Long, c_user: Long, c_ts: Timestamp)
case class UserRow(user_id: Long, value: Double)

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling windows over a MemoryStream match the batch transform") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val data = Seq(
      Ev(t("2024-01-01 00:10:00"), "click", 1.0, 1L),
      Ev(t("2024-01-01 00:50:00"), "click", 2.0, 2L),
      Ev(t("2024-01-01 01:10:00"), "view", 3.0, 1L),
      Ev(t("2024-01-01 02:05:00"), "click", 4.0, 3L))
    val ms = MemoryStream[Ev]
    ms.addData(data: _*)
    val q = ops.StreamingOps.tumbling(ms.toDF())
      .writeStream.outputMode("complete").format("memory")
      .queryName("tumbling_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .orderBy("win_start_us", "event_type").collect().toSeq
      val batch = ops.StreamingOps.tumbling(data.toDF())
        .orderBy("win_start_us", "event_type").collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("windowed top-k: rank over the streamed complete-mode state matches batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val data = Seq(
      Ev(t("2024-01-01 00:10:00"), "click", 1.0, 1L),
      Ev(t("2024-01-01 00:20:00"), "view", 9.0, 2L),
      Ev(t("2024-01-01 00:30:00"), "purchase", 5.0, 1L),
      Ev(t("2024-01-01 00:40:00"), "cart", 3.0, 3L),
      Ev(t("2024-01-01 01:10:00"), "view", 2.0, 1L),
      Ev(t("2024-01-01 01:15:00"), "click", 7.0, 2L))
    val ms = MemoryStream[Ev]
    ms.addData(data: _*)
    // stage 1 streams (incremental agg); stage 2 ranks the sink table —
    // the production streaming-top-k shape (rank in foreachBatch /
    // downstream of the stateful agg)
    val q = ops.StreamingOps.hourlyRevenue(ms.toDF())
      .writeStream.outputMode("complete").format("memory")
      .queryName("topk_hourly").start()
    try {
      q.processAllAvailable()
      val streamed = ops.StreamingOps.topkOf(spark.table("topk_hourly"))
        .orderBy("win_start_us", "rank").collect().toSeq
      val batch = ops.StreamingOps.topkOf(
          ops.StreamingOps.hourlyRevenue(data.toDF()))
        .orderBy("win_start_us", "rank").collect().toSeq
      assert(streamed === batch)
      // hour 0 has 4 types -> exactly 3 survive; the dropped one is the
      // minimum-revenue type
      val hour0 = streamed.filter(_.getAs[Long]("win_start_us") ===
        t("2024-01-01 00:00:00").getTime * 1000L)
      assert(hour0.map(_.getAs[String]("event_type")).toSet ===
        Set("view", "purchase", "cart"))
    } finally q.stop()
  }

  test("engine watermark drops equal the batch late-drop transform per event") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // one event per trigger, fed in ARRIVAL order (ts + shard lag:
    // user 0 punctual, user 3 trails 15min), so Spark's watermark
    // before a row is max(ts of earlier arrivals) - 10min — exactly
    // the strict-prefix max lateDropped() replays in batch
    val data = Seq(
      LEv(0L, t("2024-01-01 00:00:00"), 0L), // arr 00:00
      LEv(1L, t("2024-01-01 00:05:00"), 3L), // arr 00:20, wm -00:10 -> kept
      LEv(2L, t("2024-01-01 00:20:00"), 0L), // arr 00:20, wm -00:05 -> kept
      LEv(3L, t("2024-01-01 00:08:00"), 3L), // arr 00:23, wm 00:10 -> dropped
      LEv(4L, t("2024-01-01 00:40:00"), 0L), // arr 00:40, wm 00:10 -> kept
      LEv(5L, t("2024-01-01 00:25:00"), 3L)) // arr 00:40, wm 00:30 -> dropped
    val ms = MemoryStream[LEv]
    val q = ms.toDF().withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id", "ts")
      .writeStream.outputMode("append").format("memory")
      .queryName("late_out").start()
    try {
      data.foreach { ev => ms.addData(ev); q.processAllAvailable() }
      val droppedStreaming = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      val predicted = ops.StreamingOps.lateDropped(data.toDF())
      assert(predicted.select("event_id").collect().map(_.getLong(0)).sorted
        === Array(3L, 5L))
      assert(droppedStreaming === predicted.count())
    } finally q.stop()
  }

  test("watermark drops late events in append mode") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val agg = ms.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(unix_micros($"window.start").as("ws"), $"event_type", $"n")
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("wm_out").start()
    try {
      ms.addData(Ev(t("2024-01-01 00:10:00"), "click", 1.0, 1L))
      q.processAllAvailable()
      // advance watermark far past the first window's end
      ms.addData(Ev(t("2024-01-01 03:00:00"), "click", 1.0, 1L))
      q.processAllAvailable()
      val afterClose = spark.table("wm_out").collect()
      assert(afterClose.length === 1) // [00:00,01:00) finalized with n=1
      assert(afterClose(0).getAs[Long]("n") === 1L)
      // this event is 3h behind the watermark -> must be dropped
      ms.addData(Ev(t("2024-01-01 00:20:00"), "click", 1.0, 1L))
      q.processAllAvailable()
      ms.addData(Ev(t("2024-01-01 05:00:00"), "click", 1.0, 1L))
      q.processAllAvailable()
      val finalRows = spark.table("wm_out")
        .filter($"ws" === 1704067200000000L).collect() // 2024-01-01 00:00 UTC
      assert(finalRows.length === 1 && finalRows(0).getAs[Long]("n") === 1L,
        "late event leaked into a closed window")
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with prior-hour clicks") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val msP = MemoryStream[Pur]
    val msC = MemoryStream[Clk]
    val joined = ops.StreamingOps.intervalJoin(
      msP.toDF().withWatermark("p_ts", "2 hours"),
      msC.toDF().withWatermark("c_ts", "2 hours"))
      .select($"p_id", $"c_id")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssj_out").start()
    try {
      msC.addData(
        Clk(10L, 1L, t("2024-01-01 00:30:00")), // within p1's hour
        Clk(11L, 1L, t("2024-01-01 02:30:00")), // after p1 -> no match
        Clk(12L, 2L, t("2024-01-01 00:40:00"))) // >1h before p2 -> no match
      msP.addData(
        Pur(1L, 1L, t("2024-01-01 01:00:00")),
        Pur(2L, 2L, t("2024-01-01 03:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("ssj_out").orderBy("p_id", "c_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(streamed === Seq((1L, 10L)))
      // same transform over the same rows in batch mode agrees
      val batch = ops.StreamingOps.intervalJoin(
        Seq(Pur(1L, 1L, t("2024-01-01 01:00:00")),
          Pur(2L, 2L, t("2024-01-01 03:00:00"))).toDF(),
        Seq(Clk(10L, 1L, t("2024-01-01 00:30:00")),
          Clk(11L, 1L, t("2024-01-01 02:30:00")),
          Clk(12L, 2L, t("2024-01-01 00:40:00"))).toDF())
        .select($"p_id", $"c_id").orderBy("p_id", "c_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(batch === streamed)
    } finally q.stop()
  }

  test("outer stream-stream join emits unmatched purchases at watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val msP = MemoryStream[Pur]
    val msC = MemoryStream[Clk]
    val joined = ops.StreamingOps.intervalJoinOuter(
      msP.toDF().withWatermark("p_ts", "10 minutes"),
      msC.toDF().withWatermark("c_ts", "10 minutes"))
      .select($"p_id", $"c_id")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssoj_out").start()
    try {
      msC.addData(Clk(10L, 1L, t("2024-01-01 00:30:00")))
      msP.addData(
        Pur(1L, 1L, t("2024-01-01 01:00:00")), // matches click 10
        Pur(2L, 2L, t("2024-01-01 01:00:00"))) // no click ever
      q.processAllAvailable()
      // advance both watermarks far past p2's eviction bound so the
      // engine proves no future click can match it
      msC.addData(Clk(99L, 9L, t("2024-01-01 09:00:00")))
      msP.addData(Pur(98L, 9L, t("2024-01-01 09:00:00")))
      q.processAllAvailable()
      q.processAllAvailable()
      val rows = spark.table("ssoj_out")
        .filter($"p_id" < 90).orderBy("p_id")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
      assert(rows === Seq((1L, Some(10L)), (2L, None)),
        "matched pair plus exactly-once outer emission")
      // batch replay of the same transform agrees on the outer row
      val batch = ops.StreamingOps.intervalJoinOuter(
        Seq(Pur(1L, 1L, t("2024-01-01 01:00:00")),
          Pur(2L, 2L, t("2024-01-01 01:00:00"))).toDF(),
        Seq(Clk(10L, 1L, t("2024-01-01 00:30:00"))).toDF())
        .select($"p_id", $"c_id").orderBy("p_id")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
      assert(batch === rows)
    } finally q.stop()
  }

  test("pattern detection as incremental per-user state matches the batch operator") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ev = ops.T.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_type")
      .orderBy("ts_us", "event_type").collect()
      .map(r => graft.streaming.Stateful.PatEvent(
        r.getLong(0), r.getLong(1), r.getString(2)))
    val ms = MemoryStream[graft.streaming.Stateful.PatEvent]
    val out = graft.streaming.Stateful.patternCounts(ms.toDS())
    val q = out.writeStream.format("memory").queryName("pat_out")
      .outputMode("update").start()
    try {
      // three time-ordered triggers: state must carry the pattern
      // across micro-batch boundaries
      ev.grouped(ev.length / 3 + 1).foreach { chunk =>
        ms.addData(chunk.toSeq: _*); q.processAllAvailable()
      }
      val got = spark.table("pat_out").groupBy($"user_id")
        .agg(max($"n_purchases").as("p"), max($"n_matched").as("m"))
        .filter($"p" > 0).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("p"),
          r.getAs[Long]("m"))).toSet
      val batch = ops.Analytics.qPatternMatch(spark, sf).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_purchases"),
          r.getAs[Long]("n_matched"))).toSet
      assert(got === batch, "streaming pattern counts must equal the batch operator")
    } finally q.stop()
  }

  test("group-sequential monitor as streaming state matches the batch looks at trigger boundaries") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ev = ops.T.events(spark, sf)
      .select($"user_id", ($"event_type" === "purchase").as("succ"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .orderBy("day").collect()
      .map(r => (r.getLong(2),
        graft.streaming.Stateful.ArmEvent(r.getLong(0), r.getBoolean(1))))
    val days = ev.map(_._1).distinct.sorted
    // three triggers split at day boundaries; the planned horizon is
    // the realized total so the streaming boundary matches the batch
    // audit's realized-information normalizer
    val cuts = Seq(days(days.length / 3 - 1), days(2 * days.length / 3 - 1), days.last)
    val ms = MemoryStream[graft.streaming.Stateful.ArmEvent]
    val out = graft.streaming.Stateful.sequentialMonitor(ms.toDS(), ev.length.toLong)
    val q = out.writeStream.format("memory").queryName("seqmon_out")
      .outputMode("update").start()
    try {
      val batch = ops.Stats.qSequentialTest(spark, sf).collect()
        .map(r => r.getAs[Long]("day") -> r).toMap
      var prev = Long.MinValue
      cuts.foreach { cut =>
        val chunk = ev.filter { case (d, _) => d > prev && d <= cut }.map(_._2)
        prev = cut
        ms.addData(chunk.toSeq: _*); q.processAllAvailable()
        val look = spark.table("seqmon_out").orderBy($"n").collect().last
        val b = batch(cut)
        assert(look.getAs[Long]("n") === b.getAs[Long]("n"),
          s"cumulative n diverged at day $cut")
        assert(math.abs(look.getAs[Double]("z") - b.getAs[Double]("z")) < 1e-4,
          s"z diverged at day $cut")
        assert(math.abs(look.getAs[Double]("obf_bound") - b.getAs[Double]("obf_bound")) < 1e-4)
        assert(look.getAs[Boolean]("crossed") === b.getAs[Boolean]("crossed"))
      }
    } finally q.stop()
  }

  test("streaming changelog MERGE matches the batch rebuild under out-of-order delivery") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the q_export_incremental changelog convention: scn = event_id,
    // every 17th id a tombstone, values rounded to 4 dp
    val opsLog = ops.T.events(spark, sf)
      .select($"user_id", $"event_id".as("scn"),
        expr("unix_micros(ts)").as("ts_us"),
        round($"value", 4).as("value"),
        when($"event_id" % 17 === 0, lit("D")).otherwise(lit("U")).as("op"))
      .collect()
      .map(r => graft.streaming.Stateful.CdcOp(
        r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
    // adversarial arrival order: interleave by scn % 3 so each trigger
    // carries a mix of old and new commits (out-of-order across AND
    // within triggers)
    val chunks = (0 until 3).map(k => opsLog.filter(_.scn % 3 == k))
    val ms = MemoryStream[graft.streaming.Stateful.CdcOp]
    val out = graft.streaming.Stateful.cdcMergeState(ms.toDS())
    val q = out.writeStream.format("memory").queryName("cdc_merge_out")
      .outputMode("update").start()
    try {
      chunks.foreach { c => ms.addData(c.toSeq: _*); q.processAllAvailable() }
      val streamed = spark.table("cdc_merge_out")
        // update mode appends a row per (trigger, key): the final state
        // is the max-scn row per key, which the state contract says is
        // also the LAST emitted
        .groupBy($"user_id")
        .agg(max_by(struct($"last_scn", $"last_ts_us", $"last_value", $"live"),
          $"last_scn").as("s"))
        .select($"user_id", $"s.last_scn", $"s.last_ts_us", $"s.last_value", $"s.live")
        .filter($"live")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      // batch rebuild: latest op per key over the whole changelog
      val rebuilt = opsLog.groupBy(_.user_id).values
        .map(_.maxBy(_.scn)).filter(_.op == "U")
        .map(e => (e.user_id, e.scn, e.ts_us, e.value)).toSet
      assert(streamed === rebuilt,
        "streamed MERGE state diverged from the batch rebuild")
      // and the batch query's own accounting agrees on the live count
      val nFinal = ops.ExportOps.qExportIncremental(spark, sf)
        .collect().head.getAs[Long]("n_final")
      assert(streamed.size.toLong === nFinal)
    } finally q.stop()
  }

  test("foreachBatch upsert sink is idempotent under batch replay") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[UserRow]
    val root = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val sink = new graft.streaming.Stateful.BatchUpsertSink(root)
    def snap(): Map[Long, Double] =
      sink.snapshot(spark).collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("total")).toMap
    val q = graft.streaming.Stateful.upsertTotals(ms.toDF(), sink)
    try {
      ms.addData(UserRow(1L, 10.0), UserRow(2L, 5.0))
      q.processAllAvailable()
      ms.addData(UserRow(1L, 2.5))
      q.processAllAvailable()
      val settled = snap()
      assert(settled === Map(1L -> 12.5, 2L -> 5.0),
        "update-mode totals upserted per key")
      // simulate the at-least-once replay foreachBatch can deliver:
      // re-applying an already-applied (batchId, data) pair overwrites
      // that batch's own directory with identical rows — a no-op
      sink.merge(Seq((1L, 10.0), (2L, 5.0)).toDF("user_id", "total"), 0L)
      sink.merge(Seq((1L, 12.5)).toDF("user_id", "total"), 1L)
      assert(snap() === settled, "replay must be a no-op")
      // a genuinely new batch still applies
      sink.merge(Seq((3L, 7.0)).toDF("user_id", "total"), 99L)
      assert(snap()(3L) === 7.0)
    } finally q.stop()
  }

  test("upsert sink compaction collapses batch dirs and preserves the snapshot") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val sink = new graft.streaming.Stateful.BatchUpsertSink(root)
    def snap(): Map[Long, Double] =
      sink.snapshot(spark).collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("total")).toMap
    def dirs(): Set[String] = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(root))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("b=")).toSet
      } finally s.close()
    }
    // five committed batches: keys updated across batches so max_by
    // resolution is genuinely exercised (1 peaks early, 2 mid, 3 late)
    sink.merge(Seq((1L, 10.0), (2L, 1.0)).toDF("user_id", "total"), 0L)
    sink.merge(Seq((1L, 12.5)).toDF("user_id", "total"), 1L)
    sink.merge(Seq((2L, 6.0), (3L, 2.0)).toDF("user_id", "total"), 2L)
    sink.merge(Seq((4L, 9.0)).toDF("user_id", "total"), 3L)
    sink.merge(Seq((3L, 5.0)).toDF("user_id", "total"), 4L)
    val before = snap()
    assert(before === Map(1L -> 12.5, 2L -> 6.0, 3L -> 5.0, 4L -> 9.0))
    assert(dirs().size === 5)

    assert(sink.compact(spark) === 3)
    assert(dirs() === Set("b=3", "b=4"), "history collapsed below the head batch")
    assert(snap() === before, "compaction must not change the resolved table")

    // head-batch replay AFTER compaction still commutes (the one batch
    // replay can touch is never compacted)
    sink.merge(Seq((3L, 5.0)).toDF("user_id", "total"), 4L)
    assert(snap() === before)
    // compaction is idempotent at the two-dir fixpoint
    assert(sink.compact(spark) === 0)
    assert(dirs() === Set("b=3", "b=4"))
  }

  test("compaction aborts and rolls back when a rename fails; nothing is deleted") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-compact-fail").toString
    val sink = new graft.streaming.Stateful.BatchUpsertSink(root)
    sink.merge(Seq((1L, 10.0), (2L, 1.0)).toDF("user_id", "total"), 0L)
    sink.merge(Seq((1L, 12.5)).toDF("user_id", "total"), 1L)
    sink.merge(Seq((2L, 6.0)).toDF("user_id", "total"), 2L)
    sink.merge(Seq((3L, 9.0)).toDF("user_id", "total"), 3L)
    def snap(): Map[Long, Double] =
      sink.snapshot(spark).collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("total")).toMap
    def visible(): Set[String] = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(root))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("b=")).toSet
      } finally s.close()
    }
    val before = snap()
    // Block the SECOND trash rename (olds are renamed in id order, so
    // b=0 succeeds first): a plain file squatting on .trash-b=1 makes
    // FileSystem.rename return false, which must abort the run, roll
    // the b=0 trash rename back, and delete nothing.
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, ".trash-b=1"), Array[Byte](1))
    val ex = intercept[java.io.IOException](sink.compact(spark))
    assert(ex.getMessage.contains("rolled back"))
    assert(visible() === Set("b=0", "b=1", "b=2", "b=3"),
      "failed compaction must leave the table all-old")
    assert(snap() === before)
    // clear the blocker: the same compaction then succeeds end-to-end
    java.nio.file.Files.delete(java.nio.file.Paths.get(root, ".trash-b=1"))
    assert(sink.compact(spark) === 2)
    assert(visible() === Set("b=2", "b=3"))
    assert(snap() === before)
  }

  test("session windows on a stream merge events within the gap") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = ops.StreamingOps.sessions(ms.toDF())
      .writeStream.outputMode("complete").format("memory")
      .queryName("sess_out").start()
    try {
      ms.addData(
        Ev(t("2024-01-01 00:00:00"), "click", 1.0, 7L),
        Ev(t("2024-01-01 00:20:00"), "click", 1.0, 7L), // same session (gap 20m)
        Ev(t("2024-01-01 01:30:00"), "click", 1.0, 7L)) // new session
      q.processAllAvailable()
      val rows = spark.table("sess_out").orderBy("session_start_us").collect()
      assert(rows.length === 2)
      assert(rows(0).getAs[Long]("n_events") === 2L)
      assert(rows(1).getAs[Long]("n_events") === 1L)
    } finally q.stop()
  }

  test("streaming parquet sink with checkpoint writes append-only files") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft-stream-sink")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt")
    val ms = MemoryStream[Ev]
    val q = ms.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(unix_micros($"window.start").as("ws"), $"event_type", $"n")
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir.toString)
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      ms.addData(Ev(t("2024-01-01 00:10:00"), "click", 1.0, 1L))
      q.processAllAvailable()
      ms.addData(Ev(t("2024-01-01 03:00:00"), "click", 1.0, 1L)) // closes window 0
      q.processAllAvailable()
      val rows = spark.read.parquet(outDir.toString).collect()
      assert(rows.length === 1)
      assert(rows(0).getAs[Long]("n") === 1L)
    } finally q.stop()
  }

  test("rate streaming source drives the shared window transform") {
    import spark.implicits._
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", "500").load()
      .select($"timestamp".as("ts"),
        (($"value" % 3).cast("int")).cast("string").as("event_type"),
        lit(1.0).as("value"))
    val q = ops.StreamingOps.tumbling(stream)
      .writeStream.outputMode("complete").format("memory")
      .queryName("rate_out").start()
    try {
      Thread.sleep(1500)
      q.processAllAvailable()
      assert(spark.table("rate_out").count() > 0)
    } finally q.stop()
  }

  test("streaming dedup within watermark drops replayed events") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = ms.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("user_id", "event_type", "ts"))
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    try {
      ms.addData(Ev(t("2024-01-01 00:10:00"), "click", 1.0, 1L))
      q.processAllAvailable()
      // exact replay (at-least-once delivery) inside the watermark window
      ms.addData(Ev(t("2024-01-01 00:10:00"), "click", 1.0, 1L))
      q.processAllAvailable()
      ms.addData(Ev(t("2024-01-01 00:20:00"), "click", 1.0, 1L)) // distinct ts
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() === 2)
    } finally q.stop()
  }

  test("engine first-arrival dedup equals the batch dedup transform") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // users 0 (punctual) and 3 (15min lag); feed in ARRIVAL order —
    // for the (3, click) key the LATER event time arrives first and
    // must be the survivor dropDuplicates keeps
    val data = Seq(
      DEv(0L, t("2024-01-01 00:00:00"), 0L, "click"),  // arr 00:00
      DEv(1L, t("2024-01-01 00:02:00"), 3L, "click"),  // arr 00:17
      DEv(2L, t("2024-01-01 00:01:00"), 3L, "click"),  // arr 00:16 < 00:17
      DEv(3L, t("2024-01-01 00:30:00"), 0L, "click"),  // dup key, arr 00:30
      DEv(4L, t("2024-01-01 00:20:00"), 0L, "view"))   // arr 00:20
    val arrival = data.sortBy(d =>
      (d.ts.getTime + (d.user_id % 7) * 300000L, d.event_id))
    val ms = MemoryStream[DEv]
    val q = ms.toDF()
      .dropDuplicates(Seq("user_id", "event_type"))
      .writeStream.outputMode("append").format("memory")
      .queryName("fa_dedup_out").start()
    try {
      arrival.foreach { ev => ms.addData(ev); q.processAllAvailable() }
      val engine = spark.table("fa_dedup_out")
        .select("event_id").collect().map(_.getLong(0)).sorted
      val predicted = ops.StreamingOps.dedupFirstArrival(data.toDF())
        .select("event_id").collect().map(_.getLong(0)).sorted
      assert(predicted === Array(0L, 2L, 4L))
      assert(engine === predicted)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap and timeout") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.Stateful.{SessionEvent, sessionize}
    val ms = MemoryStream[SessionEvent]
    val withWm = ms.toDS()
      .withWatermark("ts", "0 seconds")
      .as[SessionEvent]
    val q = sessionize(withWm, gapSec = 600L)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_out").start()
    try {
      // two events 5 min apart (one session), then an in-batch gap > 10 min
      // closes it and opens a second session within the same trigger
      ms.addData(
        SessionEvent(1L, t("2024-01-01 00:00:00"), "click"),
        SessionEvent(1L, t("2024-01-01 00:05:00"), "view"),
        SessionEvent(1L, t("2024-01-01 00:30:00"), "click"))
      q.processAllAvailable()
      val afterBatch = spark.table("sess_out").as[graft.streaming.Stateful.ClosedSession].collect()
      assert(afterBatch.length === 1)
      assert(afterBatch(0).n_events === 2L)
      assert(afterBatch(0).end_us - afterBatch(0).start_us === 300L * 1000000L)
      // advancing the watermark past lastSeen+gap times the open session out
      ms.addData(SessionEvent(2L, t("2024-01-01 02:00:00"), "click"))
      q.processAllAvailable()
      val afterTimeout = spark.table("sess_out").as[graft.streaming.Stateful.ClosedSession].collect()
      assert(afterTimeout.length === 2)
      val timedOut = afterTimeout.filter(_.start_us != afterBatch(0).start_us)
      assert(timedOut.length === 1)
      assert(timedOut(0).n_events === 1L)
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running totals across triggers") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[graft.streaming.Stateful.UserEvent]
    val q = graft.streaming.Stateful.runningTotals(ms.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("state_out").start()
    try {
      ms.addData(graft.streaming.Stateful.UserEvent(1L, "click", 2.0))
      q.processAllAvailable()
      ms.addData(graft.streaming.Stateful.UserEvent(1L, "view", 3.0))
      q.processAllAvailable()
      val latest = spark.table("state_out")
        .groupBy($"user_id").agg(max($"n_events").as("n"), max($"total_value").as("v"))
        .collect()
      assert(latest.length === 1)
      assert(latest(0).getAs[Long]("n") === 2L)
      assert(latest(0).getAs[Double]("v") === 5.0)
    } finally q.stop()
  }

  test("stream-static enrichment join matches the batch transform") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"), (3L, "AUTOMOBILE"))
      .toDF("c_custkey", "c_mktsegment")
    val data = Seq(
      Ev(t("2024-01-01 00:10:00"), "click", 1.5, 1L),
      Ev(t("2024-01-01 00:20:00"), "view", 2.5, 2L),
      Ev(t("2024-01-01 01:10:00"), "click", 3.5, 1L),
      Ev(t("2024-01-01 01:30:00"), "purchase", 4.5, 3L))
    val ms = MemoryStream[Ev]
    ms.addData(data: _*)
    val q = ops.StreamingOps.staticEnrich(ms.toDF(), dim)
      .writeStream.outputMode("complete").format("memory")
      .queryName("static_enrich_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("static_enrich_out")
        .orderBy("win_start_us", "segment").collect().toSeq
      val batch = ops.StreamingOps.staticEnrich(data.toDF(), dim)
        .orderBy("win_start_us", "segment").collect().toSeq
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("online near-dup admission is micro-batch-boundary invariant") {
    import org.apache.spark.sql.functions._
    // replay the corpus in 3 arrival-ordered ingest batches against a
    // running band-state table (bandsig -> first arrival), the way a
    // foreachBatch ingest sink maintains it; the admitted set must be
    // EXACTLY the one-shot batch answer regardless of where the batch
    // boundaries fall — the property that makes q_stream_neardup's
    // batch oracle valid for the streaming deployment
    val dir = SparkTestSession.sf
    val bands = ops.Dedup.docBands(spark, dir).localCheckpoint(true)
    val ids = bands.select("doc_id").distinct()
      .orderBy("doc_id").collect().map(_.getLong(0))
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3), Long.MaxValue)
    var lo = Long.MinValue
    var state = spark.emptyDataFrame
    val admitted = scala.collection.mutable.ArrayBuffer[Long]()
    cuts.foreach { hi =>
      val cb = bands.filter(col("doc_id") >= lo && col("doc_id") < hi)
      val chunkFirst = cb.groupBy(col("b"), col("bandsig"))
        .agg(min(col("doc_id")).as("first_id"))
      val merged =
        if (state.isEmpty) chunkFirst
        else chunkFirst.unionByName(state)
          .groupBy(col("b"), col("bandsig")).agg(min(col("first_id")).as("first_id"))
      admitted ++= cb.join(merged, Seq("b", "bandsig"))
        .groupBy(col("doc_id"))
        .agg(max((col("first_id") < col("doc_id")).cast("int")).as("collided"))
        .filter(col("collided") === 0)
        .select("doc_id").collect().map(_.getLong(0))
      state = merged.localCheckpoint(true)
      lo = hi
    }
    // unshingleable docs (no band rows) are admitted by contract on
    // both paths: the replay's band stream never sees them, the batch
    // operator unions them back in
    val unshingleable = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
      .join(bands.select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti")
      .collect().map(_.getLong(0))
    admitted ++= unshingleable
    val oneShot = ops.StreamingOps.qStreamNeardup(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(admitted.sorted.toSeq === oneShot.sorted)
    assert(oneShot.nonEmpty && oneShot.length < ids.length + unshingleable.length,
      "admission must drop at least one near-dup on the dedup corpus")
  }

  test("TTL'd band-state admission: batch-equal while live, re-admits after expiry") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.Stateful.{BandDecision, BandObs, bandAdmitDecisions}
    val dir = SparkTestSession.sf
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // TWS refuses the default HDFS-backed provider — RocksDB is the contract
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val bandObs = ops.Dedup.docBands(spark, dir)
        .select(concat_ws("|", col("b"), col("bandsig")).as("sig"), col("doc_id"))
        .as[BandObs].collect().sortBy(_.doc_id)
      val cut = bandObs(bandObs.length / 2).doc_id

      // transformWithState in ProcessingTime mode reports
      // shouldRunAnotherBatch=true on EVERY batch (timers/TTL may need
      // to fire), so MicroBatchExecution never takes the no-new-data
      // branch and processAllAvailable() never unblocks — await the
      // sink row count instead (one decision row per input row), and
      // give the trigger a real interval so the idle churn isn't a
      // 0ms busy loop of empty state-store commits.
      def awaitRows(table: String, n: Long, q: StreamingQuery): Unit = {
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (spark.table(table).count() < n) {
          q.exception.foreach(throw _)
          assert(System.nanoTime() < deadline,
            s"timed out waiting for $n rows in $table")
          Thread.sleep(100)
        }
      }
      val trig = Trigger.ProcessingTime("100 milliseconds")

      // (a) LIVE state (1h TTL >> test duration): a 2-batch replay's
      // admission decisions must equal the batch operator's answer —
      // the TTL variant is the deployment twin of q_stream_neardup
      val ms = MemoryStream[BandObs]
      val q = bandAdmitDecisions(ms.toDS(), java.time.Duration.ofHours(1))
        .writeStream.outputMode("update").format("memory")
        .trigger(trig)
        .queryName("band_ttl_out").start()
      try {
        ms.addData(bandObs.filter(_.doc_id < cut).toIndexedSeq: _*)
        awaitRows("band_ttl_out", bandObs.count(_.doc_id < cut).toLong, q)
        ms.addData(bandObs.filter(_.doc_id >= cut).toIndexedSeq: _*)
        awaitRows("band_ttl_out", bandObs.length.toLong, q)
        val admitted = spark.table("band_ttl_out").as[BandDecision]
          .collect().groupBy(_.doc_id)
          .filter { case (_, ds) => ds.forall(!_.collided) }
          .keys.toSeq
        val unshingleable = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"))
          .join(ops.Dedup.docBands(spark, dir).select(col("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
          .collect().map(_.getLong(0))
        val oneShot = ops.StreamingOps.qStreamNeardup(spark, dir)
          .collect().map(_.getLong(0)).toSeq
        assert((admitted ++ unshingleable).sorted === oneShot.sorted,
          "TTL'd admission with live state diverged from the batch oracle")
      } finally q.stop()

      // (b) EXPIRY: with a 1s TTL and a 5s pause, re-sending the same
      // signatures under shifted doc_ids must be ADMITTED again — the
      // state entries are genuinely evicted (a live-state run would
      // reject every one of them as a collision), so the store is
      // bounded by the ttl window, not stream history
      val ms2 = MemoryStream[BandObs]
      val q2 = bandAdmitDecisions(ms2.toDS(), java.time.Duration.ofSeconds(1))
        .writeStream.outputMode("update").format("memory")
        .trigger(trig)
        .queryName("band_ttl_exp_out").start()
      try {
        val firstWave = bandObs.take(40).toIndexedSeq
        ms2.addData(firstWave: _*)
        awaitRows("band_ttl_exp_out", firstWave.length.toLong, q2)
        // MEASURE the state bound, not just the behavior (round-12
        // verdict task 6): the store's own numRowsTotal must (a) hold
        // one wave's signatures while live, then (b) DROP below that
        // after the TTL horizon — idle 100ms triggers keep running
        // batches, so TTL eviction proceeds without new data. The
        // re-admission assertion below proves semantics; this proves
        // the state SIZE is arrival-rate x ttl, not stream history.
        def stateRows(): Long =
          Option(q2.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
            .map(_.numRowsTotal).sum
        def awaitState(pred: Long => Boolean, what: String): Long = {
          val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
          var n = stateRows()
          while (!pred(n)) {
            q2.exception.foreach(throw _)
            assert(System.nanoTime() < deadline,
              s"timed out waiting for state rows $what (last: $n)")
            Thread.sleep(200)
            n = stateRows()
          }
          n
        }
        val nSigs = firstWave.map(_.sig).distinct.length.toLong
        val live = awaitState(_ >= nSigs, s">= $nSigs (one wave live)")
        Thread.sleep(5000)
        val afterTtl = awaitState(_ < nSigs, s"< $nSigs (post-TTL eviction)")
        info(s"state rows: $live live -> $afterTtl after the 1s TTL horizon " +
          s"($nSigs distinct signatures in the wave)")
        assert(afterTtl < live,
          s"state never shrank past the TTL horizon: $live -> $afterTtl")
        val secondWave = firstWave.map(b => b.copy(doc_id = b.doc_id + 100000L))
        ms2.addData(secondWave: _*)
        awaitRows("band_ttl_exp_out", 2L * firstWave.length, q2)
        val d = spark.table("band_ttl_exp_out").as[BandDecision].collect()
        val secondDecisions = d.filter(_.doc_id >= 100000L)
        assert(secondDecisions.nonEmpty)
        assert(secondDecisions.forall(!_.collided),
          "expired band signatures still collided — TTL state was not evicted")
      } finally q2.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming ANN maintenance: per-batch affected-set union equals the batch q_knn_graph_delta rule under interleaved delivery") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.Stateful.{AnnAffected, AnnEvent, annAffectedSets}
    val dir = SparkTestSession.sf
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState refuses the default HDFS-backed provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the SAME hashed corpus the batch delta query runs on: bits
      // pinned from the stored base index, is_new = the delta batch
      val h = ops.Similarity.knnDeltaHashed(spark, dir)
        .select("vec_id", "bits", "bucket", "is_new")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getBoolean(3)))
      def probes(bucket: String, bits: Int): Seq[String] =
        bucket +: (1 to bits).map { k =>
          val flipped = if (bucket(k - 1) == '1') '0' else '1'
          bucket.substring(0, k - 1) + flipped + bucket.substring(k)
        }
      // bootstrap batch: the base index's inverted probe registry
      val baseSubs = h.filter(!_._4).flatMap { case (id, bits, bucket, _) =>
        probes(bucket, bits).map(pb => AnnEvent(pb, id, "sub"))
      }.toIndexedSeq
      // delta vectors arrive one per micro-batch, HIGHEST id first
      // (interleaved delivery: arrival order != id order), each with
      // its own probe subscriptions riding along
      val delta = h.filter(_._4).sortBy(-_._1)
      def deltaBatch(v: (Long, Int, String, Boolean)): IndexedSeq[AnnEvent] =
        (AnnEvent(v._3, v._1, "ins") +:
          probes(v._3, v._2).map(pb => AnnEvent(pb, v._1, "sub"))).toIndexedSeq

      val ms = MemoryStream[AnnEvent]
      val q = annAffectedSets(ms.toDS())
        .writeStream.outputMode("update").format("memory")
        .queryName("ann_out").start()
      try {
        def emitted(): Set[Long] =
          spark.table("ann_out").as[AnnAffected]
            .collect().map(_.src_id).toSet
        ms.addData(baseSubs: _*)
        q.processAllAvailable()
        assert(emitted() === Set.empty[Long],
          "registrations alone must trigger no re-ranks")
        // batch 1: first delta vector — emission must be EXACTLY that
        // vector's affected set (itself + base sources probing its
        // bucket), proving per-batch work scales with the batch's
        // delta, not the corpus
        val v1 = delta.head
        val expect1 = Set(v1._1) ++ h.filter(r => !r._4 &&
          probes(r._3, r._2).contains(v1._3)).map(_._1)
        ms.addData(deltaBatch(v1): _*)
        q.processAllAvailable()
        assert(emitted() === expect1,
          "first micro-batch must emit exactly the first vector's bucket-visibility set")
        // remaining delta vectors, one batch each
        delta.tail.foreach { v => ms.addData(deltaBatch(v): _*) }
        q.processAllAvailable()
        // the union over all micro-batches == the batch delta query's
        // affected set: delta vectors plus bucket-visible base sources
        val hdf = ops.Similarity.knnDeltaHashed(spark, dir)
        val batchAffected =
          hdf.filter(col("is_new")).select(col("vec_id"))
            .unionByName(ops.Similarity.knnDeltaAffectedBase(hdf))
            .collect().map(_.getLong(0)).toSet
        assert(emitted() === batchAffected,
          "streamed affected-set union diverged from the batch bucket-visibility rule")
        assert(batchAffected.size < h.length,
          "differential is vacuous if every source is affected")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

