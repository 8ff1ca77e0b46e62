package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions.max
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** RocksDB state store (SURVEY.md §2 Tier B streaming): the stateful
  * operators run on `RocksDBStateStoreProvider` — the backend a 100 TB
  * stream actually deploys, because the default HDFS-backed provider
  * keeps every key of every state operator ON HEAP (a |users|-sized
  * JVM map per partition), while RocksDB spills state to local SSD and
  * checkpoints changelogs, so state capacity is disk-bounded.
  *
  * The spec proves the two properties that matter operationally:
  *  1. the provider is genuinely RocksDB (the query's state-operator
  *     metrics expose rocksdb* counters — not just a conf that was
  *     silently ignored), and
  *  2. checkpoint-restart continuity: a session held OPEN in RocksDB
  *     state by query #1 is closed by query #2 after a full stop +
  *     restart from the same checkpoint, with the exact (start, end,
  *     count) the pre-restart events established. That is the
  *     recovery path of a real deployment (executor loss, code
  *     redeploy): offsets come from the checkpoint's offset log, state
  *     from the RocksDB snapshot + changelog.
  */
class RocksDbStateSpec extends AnyFunSuite {
  import SparkTestSession._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("sessionization state survives a stop/restart on the RocksDB state store") {
    import spark.implicits._
    import graft.streaming.Stateful.{ClosedSession, SessionEvent, sessionize}

    val src = Files.createTempDirectory("graft-rocksdb-src")
    val ckpt = Files.createTempDirectory("graft-rocksdb-ckpt")
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def stream() = sessionize(
        spark.readStream
          .schema("user_id LONG, ts TIMESTAMP, event_type STRING")
          .parquet(src.toString)
          .withWatermark("ts", "0 seconds")
          .as[SessionEvent],
        gapSec = 600L)

      // The streaming file source lists flat files (non-key=value
      // subdirectories are invisible to it), so land each batch's
      // part-file directly in `src` via a staging dir.
      def land(name: String, evs: Seq[SessionEvent]): Unit = {
        val stage = Files.createTempDirectory("graft-rocksdb-stage")
        evs.toDS().coalesce(1).write.mode("overwrite").parquet(stage.toString)
        import scala.jdk.CollectionConverters._
        val part = Files.list(stage).iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
        Files.move(part, src.resolve(name))
      }

      // Batch 1: two events 5 min apart -> ONE open session, held only
      // in the state store (no output yet).
      land("f1.parquet", Seq(
        SessionEvent(1L, t("2024-01-01 00:00:00"), "click"),
        SessionEvent(1L, t("2024-01-01 00:05:00"), "view")))
      // File sink, not memory: the memory sink refuses checkpoint
      // recovery, and the parquet sink is what a deployment restarts
      // anyway (its _spark_metadata log is the exactly-once guard).
      val out = Files.createTempDirectory("graft-rocksdb-out")
      def run(): org.apache.spark.sql.streaming.StreamingQuery =
        stream().writeStream.outputMode("append")
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .format("parquet").option("path", out.toString).start()
      def sink(): Array[ClosedSession] = spark.read
        .schema("user_id LONG, start_us LONG, end_us LONG, n_events LONG")
        .parquet(out.toString).as[ClosedSession].collect()

      val q1 = run()
      q1.awaitTermination()
      val rocksMetrics = q1.lastProgress.stateOperators.flatMap(
        _.customMetrics.keySet().toArray(Array.empty[String]))
      assert(rocksMetrics.exists(_.startsWith("rocksdb")),
        s"state operator is not running on RocksDB: ${rocksMetrics.mkString(",")}")
      assert(sink().isEmpty)

      // Restart from the same checkpoint: a >gap event closes the
      // recovered session with the PRE-restart start/end/count.
      land("f2.parquet", Seq(SessionEvent(1L, t("2024-01-01 00:30:00"), "click")))
      val q2 = run()
      q2.awaitTermination()
      val closed = sink()
      assert(closed.length === 1)
      assert(closed(0) === ClosedSession(1L,
        t("2024-01-01 00:00:00").getTime * 1000L,
        t("2024-01-01 00:05:00").getTime * 1000L, 2L))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState totals match the mapGroupsWithState operator") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Stateful.{UserEvent, runningTotalsTws}
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // TWS refuses the default HDFS-backed provider — RocksDB is the contract
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[UserEvent]
      val q = runningTotalsTws(ms.toDS())
        .writeStream.outputMode("update").format("memory")
        .queryName("tws_out").start()
      try {
        ms.addData(UserEvent(1L, "click", 2.0), UserEvent(2L, "view", 1.0))
        q.processAllAvailable()
        ms.addData(UserEvent(1L, "view", 3.0))
        q.processAllAvailable()
        val latest = spark.table("tws_out")
          .groupBy($"user_id")
          .agg(max($"n_events").as("n"), max($"total_value").as("v"))
          .collect().map(r => r.getLong(0) -> (r.getAs[Long]("n"), r.getAs[Double]("v")))
          .toMap
        // same per-key rolling state the mapGroupsWithState spec pins:
        // user 1 accumulates across triggers, user 2 stays at one event
        assert(latest === Map(1L -> ((2L, 5.0)), 2L -> ((1L, 1.0))))
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
