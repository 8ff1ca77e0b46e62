package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** File-based streaming source (SURVEY §2 Tier B "rate/file streaming
  * source for events"): the same parquet fixture consumed incrementally
  * through readStream, with the shared window transforms. */
class FileStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  test("parquet file stream produces the same tumbling aggregate as batch") {
    val dir = Files.createTempDirectory("graft-stream-src")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(dir.toString).schema
    val raw = spark.readStream
      .schema(schema)
      .parquet(dir.toString)
    // Same physical-shape adaptation as T.eventsTs: Long nanos -> micros,
    // NTZ micros -> session-TZ timestamp (session TZ is UTC).
    val stream = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }

    val q = ops.StreamingOps.tumbling(stream)
      .writeStream.outputMode("complete").format("memory")
      .queryName("fs_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("fs_out")
        .orderBy("win_start_us", "event_type").collect().toSeq
      val batch = ops.StreamingOps.tumbling(ops.T.events(spark, sf))
        .orderBy("win_start_us", "event_type").collect().toSeq
      assert(streamed.nonEmpty && streamed === batch)
    } finally q.stop()
  }
}
