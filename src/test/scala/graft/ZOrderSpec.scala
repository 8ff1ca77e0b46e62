package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{ExportConfig, ParquetSink}

/** Z-order clustered write (engine/Sink.writeZOrdered + functions/
  * ZOrder): correctness (lossless roundtrip) and the property that
  * justifies its existence — per-file min/max ranges stay narrow on
  * BOTH clustering columns, unlike a round-robin layout of the same
  * file count. That per-file range is exactly what parquet footer
  * pruning consumes, so the locality ratio measured here is the scan
  * reduction a filtered read gets at any scale.
  */
class ZOrderSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("zorder_spec").toString

  /** Mean per-file extent of `c`, normalized by the global extent:
    * ~1.0 when every file spans the whole range (no locality), -> 0
    * as files become range-disjoint. */
  private def locality(dir: String, c: String): Double = {
    val df = spark.read.parquet(dir)
      .select(col(c).cast("double").as("v"), input_file_name().as("f"))
    val global = df.agg(max($"v") - min($"v")).head().getDouble(0)
    val perFile = df.groupBy($"f").agg((max($"v") - min($"v")).as("ext"))
      .agg(avg($"ext")).head().getDouble(0)
    perFile / global
  }

  test("z-ordered write is lossless and clusters both dimensions") {
    val li = ops.T.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_quantity")
    val files = 8

    val zOut = freshDir()
    val zSink = new ParquetSink(ExportConfig(outputDirectory = zOut, overwrite = true))
    zSink.prepareRoot()
    val stats = zSink.writeZOrdered(li, "s", "li_z", ("l_partkey", "l_orderkey"), files)

    // lossless: same multiset of rows back
    val back = spark.read.parquet(stats.outputDir)
    assert(back.count() === li.count())
    val ck = (df: org.apache.spark.sql.DataFrame) =>
      df.select(xxhash64(struct(df.columns.sorted.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)
    assert(ck(back) === ck(li))

    // baseline: identical file count, round-robin layout
    val rrOut = freshDir()
    li.repartition(files).write.mode("overwrite").parquet(rrOut)

    val zPart = locality(stats.outputDir, "l_partkey")
    val zOrd = locality(stats.outputDir, "l_orderkey")
    val rrPart = locality(rrOut, "l_partkey")
    val rrOrd = locality(rrOut, "l_orderkey")
    // round-robin files each span ~the full range of both columns
    assert(rrPart > 0.9 && rrOrd > 0.9)
    // z-order narrows BOTH dimensions at once
    assert(zPart < 0.75 * rrPart, s"partkey locality $zPart vs $rrPart")
    assert(zOrd < 0.75 * rrOrd, s"orderkey locality $zOrd vs $rrOrd")
  }

  test("interleave is monotone on the diagonal and bounded") {
    val df = Seq((0L, 0L), (1L, 1L), (2L, 2L), (65535L, 65535L))
      .toDF("x", "y")
      .select(functions.ZOrder.interleave($"x", $"y", 16).as("z"))
    val zs = df.collect().map(_.getLong(0))
    assert(zs.sorted.sameElements(zs))
    assert(zs.last === (1L << 32) - 1)
  }
}
