package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage beyond parquet: CSV and JSON roundtrips
  * through DataFrameReader/Writer with explicit schemas (headerful CSV,
  * line-delimited JSON) — the staging formats an export consumer meets
  * in practice. */
class FormatsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("csv roundtrip preserves rows and values") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/out"
    docs.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(docs.schema).csv(dir)
    assert(back.count() === docs.count())
    assert(back.agg(sum("n_chars")).collect()(0).getLong(0) ===
      docs.agg(sum("n_chars")).collect()(0).getLong(0))
  }

  test("json roundtrip preserves rows and values") {
    val dir = Files.createTempDirectory("graft-json").toString + "/out"
    docs.write.json(dir)
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.count() === docs.count())
    assert(back.exceptAll(docs).count() === 0)
    assert(docs.exceptAll(back).count() === 0)
  }

  test("orc roundtrip preserves rows and values") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/out"
    docs.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.exceptAll(docs).count() === 0)
    assert(docs.exceptAll(back).count() === 0)
  }

  test("schema-evolution merge read keeps every row and nulls the pre-evolution column") {
    val r = ops.ExportOps.qSchemaMerge(spark, sf).collect().head
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    assert(r.getAs[Long]("n_rows") === nation.count())
    import org.apache.spark.sql.functions._
    val odd = nation.filter(col("n_nationkey") % 2 === 1).count()
    assert(r.getAs[Long]("with_region") === odd)
  }
}
