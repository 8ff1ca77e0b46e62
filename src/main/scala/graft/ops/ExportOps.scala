package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Export-pipeline roundtrip registered as a t2 query: runs the Tier-A
  * Exporter (catalog discovery -> projection -> scan -> rolling sink)
  * on the fixture schema into a temp directory, reads the exported
  * parquet back and aggregates it. The oracle aggregates the ORIGINAL
  * table — equality proves the export is lossless end-to-end. */
object ExportOps extends QueryFamily {

  def qExportRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions._
    import graft.engine._
    val src = Paths.get(dir)
    val out = Files.createTempDirectory("graft-export-rt")
    val cfg = ExportConfig(
      outputDirectory = out.toString, overwrite = true,
      schemas = Seq(src.getFileName.toString),
      tableNameIncludePattern = "^(lineitem|region)$",
      compressionMethod = "snappy")
    val catalog = new ParquetCatalog(src.getParent)
    new Exporter(cfg, catalog, new ParquetSource(catalog), new ParquetSink(cfg))
      .exportTables(spark)
    spark.read.parquet(s"$out/${src.getFileName}/lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  val qExportRoundtripSql: String =
    """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_export_roundtrip", qExportRoundtrip, Some(qExportRoundtripSql)),
  )
}
