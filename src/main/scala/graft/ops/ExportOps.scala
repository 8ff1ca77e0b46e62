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

  /** Single-pass column profile — the post-export data-quality audit:
    * row count, null count, exact NDV, min/max/avg per profiled column,
    * all computed in ONE scan of the table (Catalyst expands the
    * multi-distinct into one Expand + two-level aggregate), then
    * unpivoted to a row per column. At 100 TB the single-scan shape is
    * the whole point: profiling N columns costs one pass, not N. */
  def qColumnProfile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val aggs = cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__ndv"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        round(avg(col(c)), 4).as(s"${c}__avg"))
    }
    val one = T.lineitem(spark, dir)
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = cols.map { c =>
      s"'$c', ${c}__nulls, ${c}__ndv, ${c}__min, ${c}__max, ${c}__avg"
    }.mkString(", ")
    one.select($"n_rows", expr(
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, ndv, min_v, max_v, avg_v)"))
      .select($"col_name", $"n_rows", $"n_nulls", $"ndv", $"min_v", $"max_v", $"avg_v")
      .orderBy($"col_name")
  }

  val qColumnProfileSql: String =
    Seq("l_quantity", "l_extendedprice", "l_discount").map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls, count(DISTINCT $c) AS ndv,
         |  min($c)::DOUBLE AS min_v, max($c)::DOUBLE AS max_v,
         |  round(avg($c), 4) AS avg_v FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_export_roundtrip", qExportRoundtrip, Some(qExportRoundtripSql)),
    QueryDef("q_column_profile", qColumnProfile, Some(qColumnProfileSql)),
  )
}
