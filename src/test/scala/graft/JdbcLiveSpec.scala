package graft

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{ColumnMeta, ExportConfig, JdbcSource}

/** Live JDBC scan path against embedded Derby (ships with Spark): the
  * same generated SELECT + Spark JDBC reader used for Oracle, minus the
  * Oracle-only flashback clause. Proves the dbtable-subquery plumbing,
  * quoted identifiers, fetchsize and projection pushdown against a real
  * database, offline. */
class JdbcLiveSpec extends AnyFunSuite {
  import SparkTestSession._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("jdbc source reads back rows written over jdbc") {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("""CREATE TABLE "HR"."EMPLOYEES" ("ID" INT, "Name" VARCHAR(32))""")
      (1 to 25).foreach { i =>
        st.execute(s"""INSERT INTO "HR"."EMPLOYEES" VALUES ($i, 'emp_$i')""")
      }
    } finally conn.close()

    val cfg = ExportConfig(batchSize = 10)
    val src = new JdbcSource(cfg, scn = None, urlOverride = Some(url))
    val df = src.read(spark, "HR", "EMPLOYEES",
      Seq(ColumnMeta("ID", "INTEGER", 1), ColumnMeta("Name", "VARCHAR", 2)),
      lowercase = true, rowLimit = -1L)
    assert(df.columns.toSeq === Seq("id", "name"))
    assert(df.count() === 25)
    assert(df.filter("id <= 5").count() === 5)
  }

  test("full live export: jdbc catalog discovery -> scan -> parquet sink") {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("""CREATE TABLE "APP2"."ORDERS_LIVE" ("OID" INT, "AMT" DOUBLE)""")
      st.execute("""CREATE TABLE "APP2"."SKIP_ME" ("X" INT)""")
      (1 to 40).foreach { i =>
        st.execute(s"""INSERT INTO "APP2"."ORDERS_LIVE" VALUES ($i, ${i * 1.5})""")
      }
      st.execute("""INSERT INTO "APP2"."SKIP_ME" VALUES (1)""")
    } finally conn.close()

    val out = java.nio.file.Files.createTempDirectory("graft-jdbc-export").toString
    val cfg = ExportConfig(outputDirectory = out, overwrite = true,
      schemas = Seq("APP2"), tableNameExcludePattern = Some("^SKIP"),
      lowercaseObjectNames = true)
    val catalog = new graft.engine.JdbcMetaCatalog(url)
    val report = new graft.engine.Exporter(cfg, catalog,
      new JdbcSource(cfg, scn = None, urlOverride = Some(url)),
      new graft.engine.ParquetSink(cfg)).exportTables(spark)
    assert(report.tables.map(_.table) === Seq("ORDERS_LIVE"))
    assert(report.totalRows === 40)
    val back = spark.read.parquet(s"$out/app2/orders_live")
    assert(back.columns.sorted.toSeq === Seq("amt", "oid"))
    assert(back.agg(org.apache.spark.sql.functions.sum("oid"))
      .collect()(0).get(0).toString.toDouble === 820.0)
  }
}
