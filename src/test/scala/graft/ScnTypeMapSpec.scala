package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine._

/** A15 (run-level SCN pinning) and the SURVEY §1.2 deterministic
  * Oracle→Catalyst type mapping — both offline: the pin decision takes
  * the fetch as a function, the mapping is pure. */
class ScnTypeMapSpec extends AnyFunSuite {

  private val oracleUrl = "jdbc:oracle:thin:@//db:1521/FREEPDB1"

  test("SERIALIZABLE against Oracle fetches one SCN and pins every per-table SQL") {
    var fetches = 0
    val scn = JdbcSource.pinScn(IsolationLevel.Serializable, oracleUrl,
      () => { fetches += 1; 777123L }, _ => ())
    assert(scn === Some(777123L))
    assert(fetches === 1, "the SCN must be fetched exactly once per run")

    val src = new JdbcSource(ExportConfig(), scn)
    val sqls = Seq("T1", "T2", "T3").map(t =>
      src.selectSql("S", t, Seq("C"), lowercase = false)) :+
      src.partitionBoundsSql("S", "T1", "C")
    sqls.foreach(s => assert(s.contains("AS OF SCN 777123"), s))
    // one run, one snapshot: the same SCN literal in every statement
    assert(sqls.flatMap("AS OF SCN (\\d+)".r.findAllMatchIn(_).map(_.group(1)))
      .distinct === Seq("777123"))
  }

  test("READ COMMITTED never pins and never fetches") {
    var fetches = 0
    val scn = JdbcSource.pinScn(IsolationLevel.ReadCommitted, oracleUrl,
      () => { fetches += 1; 1L }, _ => ())
    assert(scn === None)
    assert(fetches === 0)
    val sql = new JdbcSource(ExportConfig(), scn).selectSql(
      "S", "T", Seq("C"), lowercase = false)
    assert(!sql.contains("AS OF SCN"))
  }

  test("SERIALIZABLE against a non-Oracle URL downgrades loudly, not silently") {
    var warned = Vector.empty[String]
    val scn = JdbcSource.pinScn(IsolationLevel.Serializable,
      "jdbc:derby:memory:x", () => fail("must not fetch"), warned :+= _)
    assert(scn === None)
    assert(warned.exists(_.contains("SCN pinning unavailable")))
  }

  test("NUMBER(p,s) mapping follows the survey table") {
    def m(dt: String, p: Option[Int], s: Option[Int]) =
      OracleTypeMap.toCatalyst(ColumnMeta("C", dt, 1, p, s))
    assert(m("NUMBER", Some(5), Some(0)) === Some(IntegerType))
    assert(m("NUMBER", Some(9), Some(0)) === Some(IntegerType))
    assert(m("NUMBER", Some(10), Some(0)) === Some(LongType))
    assert(m("NUMBER", Some(18), Some(0)) === Some(LongType))
    assert(m("NUMBER", Some(19), Some(0)) === Some(DecimalType(19, 0)))
    assert(m("NUMBER", Some(12), Some(2)) === Some(DecimalType(12, 2)))
    assert(m("NUMBER", None, None) === Some(DecimalType(38, 10)))
    // negative scale: NUMBER(5,-2) stores multiples of 100
    assert(m("NUMBER", Some(5), Some(-2)) === Some(DecimalType(7, 0)))
    // scale > precision: leading-zero decimals
    assert(m("NUMBER", Some(2), Some(5)) === Some(DecimalType(5, 5)))
    assert(m("BINARY_DOUBLE", None, None) === Some(DoubleType))
    assert(m("BINARY_FLOAT", None, None) === Some(FloatType))
    assert(m("VARCHAR2", Some(64), None) === Some(StringType))
    assert(m("DATE", None, None) === Some(TimestampType))
    assert(m("TIMESTAMP(6) WITH TIME ZONE", None, None) === Some(TimestampType))
    // non-Oracle dictionary names stay driver-inferred
    assert(m("INTEGER", None, None) === None)
  }

  test("customSchema DDL is pinned for Oracle URLs only") {
    val cols = Seq(
      ColumnMeta("ORDER_ID", "NUMBER", 1, Some(10), Some(0)),
      ColumnMeta("AMT", "NUMBER", 2, Some(12), Some(2)),
      ColumnMeta("NAME", "VARCHAR2", 3, Some(64), None),
      ColumnMeta("MYSTERY", "WEIRD_TYPE", 4, None, None))
    val oracle = new JdbcSource(ExportConfig(), None,
      urlOverride = Some(oracleUrl))
    assert(oracle.customSchemaFor(cols, lowercase = true) ===
      Some("`order_id` BIGINT, `amt` DECIMAL(12,2), `name` STRING"))
    assert(oracle.customSchemaFor(cols, lowercase = false) ===
      Some("`ORDER_ID` BIGINT, `AMT` DECIMAL(12,2), `NAME` STRING"))
    val derby = new JdbcSource(ExportConfig(), None,
      urlOverride = Some("jdbc:derby:memory:x"))
    assert(derby.customSchemaFor(cols, lowercase = true) === None)
  }
}
