package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Projection construction (reference A7/A16): explicit column list —
  * never SELECT * — with optional global lowercase renaming of
  * identifiers (main.py:110-127). Spark's JDBC/parquet readers prune
  * columns from this select list, so the projection reaches the scan.
  */
object Projection {

  /** Case-exact quoted identifier (main.py:121: `"{col}"`). */
  def quote(name: String): String = "\"" + name + "\""

  /** The `"COL" [AS "col"]` projection fragment the reference builds
    * (main.py:110-127). Empty column list means "skip this table"
    * (main.py:140-142) — callers must check. */
  def columnSql(cols: Seq[String], lowercase: Boolean): String =
    cols.map { c =>
      if (lowercase && c != c.toLowerCase) s"${quote(c)} AS ${quote(c.toLowerCase)}"
      else quote(c)
    }.mkString(", ")

  /** Identifier mapping applied to schema/table names in output paths
    * (main.py:166,245-253). */
  def objectName(name: String, lowercase: Boolean): String =
    if (lowercase) name.toLowerCase else name

  /** DataFrame form: select exactly `cols`, optionally lowercased. */
  def apply(df: DataFrame, cols: Seq[String], lowercase: Boolean): DataFrame = {
    val selected = cols.map { c =>
      if (lowercase) col(c).as(c.toLowerCase) else col(c)
    }
    df.select(selected: _*)
  }
}
