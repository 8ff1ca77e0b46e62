package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator name -> (spark, sfDir) => DataFrame; each key
  * with a DuckDB-expressible equivalent also appears in `oracleSql`.
  * Column names are aliased identically on both sides (the driver's
  * compare sorts columns by name before hashing values).
  *
  * Operator families register through [[graft.ops.QueryFamily]]; add a
  * family to `families` and its queries land in both maps.
  */
object SparkEntry {

  private val families: Seq[QueryFamily] = Seq(
    Relational, Tpch, Text, Dedup, Similarity, Multimodal, StreamingOps,
    ExportOps, Curation, Safety, Graph, Analytics, Mining, Timeseries,
    Linkage, Stats
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.flatMap(_.defs).map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    families.flatMap(_.defs).flatMap(d => d.oracle.map(d.name -> _)).toMap
}
