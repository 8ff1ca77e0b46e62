package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine operator: name, the Spark implementation, and
  * (when SQL-expressible) the equivalent DuckDB SQL the driver's t2
  * harness runs as the correctness oracle. `oracle = None` downgrades
  * the driver check to rows-only (reserved for approx/ANN operators
  * whose result is correct-by-construction but not SQL-reproducible).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryFamily {
  def defs: Seq[QueryDef]
}
