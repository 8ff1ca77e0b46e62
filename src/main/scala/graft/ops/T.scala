package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the driver-generated Parquet fixtures
  * (`/root/repo/TESTDATA.md`). One parquet directory per scale factor;
  * table name -> `{dir}/{name}.parquet`. This mirrors the reference's
  * output layout contract (reference: src/oracle_parquet_exporter/
  * main.py:245-253 writes `{out}/{schema}/{table}/...parquet`) — a
  * directory of Parquet files IS the table.
  */
object T {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]). Read it as a raw
    * nanosecond Long (legacy conf) and floor-divide to microseconds —
    * Spark's native TimestampType precision. The DuckDB oracles mirror
    * this exactly with `make_timestamp(epoch_ns(ts)//1000)`, so both
    * engines compare identical microsecond instants.
    */
  def eventsTs(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = eventsTs(s, d)
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
