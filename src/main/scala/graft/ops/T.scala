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

  /** `events.ts` has shipped in two parquet physical types across fixture
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader rejects
    * outright with [PARQUET_TYPE_ILLEGAL], so we read it as a raw nanosecond
    * Long via the legacy conf and floor-divide to microseconds) and plain
    * timestamp[us] with isAdjustedToUTC=false (which Spark reads as
    * TIMESTAMP_NTZ). The loader adapts to whichever shape is on disk and
    * always yields session-TZ TimestampType at microsecond precision; with
    * the session timezone pinned to UTC the NTZ wall-clock IS the instant.
    * The DuckDB oracles use `make_timestamp(epoch_ns(ts)//1000)`, which
    * yields the identical microsecond instant for both physical shapes.
    *
    * The `nanosAsLong` session conf is flipped ONLY when the parquet
    * footer actually declares TIMESTAMP(NANOS) (round-8 advice: no
    * global-state mutation on every loader call — the modern
    * timestamp[us] fixture never touches session conf, so loader order
    * cannot change unrelated reads). The footer probe is memoized per
    * fixture directory. */
  def eventsTs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    if (eventsTsIsNanos(spark, dir))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType      => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => df
      case _             => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  private val tsNanosCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** True iff `{dir}/events.parquet`'s footer declares `ts` as
    * TIMESTAMP(NANOS). Reads one footer through the Hadoop FileSystem
    * API (object-store-safe), handling both a single parquet file and
    * a directory of part files. */
  private def eventsTsIsNanos(spark: SparkSession, dir: String): Boolean =
    tsNanosCache.computeIfAbsent(dir, _ => {
      import org.apache.hadoop.fs.Path
      import org.apache.parquet.schema.LogicalTypeAnnotation
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new Path(s"$dir/events.parquet")
      val fs = p.getFileSystem(conf)
      val file =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).map(_.getPath)
            .find(_.getName.endsWith(".parquet")).getOrElse(p)
        else p
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        schema.containsField("ts") &&
          (schema.getType(schema.getFieldIndex("ts")).getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
            case _ => false
          })
      } finally reader.close()
    })

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

/** Fixture-keyed sidecar parquet locations shared by the operators
  * that MATERIALIZE an artifact both engines then read (the decode
  * pixel table, the stored kNN-graph index): absolute paths under the
  * repo's `tools/fixtures` (SPARK_GRAFT_FIXTURE_DIR overrides), keyed
  * by the fixture's basename so every scale factor gets its own
  * artifact. The oracle SQL embeds these absolute paths via Verify's
  * token substitution ({THUMBS}/{GRAPH}/...), so the Spark writer and
  * the DuckDB reader must agree on the location — the root is anchored
  * to the repo that owns THIS compiled class (the first ancestor of
  * the class's code source carrying build.sbt), depending on neither
  * the invoking process's working directory nor a hardcoded checkout
  * location. */
object Fixtures {
  def root: String = sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR", {
    val codeSrc = try {
      Option(getClass.getProtectionDomain.getCodeSource)
        .map(s => new java.io.File(s.getLocation.toURI))
    } catch { case _: Exception => None }
    codeSrc
      .flatMap(f => Iterator.iterate(f)(_.getParentFile)
        .takeWhile(_ != null).take(6)
        .find(p => new java.io.File(p, "build.sbt").isFile))
      .map(r => new java.io.File(r, "tools/fixtures").getAbsolutePath)
      .getOrElse(new java.io.File("tools/fixtures").getAbsolutePath)
  })

  /** `{root}/{kind}_{fixture-basename}.parquet` */
  def sidecarPath(dir: String, kind: String): String =
    s"$root/${kind}_${new java.io.File(dir).getName}.parquet"
}
