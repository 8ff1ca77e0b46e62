package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR
  * and prints one JSON line {"metric":...,"queries":{...}}.
  *
  * Each query is forced through a full materialization of ALL output
  * columns (xxhash64 over the row struct, consumed by an aggregate) —
  * a bare count() would let Catalyst prune expensive projections (e.g.
  * signature computations) and under-report their cost.
  *
  * Timing is min-of-N (SPARK_GRAFT_BENCH_RUNS, default 3): single-run
  * wall times on a shared machine have shown 10-36x run-to-run noise,
  * and the minimum is the standard low-noise estimator of the true
  * cost. The per-run times and the host's 1-minute load average are
  * recorded alongside the minima so a contended run is
  * self-diagnosing (the round-6 driver artifact showed multi-job
  * queries 5-10x inflated with nothing in the JSON to prove it): a
  * wide min-to-max spread or a high loadavg marks the numbers
  * machine-noise, not code drift. A query that throws is reported in
  * "errors" with its message — never as a plausible-looking wall
  * time.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    def loadavg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    val loadStart = loadavg
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the session (codegen compiler, parquet footer reader, shuffle
    // machinery) so the first measured query isn't charged JVM start-up
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().collect()

    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      // bit_xor consumes every hash without ANSI-mode overflow (a long
      // sum of xxhash64 values overflows and kills the job mid-agg)
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("__h"))
        .agg(expr("bit_xor(__h)"), count(lit(1))).collect()
      (System.nanoTime() - t0) / 1e9
    }

    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val perRun = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Local-iteration subset, mirroring Verify: SPARK_GRAFT_ONLY=q_a,q_b
    // times just those queries. Unset for driver runs.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.forall(_.contains(kv._1)))
      .foreach { case (name, fn) =>
      try {
        val ts = (1 to math.max(1, runs)).map(_ => once(fn))
        timings(name) = ts.min
        perRun(name) = ts
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          errors(name) = msg.replaceAll("[\"\\\\\n\r\t]", " ").take(200)
      }
      // drop this query's construction-time caches before the next one:
      // per-query reuse caches are dead weight across a ~200-query
      // session and would accumulate executor storage. Between-runs
      // warmth of the SAME query is preserved (clear happens after its
      // min-of-N completes).
      finally spark.catalog.clearCache()
    }
    def jmap(m: collection.Map[String, String]): String =
      m.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")
    val qs = timings.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // per-run spreads at 4 dp (sub-0.1ms precision is noise anyway)
    // keep the artifact diffable without doubling its size
    val spreads = perRun.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(t => f"$t%.4f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = timings.values.sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""runs_detail":$spreads,"loadavg_start":$loadStart,"loadavg_end":$loadavg,""" +
      s""""errors":${jmap(errors)},"n_errors":${errors.size},"runs":$runs,"sf":"$sfDir"}"""
    println(json)
    // the driver's stdout capture truncates long lines; persist the full
    // per-query map so every round's numbers are diffable from the file.
    // SPARK_GRAFT_ONLY subset runs must NOT clobber the full artifact.
    if (only.isEmpty) {
      val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
      java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
        (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
