package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Optimization-round measurement harness (guide §1: measure first).
  *
  * For each named query, reports one line with the pieces a wall-clock
  * bench number hides:
  *   - construct_ms: query-function call (plan building; includes any
  *     sidecar writes / .head() scalar fetches the builder performs)
  *   - exec_ms:      min-of-N of the SAME timed action Bench.once uses
  *     (xxhash64-struct + bit_xor agg, full materialization)
  *   - jobs/stages/tasks: scheduler work per execution (overhead-bound
  *     queries show 10s of stages on 17 MB of input)
  *   - task_time_ms: summed executor task time of one execution — the
  *     gap between exec_ms x cores and this is scheduling/planning.
  *   - shuffle_mb:   total shuffle-write bytes of one execution
  *
  * Usage: runMain graft.Profile [sfDir] q_a q_b ...
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_PROFILE_RUNS (default 3).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    @volatile var shuffleWriteB = 0L
    @volatile var spillB = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        taskTimeMs += s.stageInfo.taskMetrics.executorRunTime
        shuffleWriteB += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        spillB += s.stageInfo.taskMetrics.diskBytesSpilled
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // session warm-up, mirroring Bench
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().collect()

    def timed[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e6, r)
    }
    println(f"${"query"}%-28s ${"construct"}%9s ${"exec_min"}%9s ${"runs"}%-28s jobs stages tasks task_time shuf_mb spill_mb")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => println(s"$n: unknown query")
        case Some(fn) =>
          try {
            val (tc, df) = timed(fn(spark, sfDir))
            def exec(): Double = timed {
              df.select(xxhash64(struct(df.columns.map(col): _*)).as("__h"))
                .agg(expr("bit_xor(__h)"), count(lit(1))).collect()
            }._1
            val warm = exec() // run 1: includes codegen/planning cold cost
            jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0; shuffleWriteB = 0; spillB = 0
            val ts = (1 to runs).map(_ => exec())
            Thread.sleep(200) // let listener events drain
            val allRuns = (warm +: ts).map(t => f"$t%.0f").mkString(",")
            val runsCol = s"[$allRuns]"
            println(f"$n%-28s ${tc}%9.0f ${ts.min}%9.0f $runsCol%-28s ${jobs / runs}%4d ${stages / runs}%6d ${tasks / runs}%5d ${taskTimeMs / runs}%9d ${shuffleWriteB / runs / 1e6}%7.1f ${spillB / runs / 1e6}%8.1f")
          } catch {
            case e: Throwable =>
              println(s"$n FAILED: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
          } finally spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
