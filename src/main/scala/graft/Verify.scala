package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Round-12 additions (verdict task 2 + advice):
  *  - verify_meta.json records per-query row counts and a "vacuous"
  *    marker for 0-row dumps, so a 0-row/0-row hash match is
  *    distinguishable from a real match in the committed artifacts
  *    (the r11 finding: q_dedup_phash was green at sf0.01 with both
  *    engines empty). 0-row dumps outside [[declaredVacuous]] are
  *    loudly flagged ("unexpected_vacuous") — a query that silently
  *    returns nothing is a bug until declared otherwise.
  *  - A query whose Spark side THROWS is dropped from oracle_sql.json
  *    (and listed in verify_meta.json "failures"), so the driver
  *    reports the Spark-side failure instead of comparing DuckDB
  *    against a stale sidecar or a missing dump. */
object Verify {

  /** Queries that legitimately return 0 rows on specific fixtures,
    * with the reason and where the non-vacuous evidence lives.
    * EMPTY since round 13: the former entries (q_dedup_phash /
    * q_dedup_phash_dct at sf<=0.01, whose stub thumbnails genuinely
    * contained no near-dup image pairs) are now non-vacuous at every
    * fixture via the deterministic seed thumbnails
    * ([[graft.ops.Multimodal.seedThumbs]]) — the round-12 verdict
    * task-5 move, so the driver's own per-round check exercises the
    * cross-engine Hamming logic on non-empty output. */
  private val declaredVacuous: Map[String, Set[String]] = Map.empty

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val fixture = new java.io.File(sfDir).getName
    // Local-iteration subset: SPARK_GRAFT_ONLY=q_a,q_b dumps (and pairs
    // oracle SQL for) just those queries. Unset for driver runs.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def keep(name: String): Boolean = only.forall(_.contains(name))
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    val rowCounts = scala.collection.mutable.LinkedHashMap[String, Long]()
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // count the dump (not the plan): one cheap scan of the single
        // coalesced file, no re-execution of the query
        rowCounts(name) = spark.read.parquet(s"$outDir/$name").count()
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
          .replaceAll("\\s+", " ").take(200)
      }
      // construction-time .cache()s inside query functions serve that
      // query's returned plan only; dropping them between queries keeps
      // a ~200-query session from accumulating executor storage
      finally spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Builder-side token substitution: {THUMBS} -> this run's
    // materialized decode sidecar (written during query construction
    // above, so it exists by the time the driver's DuckDB reads it).
    // Oracle SQL stays static text per query; only the fixture-derived
    // path varies per run. Failed queries are dropped here: their
    // Spark dump does not exist, and pairing SQL with a missing dump
    // would let the driver compare DuckDB against stale state instead
    // of reporting the Spark failure.
    val thumbs = graft.ops.Multimodal.thumbsSidecarPath(sfDir)
    val graph = graft.ops.Similarity.graphSidecarPath(sfDir)
    val graphBase = graft.ops.Similarity.graphBaseSidecarPath(sfDir)
    val graphUpper = graft.ops.Similarity.upperGraphSidecarPath(sfDir)
    val pqBook = graft.ops.Similarity.pqCodebookSidecarPath(sfDir)
    val pqCodes = graft.ops.Similarity.pqCodesSidecarPath(sfDir)
    val pqBookBase = graft.ops.Similarity.pqBaseCodebookSidecarPath(sfDir)
    val uniVocab = graft.ops.Text.uniVocabSidecarPath(sfDir)
    val bpeMerges = graft.ops.Text.bpeMergesSidecarPath(sfDir)
    val json = SparkEntry.oracleSql
      .filter(kv => keep(kv._1) && !failures.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v
        .replace("{THUMBS}", thumbs)
        .replace("{GRAPH}", graph)
        .replace("{GRAPHBASE}", graphBase)
        .replace("{GRAPHUPPER}", graphUpper)
        .replace("{PQCODEBOOKBASE}", pqBookBase)
        .replace("{PQCODEBOOK}", pqBook)
        .replace("{PQCODES}", pqCodes)
        .replace("{UNIVOCAB}", uniVocab)
        .replace("{BPEMERGES}", bpeMerges))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Per-query metadata sidecar: row counts + vacuous markers +
    // Spark-side failures, for t2_local.py and the round artifacts.
    val metaRows = rowCounts.map { case (name, n) =>
      val vac = n == 0L
      val declared = declaredVacuous.get(name).exists(_.contains(fixture))
      s"""${q(name)}: {"spark_rows": $n, "vacuous": $vac,""" +
        s""" "declared_vacuous": $declared,""" +
        s""" "unexpected_vacuous": ${vac && !declared}}"""
    }.mkString("{", ",", "}")
    val failRows = failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_meta.json"),
      s"""{"fixture": ${q(fixture)}, "queries": $metaRows, "failures": $failRows}""")
    // exit 0 even with per-query failures: the driver must still read
    // the dumps that DID land (a nonzero exit could zero the whole
    // round); the failures are loud through the missing dump, the
    // dropped oracle entry, and verify_meta.json's failures map
    spark.stop()
  }
}
