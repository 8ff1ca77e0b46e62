package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operator family for LLM-data pipelines (SURVEY.md §2
  * Tier B / north star): exact hash dedup, MinHash+LSH near-dup,
  * SimHash signatures, df-pruned n-gram Jaccard, and embedding-cosine
  * near-dup with IVF-style blocking.
  *
  * Scale design (100 TB corpus):
  *  - Near-dup never does an all-pairs join. MinHash candidates come
  *    from a band-bucket self-join (equi-key shuffle on (band, bandsig);
  *    candidate count ~ true-dup count, not n^2). The n-gram variant
  *    uses an inverted index pruned by document frequency, the
  *    embedding variant blocks on the cluster id (IVF coarse quantizer).
  *  - Signatures (MinHash sig, SimHash bits) are computed with
  *    higher-order array functions inside one projection — per-doc work
  *    with no row blowup and no UDF, so it stays in codegen and the
  *    only shuffle is the candidate join itself.
  *  - Hashes are md5 hex strings: deterministic, portable (the DuckDB
  *    oracles replicate the exact same signatures), and uniformly
  *    distributed for banding. A 100 TB run would swap md5 for xxhash64
  *    with the same structure (one line per expression).
  */
object Dedup extends QueryFamily {

  /** Distinct n-word shingles as (doc_id, sh) rows. Built by exploding
    * positions and concatenating via element_at — every expression on
    * the hot path is codegen'd (a `transform` lambda would evaluate
    * interpreted and gets re-evaluated in every join branch that reuses
    * the shingle relation). */
  private def shingleRows(spark: SparkSession, dir: String, n: Int): DataFrame = {
    import spark.implicits._
    val parts = (0 until n).map(k => expr(s"element_at(w, i + $k)"))
    T.documentsSpread(spark, dir)
      .select($"doc_id", split($"text", " ").as("w"))
      .select($"doc_id", $"w", explode(expr(
        s"CASE WHEN size(w) >= $n THEN sequence(1, size(w) - ${n - 1}) ELSE array() END")).as("i"))
      .select($"doc_id", concat_ws(" ", parts: _*).as("sh"))
      .distinct()
  }

  /** Signature width: 16 minhash components per doc (16 longs shuffled
    * per doc, not the shingle set — the scale contract). */
  private[graft] val SigComponents = 16

  /** Production LSH banding: 4 bands × 4 rows. DERIVED FROM the
    * measured S-curve in [[qLshBandSweep]], not the textbook curve:
    * at both sf0.001 and sf0.01 the 4×4 layout finds the maximal
    * verified yield at the 0.8 Jaccard threshold (2×8 is more precise
    * but MISSES true pairs — 27/28 at sf0.001; 8×2 finds no more true
    * pairs yet shuffles ~2× the candidates at less than half the
    * precision). 4×4 = max recall at minimum candidate volume; the
    * LshBandingSpec pins this dominance against the sweep on every
    * build, so a corpus shift that changes the trade-off fails loudly
    * instead of silently over- or under-shuffling. */
  private[graft] val ProductionBands = 4

  /** Explode a signature relation (doc_id, sig ARRAY<BIGINT>) into
    * (doc_id, b, bandsig) band-bucket keys for an `nBands`-way layout.
    * Shared by the production pipeline ([[minhashPairs]], which passes
    * [[ProductionBands]]) and the measurement sweep ([[qLshBandSweep]]),
    * so the sweep measures exactly the expression the production path
    * runs. All codegen'd array ops; no row blowup beyond |docs|×nBands. */
  private def bandExplode(sigs: DataFrame, nBands: Int): DataFrame = {
    val rows = SigComponents / nBands
    sigs.select(col("doc_id"), posexplode(expr(
      s"""transform(sequence(0, ${nBands - 1}),
         |  b -> md5(cast(concat_ws('|', transform(slice(sig, b * $rows + 1, $rows),
         |                                         x -> cast(x AS string))) AS binary)))""".stripMargin))
      .as(Seq("b", "bandsig")))
  }

  /** Exact dedup: group by full-content hash, keep the smallest doc_id. */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.documents(spark, dir)
      .groupBy(md5($"text".cast("binary")).as("h"))
      .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("n_dups"))
      .select($"doc_id", $"h", $"n_dups")
      .orderBy($"doc_id")
  }

  val qDedupExactSql: String =
    """SELECT min(doc_id) AS doc_id, md5(text) AS h, count(*) AS n_dups
      |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin

  /** MinHash signatures (16 hashes), banded 4x4, band-bucket self-join
    * for candidates, exact-Jaccard verification of candidates only.
    *
    * One md5 per shingle instance; the 16 permutations are affine maps
    * `(2s+1)*h + c mod 2^31-1` over the hash's 48-bit integer prefix.
    * Everything after the single md5 is codegen'd long arithmetic in an
    * exploded (doc, shingle, seed) stream with map-side partial min —
    * ~20x faster than nesting md5 inside per-seed lambda evaluation,
    * and the shape that scales: shuffle rows = |docs| x 16, not
    * |shingles| x 16. */
  /** When `boundary` is set, candidate pairs are restricted across it
    * (a-side doc_id < boundary, b-side >= boundary) BEFORE the band
    * self-join — the incremental-ingest shape where a batch is deduped
    * against the corpus without materializing corpus×corpus pairs. */
  private def minhashPairs(spark: SparkSession, dir: String,
      boundary: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val p = 2147483647L
    // the shingle relation feeds signature hashing, candidate
    // verification (twice) and the size side-tables; cache it so the
    // explode+md5 pipeline runs once per invocation (and Spark's
    // plan-keyed cache shares it across queries in one session)
    val shx = shingleRows(spark, dir, 3).cache()
    val hashed = shx
      .withColumn("h", expr("cast(conv(substring(md5(sh), 1, 12), 16, 10) AS bigint)") % p)
    // one-pass signature UDAF: map-side partial reduce means the shuffle
    // carries one 16-long buffer per doc per partition, not 16 rows per
    // shingle (graft.functions.Aggregators.MinHashSig)
    val sigs = hashed.groupBy($"doc_id")
      .agg(graft.functions.Aggregators.minhashSig(SigComponents)($"h").as("sig"))
    val bands = bandExplode(sigs, ProductionBands)
    val (bandsA, bandsB) = boundary match {
      case Some(cut) => (bands.filter($"doc_id" < cut), bands.filter($"doc_id" >= cut))
      case None => (bands, bands)
    }
    val cand = bandsA.select($"doc_id".as("a_id"), $"b", $"bandsig")
      .join(bandsB.select($"doc_id".as("b_id"), $"b", $"bandsig"), Seq("b", "bandsig"))
      .filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id").distinct()
    val sizes = shx.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(shx.select($"doc_id".as("a_id"), $"sh"), Seq("a_id"))
      .join(shx.select($"doc_id".as("b_id"), $"sh"), Seq("b_id", "sh"))
      .groupBy($"a_id", $"b_id").agg(count(lit(1)).as("ninter"))
    inter
      .join(sizes.select($"doc_id".as("a_id"), $"n".as("na")), Seq("a_id"))
      .join(sizes.select($"doc_id".as("b_id"), $"n".as("nb")), Seq("b_id"))
      .withColumn("j", $"ninter".cast("double") / ($"na" + $"nb" - $"ninter"))
  }

  def qDedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    minhashPairs(spark, dir)
      .filter($"j" >= 0.8)
      .select($"a_id", $"b_id", round($"j", 4).as("jaccard"))
      .orderBy($"a_id", $"b_id")
  }

  /** The production (doc_id, b, bandsig) band-key relation — the
    * 16-component signature banded 4x4. Shared with StreamingOps'
    * online near-dup admission, which keys ingest state by these
    * exact band signatures. */
  private[graft] def docBands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = 2147483647L
    val sigs = shingleRows(spark, dir, 3)
      .withColumn("h", expr("cast(conv(substring(md5(sh), 1, 12), 16, 10) AS bigint)") % p)
      .groupBy($"doc_id")
      .agg(graft.functions.Aggregators.minhashSig(SigComponents)($"h").as("sig"))
    bandExplode(sigs, ProductionBands)
  }

  /** Shared CTE prefix replicating the exact MinHash pipeline in DuckDB
    * (same 48-bit md5 prefix -> same affine permutations -> same bands). */
  /** Shared with [[Curation.qCurationWaterfall]]'s oracle, which
    * re-runs the near-dup gate inside its stage funnel. */
  private[ops] def minhashCteShared: String = minhashCte

  private val minhashCte: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
      |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shs FROM w),
      |shx AS (SELECT doc_id, unnest(shs) AS s FROM sh),
      |hashed AS (SELECT doc_id, s,
      |  (list_sum(list_transform(range(1, 13),
      |     i -> (strpos('0123456789abcdef', substr(md5(s), i, 1)) - 1) * pow(16.0, 12 - i)))::BIGINT)
      |   % 2147483647 AS h
      |  FROM shx),
      |mh AS (SELECT doc_id, seed, min(((2*seed+1) * h + (12345 + seed*6789)) % 2147483647) AS mh
      |  FROM hashed, range(0, 16) t(seed) GROUP BY doc_id, seed),
      |bands AS (SELECT doc_id, seed // 4 AS b,
      |  md5(string_agg(mh::VARCHAR, '|' ORDER BY seed)) AS bandsig
      |  FROM mh GROUP BY doc_id, seed // 4),
      |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM bands a JOIN bands b ON a.b = b.b AND a.bandsig = b.bandsig
      |  WHERE a.doc_id < b.doc_id),
      |verified AS (SELECT a_id, b_id,
      |  len(list_intersect(sa.shs, sb.shs))::DOUBLE /
      |  (len(sa.shs) + len(sb.shs) - len(list_intersect(sa.shs, sb.shs))) AS j
      |  FROM cand JOIN sh sa ON sa.doc_id = a_id JOIN sh sb ON sb.doc_id = b_id)""".stripMargin

  val qDedupMinhashSql: String =
    s"""$minhashCte
       |SELECT a_id, b_id, round(j, 4) AS jaccard FROM verified
       |WHERE j >= 0.8 ORDER BY a_id, b_id""".stripMargin

  /** MinHash estimator audit: for every banded candidate pair, the
    * signature-agreement estimate (matching components / 16) against
    * the exact shingle Jaccard — the audit that justifies trusting
    * 16 longs per doc instead of the shingle sets at 100 TB. One
    * |pairs|-sized join of the signature relation against itself plus
    * the existing exact-verify; output is the error profile (n, mean,
    * max) a pipeline owner reads before raising the LSH threshold. */
  def qMinhashEstAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = 2147483647L
    val sigs = shingleRows(spark, dir, 3)
      .withColumn("h", expr("cast(conv(substring(md5(sh), 1, 12), 16, 10) AS bigint)") % p)
      .groupBy($"doc_id")
      .agg(graft.functions.Aggregators.minhashSig(SigComponents)($"h").as("sig"))
    val est = minhashPairs(spark, dir)
      .join(sigs.select($"doc_id".as("a_id"), $"sig".as("sa")), Seq("a_id"))
      .join(sigs.select($"doc_id".as("b_id"), $"sig".as("sb")), Seq("b_id"))
      .withColumn("est_j",
        expr("size(filter(zip_with(sa, sb, (x, y) -> x = y), v -> v))") / 16.0)
    est.agg(
      count(lit(1)).as("n_pairs"),
      round(avg(abs($"est_j" - $"j")), 4).as("mean_abs_err"),
      round(max(abs($"est_j" - $"j")), 4).as("max_abs_err"))
  }

  val qMinhashEstAuditSql: String =
    s"""$minhashCte,
       |est AS (SELECT c.a_id, c.b_id,
       |    (sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END))::DOUBLE / 16 AS est_j
       |  FROM cand c
       |  JOIN mh ma ON ma.doc_id = c.a_id
       |  JOIN mh mb ON mb.doc_id = c.b_id AND mb.seed = ma.seed
       |  GROUP BY 1, 2)
       |SELECT count(*) AS n_pairs,
       |  round(avg(abs(est_j - j)), 4) AS mean_abs_err,
       |  round(max(abs(est_j - j)), 4) AS max_abs_err
       |FROM est JOIN verified USING (a_id, b_id)""".stripMargin

  /** LSH banding sweep: candidate volume, verified-pair yield and
    * precision for the three 16-component band layouts (8 bands of 2,
    * 4 of 4, 2 of 8) — the S-curve knob that trades shuffle volume
    * against recall at a fixed similarity threshold. More bands catch
    * lower-similarity pairs but shuffle more candidates; the sweep
    * MEASURES the trade on the corpus instead of trusting the
    * textbook curve. One signature relation feeds all three layouts;
    * per layout the band bucket join is the same equi-key shape the
    * production (4×4) config uses. */
  def qLshBandSweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = 2147483647L
    // eager ckpt (not lazy cache): the three layouts each consume shx
    // twice and sigs once — materializing both up front truncates the
    // shared lineage, so no layout re-derives the shingle/signature
    // pipeline during its own planning or a cache miss (the round-10
    // idle-drift finding on this query: 2.7 -> 3.8 s with lazy caches)
    val shx = shingleRows(spark, dir, 3).ckpt()
    val sigs = shx
      .withColumn("h", expr("cast(conv(substring(md5(sh), 1, 12), 16, 10) AS bigint)") % p)
      .groupBy($"doc_id")
      .agg(graft.functions.Aggregators.minhashSig(SigComponents)($"h").as("sig"))
      .ckpt()
    val sizes = shx.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    def layout(nBands: Int): DataFrame = {
      val rows = SigComponents / nBands
      val bands = bandExplode(sigs, nBands)
      val cand = bands.select($"doc_id".as("a_id"), $"b", $"bandsig")
        .join(bands.select($"doc_id".as("b_id"), $"b", $"bandsig"), Seq("b", "bandsig"))
        .filter($"a_id" < $"b_id")
        .select($"a_id", $"b_id").distinct()
      val inter = cand
        .join(shx.select($"doc_id".as("a_id"), $"sh"), Seq("a_id"))
        .join(shx.select($"doc_id".as("b_id"), $"sh"), Seq("b_id", "sh"))
        .groupBy($"a_id", $"b_id").agg(count(lit(1)).as("ninter"))
      val verified = inter
        .join(sizes.select($"doc_id".as("a_id"), $"n".as("na")), Seq("a_id"))
        .join(sizes.select($"doc_id".as("b_id"), $"n".as("nb")), Seq("b_id"))
        .withColumn("j", $"ninter".cast("double") / ($"na" + $"nb" - $"ninter"))
      cand.agg(count(lit(1)).as("n_candidates")).crossJoin(
          verified.filter($"j" >= 0.8).agg(count(lit(1)).as("n_verified")))
        .select(lit(s"${nBands}x$rows").as("layout"),
          $"n_candidates", $"n_verified",
          round($"n_verified".cast("double") /
            greatest($"n_candidates", lit(1L)), 4).as("precision"))
    }
    layout(8).unionByName(layout(4)).unionByName(layout(2))
      .orderBy($"layout")
  }

  val qLshBandSweepSql: String = {
    def one(nBands: Int): String = {
      val rows = 16 / nBands
      s"""SELECT '${nBands}x$rows' AS layout,
         |  (SELECT count(*) FROM cand_$nBands) AS n_candidates,
         |  (SELECT count(*) FROM ver_$nBands WHERE j >= 0.8) AS n_verified,
         |  round((SELECT count(*) FROM ver_$nBands WHERE j >= 0.8)::DOUBLE /
         |    greatest((SELECT count(*) FROM cand_$nBands), 1), 4) AS precision
         |""".stripMargin
    }
    def cte(nBands: Int): String =
      s"""bands_$nBands AS (SELECT doc_id, seed // ${16 / nBands} AS b,
         |  md5(string_agg(mh::VARCHAR, '|' ORDER BY seed)) AS bandsig
         |  FROM mh GROUP BY doc_id, seed // ${16 / nBands}),
         |cand_$nBands AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bands_$nBands a JOIN bands_$nBands b
         |    ON a.b = b.b AND a.bandsig = b.bandsig
         |  WHERE a.doc_id < b.doc_id),
         |ver_$nBands AS (SELECT a_id, b_id,
         |  len(list_intersect(sa.shs, sb.shs))::DOUBLE /
         |  (len(sa.shs) + len(sb.shs) - len(list_intersect(sa.shs, sb.shs))) AS j
         |  FROM cand_$nBands JOIN sh sa ON sa.doc_id = a_id
         |  JOIN sh sb ON sb.doc_id = b_id)""".stripMargin
    s"""$minhashCte,
       |${cte(8)},
       |${cte(2)}
       |${one(8)}UNION ALL
       |SELECT '4x4', (SELECT count(*) FROM cand),
       |  (SELECT count(*) FROM verified WHERE j >= 0.8),
       |  round((SELECT count(*) FROM verified WHERE j >= 0.8)::DOUBLE /
       |    greatest((SELECT count(*) FROM cand), 1), 4)
       |UNION ALL
       |${one(2)}ORDER BY layout""".stripMargin
  }

  /** Near-dup dedup survivors: drop every doc that near-duplicates
    * (j >= 0.8) a doc with a smaller id — the standard one-pass keep
    * rule over the LSH pair list. */
  def qDedupSurvivors(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val drop = minhashPairs(spark, dir).filter($"j" >= 0.8).select($"b_id")
    T.documents(spark, dir)
      .join(drop, $"doc_id" === $"b_id", "left_anti")
      .select($"doc_id")
      .orderBy($"doc_id")
  }

  val qDedupSurvivorsSql: String =
    s"""$minhashCte
       |SELECT doc_id FROM documents
       |WHERE doc_id NOT IN (SELECT b_id FROM verified WHERE j >= 0.8)
       |ORDER BY doc_id""".stripMargin

  /** Near-dup clusters: connected components over the verified MinHash
    * pair graph, labels = min doc_id per component (docs in no pair are
    * their own singleton cluster).
    *
    * Implemented as alternating large-star/small-star contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    * each round hangs nodes directly off their neighborhood minimum, so
    * the edge set converges to a star forest rooted at component minima
    * in O(log d) rounds — vs O(diameter) for plain label propagation —
    * and the edge set SHRINKS as it contracts, so per-round shuffle
    * volume falls. Every round ends in an eager `localCheckpoint`,
    * truncating lineage (constant-size plans no matter how many rounds)
    * with exactly one aggregate action per round for the fixpoint test.
    * Deterministic: the star-forest fixpoint is unique. */
  def qDedupClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = minhashPairs(spark, dir).filter($"j" >= 0.8)
      .select($"a_id".as("u"), $"b_id".as("v"))
    val roots = connectedComponentRoots(edges)
    T.documents(spark, dir).select($"doc_id")
      .join(roots, $"doc_id" === $"u", "left")
      .select($"doc_id", coalesce($"root", $"doc_id").as("cluster_id"))
      .orderBy($"doc_id")
  }

  /** Connected components of an undirected (u, v) edge relation via
    * alternating large-star/small-star contraction; returns the
    * (u, root) relation mapping every non-isolated node to its
    * component's minimum id. Shared by [[qDedupClusters]] (MinHash
    * text graph) and Similarity's q_semantic_clusters (mutual-kNN
    * embedding graph). See [[qDedupClusters]]'s doc for the
    * algorithm's scaling argument. */
  private[ops] def connectedComponentRoots(edges0: DataFrame): DataFrame = {
    val spark = edges0.sparkSession
    import spark.implicits._
    // large-star: connect every neighbor v > u to m = min(N(u) ∪ {u})
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionByName(e.select($"v".as("u"), $"u".as("v")))
      val m = sym.groupBy($"u").agg(min($"v").as("mv"))
        .select($"u", least($"u", $"mv").as("m"))
      sym.join(m, Seq("u")).filter($"v" > $"u")
        .select($"v".as("u"), $"m".as("v"))
        .filter($"u" =!= $"v").distinct()
    }
    // small-star: orient edges toward the smaller endpoint, then connect
    // each node's smaller neighbors (and itself) to their minimum
    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e.select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
      val m = oriented.groupBy($"u").agg(min($"v").as("m"))
      oriented.join(m, Seq("u"))
        .select($"v".as("u"), $"m".as("v"))
        .unionByName(m.select($"u", $"m".as("v")))
        .filter($"u" =!= $"v").distinct()
    }
    // edge-set fingerprint: one cheap action per round on checkpointed data
    def sig(e: DataFrame): (Long, Long) = {
      // bit_xor is order-independent and cannot overflow under ANSI mode
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var edges = edges0.filter($"u" =!= $"v").distinct().ckpt()
    var s = sig(edges)
    var converged = false
    while (!converged) {
      val next = smallStar(largeStar(edges)).ckpt()
      val ns = sig(next)
      converged = ns == s
      edges = next
      s = ns
    }
    // at the fixpoint every edge is (node, component-min root)
    edges.groupBy($"u").agg(min($"v").as("root"))
  }

  val qDedupClustersSql: String =
    s"""${minhashCte.replace("WITH w AS", "WITH RECURSIVE w AS")},
       |edges AS (SELECT a_id AS u, b_id AS v FROM verified WHERE j >= 0.8
       |          UNION ALL SELECT b_id, a_id FROM verified WHERE j >= 0.8),
       |reach(u, v) AS (SELECT u, v FROM edges
       |  UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
       |SELECT d.doc_id, least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS cluster_id
       |FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  /** SimHash: 32-bit signature from per-token md5 prefixes. Tokens are
    * exploded once (md5 + hex-parse stay codegen'd projections) and the
    * [[graft.functions.Aggregators.SimHashSig]] UDAF folds the 32
    * +1/-1 counters map-side — one shuffle buffer per doc, no
    * interpreted per-bit lambda work. */
  private def simhashes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.documentsSpread(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("t"))
      .withColumn("h", expr("cast(conv(substring(md5(t), 1, 8), 16, 10) AS bigint)"))
      .groupBy($"doc_id")
      .agg(graft.functions.Aggregators.simhashSig($"h").as("simhash"))
  }

  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    simhashes(spark, dir).orderBy($"doc_id")
  }

  /** SimHash near-dup pairs: band the 32-bit signature into 4 8-bit
    * chunks (hamming <= 3 guarantees at least one identical band — here
    * the accept threshold is <= 1, stricter than the banding bound), an
    * equi-join per band yields candidates, and the native codegen'd
    * [[graft.functions.HammingDistance]] expression verifies. */
  def qDedupSimhashPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sims = simhashes(spark, dir)
    val bands = sims.select($"doc_id", $"simhash",
      posexplode(expr(
        "transform(sequence(0, 3), b -> substring(simhash, b * 8 + 1, 8))")).as(Seq("b", "key")))
    val cand = bands.select($"doc_id".as("a_id"), $"simhash".as("sa"), $"b", $"key")
      .join(bands.select($"doc_id".as("b_id"), $"simhash".as("sb"), $"b", $"key"),
        Seq("b", "key"))
      .filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id", $"sa", $"sb").distinct()
    cand
      .withColumn("hamming", graft.functions.F.hammingDistance($"sa", $"sb"))
      .filter($"hamming" <= 1)
      .select($"a_id", $"b_id", $"hamming")
      .orderBy($"a_id", $"b_id")
  }

  val qDedupSimhashPairsSql: String =
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |h AS (SELECT doc_id, md5(t) AS h FROM w),
      |bits AS (SELECT doc_id, b,
      |  CASE WHEN ((strpos('0123456789abcdef', substr(h, (b//4)+1, 1)) - 1) >> (b % 4)) & 1 = 1
      |       THEN 1 ELSE -1 END AS v
      |  FROM h, range(0, 32) t(b)),
      |acc AS (SELECT doc_id, b, sum(v) AS s FROM bits GROUP BY 1, 2),
      |sh AS (SELECT doc_id,
      |  string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS simhash
      |  FROM acc GROUP BY doc_id),
      |bands AS (SELECT doc_id, simhash, b, substr(simhash, b*8+1, 8) AS key
      |  FROM sh, range(0, 4) t(b)),
      |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
      |    a.simhash AS sa, b.simhash AS sb
      |  FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key
      |  WHERE a.doc_id < b.doc_id),
      |hd AS (SELECT a_id, b_id,
      |  len(list_filter(range(1, 33), i -> substr(sa, i, 1) != substr(sb, i, 1))) AS hamming
      |  FROM cand)
      |SELECT a_id, b_id, hamming FROM hd WHERE hamming <= 1
      |ORDER BY a_id, b_id""".stripMargin

  val qDedupSimhashSql: String =
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |h AS (SELECT doc_id, md5(t) AS h FROM w),
      |bits AS (SELECT doc_id, b,
      |  CASE WHEN ((strpos('0123456789abcdef', substr(h, (b//4)+1, 1)) - 1) >> (b % 4)) & 1 = 1
      |       THEN 1 ELSE -1 END AS v
      |  FROM h, range(0, 32) t(b)),
      |acc AS (SELECT doc_id, b, sum(v) AS s FROM bits GROUP BY 1, 2)
      |SELECT doc_id,
      | string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS simhash
      |FROM acc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Exact n-gram (4-word shingle) Jaccard near-dup via a df-pruned
    * inverted index: candidate pairs must share a shingle whose
    * document frequency is <= 10, so the candidate join degree is
    * bounded regardless of corpus size. */
  def qDedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // feeds df-pruning, two verification joins and the size table —
    // cache so the explode pipeline materializes once
    val shx = shingleRows(spark, dir, 4).cache()
    val rare = shx.groupBy($"sh").agg(count(lit(1)).as("df")).filter($"df" <= 10 && $"df" >= 2)
    val rareShx = shx.join(rare.select($"sh"), Seq("sh"))
    val cand = rareShx.select($"doc_id".as("a_id"), $"sh")
      .join(rareShx.select($"doc_id".as("b_id"), $"sh"), Seq("sh"))
      .filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id").distinct()
    val sizes = shx.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(shx.select($"doc_id".as("a_id"), $"sh"), Seq("a_id"))
      .join(shx.select($"doc_id".as("b_id"), $"sh"), Seq("b_id", "sh"))
      .groupBy($"a_id", $"b_id").agg(count(lit(1)).as("ninter"))
    inter
      .join(sizes.select($"doc_id".as("a_id"), $"n".as("na")), Seq("a_id"))
      .join(sizes.select($"doc_id".as("b_id"), $"n".as("nb")), Seq("b_id"))
      .withColumn("j", $"ninter".cast("double") / ($"na" + $"nb" - $"ninter"))
      .filter($"j" >= 0.5)
      .select($"a_id", $"b_id", round($"j", 4).as("jaccard"))
      .orderBy($"a_id", $"b_id")
  }

  val qDedupNgramJaccardSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)-2),
      |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shs FROM w),
      |shx AS (SELECT doc_id, unnest(shs) AS s FROM sh),
      |rare AS (SELECT s FROM shx GROUP BY s HAVING count(*) <= 10 AND count(*) >= 2),
      |rx AS (SELECT doc_id, s FROM shx JOIN rare USING (s)),
      |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM rx a JOIN rx b ON a.s = b.s WHERE a.doc_id < b.doc_id),
      |verified AS (SELECT a_id, b_id,
      |  len(list_intersect(sa.shs, sb.shs))::DOUBLE /
      |  (len(sa.shs) + len(sb.shs) - len(list_intersect(sa.shs, sb.shs))) AS j
      |  FROM cand JOIN sh sa ON sa.doc_id = a_id JOIN sh sb ON sb.doc_id = b_id)
      |SELECT a_id, b_id, round(j, 4) AS jaccard FROM verified
      |WHERE j >= 0.5 ORDER BY a_id, b_id""".stripMargin

  /** Materialized MinHash signatures (doc_id, 16-wide sig). In a
    * production pipeline these persist beside the corpus so future
    * batches dedup against stored signatures instead of re-hashing the
    * whole corpus. The signature is emitted as a comma-joined string —
    * top-level array columns crash the driver harness's pandas row sort
    * (unhashable ndarray), and the string form is equally portable. */
  def qDedupMinhashSigs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = 2147483647L
    shingleRows(spark, dir, 3)
      .withColumn("h", expr("cast(conv(substring(md5(sh), 1, 12), 16, 10) AS bigint)") % p)
      .groupBy($"doc_id")
      .agg(graft.functions.Aggregators.minhashSig(SigComponents)($"h").as("sig_arr"))
      .select($"doc_id",
        expr("array_join(transform(sig_arr, x -> cast(x AS string)), ',')").as("sig"))
      .orderBy($"doc_id")
  }

  val qDedupMinhashSigsSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
      |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shs FROM w),
      |shx AS (SELECT doc_id, unnest(shs) AS s FROM sh),
      |hashed AS (SELECT doc_id, s,
      |  (list_sum(list_transform(range(1, 13),
      |     i -> (strpos('0123456789abcdef', substr(md5(s), i, 1)) - 1) * pow(16.0, 12 - i)))::BIGINT)
      |   % 2147483647 AS h
      |  FROM shx),
      |mh AS (SELECT doc_id, seed, min(((2*seed+1) * h + (12345 + seed*6789)) % 2147483647) AS mh
      |  FROM hashed, range(0, 16) t(seed) GROUP BY doc_id, seed)
      |SELECT doc_id, string_agg(mh::VARCHAR, ',' ORDER BY seed) AS sig
      |FROM mh GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Incremental dedup: which documents of an arriving batch
    * (doc_id >= 400) near-duplicate the existing corpus (doc_id < 400).
    * The boundary is pushed into the band join's build/probe sides
    * (corpus bands vs batch bands), so the candidate set is
    * corpus×batch, never corpus×corpus — the shape of a daily-ingest
    * dedup where corpus signatures are precomputed. */
  def qDedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    minhashPairs(spark, dir, boundary = Some(400L))
      .filter($"j" >= 0.8)
      .groupBy($"b_id".as("new_doc"))
      .agg(min($"a_id").as("matches_existing"), round(max($"j"), 4).as("max_j"))
      .orderBy($"new_doc")
  }

  val qDedupIncrementalSql: String =
    s"""$minhashCte
       |SELECT b_id AS new_doc, min(a_id) AS matches_existing,
       |       round(max(j), 4) AS max_j
       |FROM verified WHERE j >= 0.8 AND a_id < 400 AND b_id >= 400
       |GROUP BY b_id ORDER BY new_doc""".stripMargin

  /** End-to-end corpus curation (the LLM-pipeline composition): drop
    * near-dups (keep cluster minimum), keep quality >= 0.3 and
    * token-count >= 20, report per-language yield. */
  def qCleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val drop = minhashPairs(spark, dir).filter($"j" >= 0.8).select($"b_id")
    T.documents(spark, dir)
      .join(drop, $"doc_id" === $"b_id", "left_anti")
      .withColumn("w", split($"text", " "))
      .withColumn("n_stop", size(filter($"w", x => array_contains(stopArrShared, x))))
      .withColumn("quality",
        least(lit(1.0), size($"w") / lit(100.0)) *
          (lit(1.0) - $"n_stop".cast("double") / size($"w")))
      .filter($"quality" >= 0.3 && size($"w") >= 20)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_kept"),
        round(avg($"quality"), 4).as("avg_quality"),
        sum($"n_chars").as("sum_chars"))
      .orderBy($"lang")
  }

  private def stopArrShared =
    array(Seq("the", "a", "of", "and", "to", "in").map(lit): _*)

  val qCleanCorpusSql: String =
    s"""$minhashCte,
       |keep AS (SELECT d.* FROM documents d
       |  WHERE doc_id NOT IN (SELECT b_id FROM verified WHERE j >= 0.8)),
       |scored AS (SELECT lang, n_chars,
       |  least(1.0, len(w) / 100.0) *
       |    (1.0 - len(list_filter(w, x -> list_contains(['the','a','of','and','to','in'], x)))::DOUBLE / len(w)) AS quality,
       |  len(w) AS n_tok
       |  FROM (SELECT lang, n_chars, string_split(text, ' ') AS w, doc_id FROM keep))
       |SELECT lang, count(*) AS n_kept, round(avg(quality), 4) AS avg_quality,
       |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM scored WHERE quality >= 0.3 AND n_tok >= 20
       |GROUP BY lang ORDER BY lang""".stripMargin

  /** Asymmetric containment (|A∩B| / |A|): detects quotation /
    * subset-duplication that symmetric Jaccard under-scores. Same
    * df-pruned candidate generation as the n-gram query; both
    * directions reported for pairs where either containment >= 0.5. */
  def qDedupContainment(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // same cached relation (and cache entry) as qDedupNgramJaccard
    val shx = shingleRows(spark, dir, 4).cache()
    val rare = shx.groupBy($"sh").agg(count(lit(1)).as("df")).filter($"df" <= 10 && $"df" >= 2)
    val rareShx = shx.join(rare.select($"sh"), Seq("sh"))
    val cand = rareShx.select($"doc_id".as("a_id"), $"sh")
      .join(rareShx.select($"doc_id".as("b_id"), $"sh"), Seq("sh"))
      .filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id").distinct()
    val sizes = shx.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(shx.select($"doc_id".as("a_id"), $"sh"), Seq("a_id"))
      .join(shx.select($"doc_id".as("b_id"), $"sh"), Seq("b_id", "sh"))
      .groupBy($"a_id", $"b_id").agg(count(lit(1)).as("ninter"))
    inter
      .join(sizes.select($"doc_id".as("a_id"), $"n".as("na")), Seq("a_id"))
      .join(sizes.select($"doc_id".as("b_id"), $"n".as("nb")), Seq("b_id"))
      .withColumn("cont_a", $"ninter".cast("double") / $"na")
      .withColumn("cont_b", $"ninter".cast("double") / $"nb")
      .filter($"cont_a" >= 0.5 || $"cont_b" >= 0.5)
      .select($"a_id", $"b_id",
        round($"cont_a", 4).as("cont_a"), round($"cont_b", 4).as("cont_b"))
      .orderBy($"a_id", $"b_id")
  }

  val qDedupContainmentSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)-2),
      |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shs FROM w),
      |shx AS (SELECT doc_id, unnest(shs) AS s FROM sh),
      |rare AS (SELECT s FROM shx GROUP BY s HAVING count(*) <= 10 AND count(*) >= 2),
      |rx AS (SELECT doc_id, s FROM shx JOIN rare USING (s)),
      |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM rx a JOIN rx b ON a.s = b.s WHERE a.doc_id < b.doc_id),
      |m AS (SELECT a_id, b_id,
      |  len(list_intersect(sa.shs, sb.shs))::DOUBLE / len(sa.shs) AS cont_a,
      |  len(list_intersect(sa.shs, sb.shs))::DOUBLE / len(sb.shs) AS cont_b
      |  FROM cand JOIN sh sa ON sa.doc_id = a_id JOIN sh sb ON sb.doc_id = b_id)
      |SELECT a_id, b_id, round(cont_a, 4) AS cont_a, round(cont_b, 4) AS cont_b
      |FROM m WHERE cont_a >= 0.5 OR cont_b >= 0.5
      |ORDER BY a_id, b_id""".stripMargin

  /** Embedding-cosine near-dup, SemDeDup-shaped (Abbas et al. 2023):
    * candidates come from a coarse cell, exact cosine verifies only
    * candidates. The cell is (label, sign-prefix) where the sign-LSH
    * prefix width is DATA-ADAPTIVE per block
    * ([[Similarity.scaledBits]]: 0 extra bits while a label block fits
    * the 64-vector target — so small corpora compare the whole block,
    * byte-identical to the round-8 all-pairs answer — and
    * ceil(log2(block/64)) bits once it outgrows it, splitting the
    * block so per-cell pairs stay O(block x 64) instead of O(block²)).
    * That kills the round-8 scale defect: `label` is a small FIXED
    * set, so label-only blocking grew O(n²/|labels|); the sub-split
    * key's cardinality grows with n. Recall trade is the SemDeDup one:
    * true near-dups (cos >= 0.9, per-hyperplane sign agreement >= .86)
    * stay co-celled with high probability at the shallow scaled
    * depths; far pairs near the 0.4 floor may split — exactly the
    * pairs a near-dup pass is free to drop. The cosine kernel is the
    * native codegen'd [[graft.functions.CosineSimilarity]] expression
    * (same sequential double accumulation as the HOF formulation). */
  def qDedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    dedupEmbeddingCandidates(spark, dir)
      .withColumn("cos", graft.functions.F.cosineSimilarity($"va", $"vb"))
      .filter($"cos" >= 0.4)
      .select($"a_id", $"b_id", round($"cos", 4).as("cos"))
      .orderBy($"a_id", $"b_id")
  }

  /** Candidate pairs (a_id, va, b_id, vb) of [[qDedupEmbedding]] —
    * split out so ScaleSpec can assert the candidate count grows
    * sub-quadratically across the sf0.01/sf0.1 fixtures. */
  private[graft] def dedupEmbeddingCandidates(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e0 = T.embeddings(spark, dir).select($"vec_id", $"label", $"embedding")
    val blocks = e0.groupBy($"label").agg(count(lit(1)).as("bn"))
    val e = e0.join(broadcast(blocks), Seq("label"))
      .withColumn("bits",
        Similarity.scaledBits($"bn", targetBucket = 64, floor = 0, max = 16))
      .withColumn("sg", Similarity.signBits(16))
      .withColumn("cell", expr("substring(sg, 1, bits)"))
    val a = e.select($"vec_id".as("a_id"), $"label", $"cell", $"embedding".as("va"))
    val b = e.select($"vec_id".as("b_id"), $"label", $"cell", $"embedding".as("vb"))
    a.join(b, Seq("label", "cell")).filter($"a_id" < $"b_id")
  }

  val qDedupEmbeddingSql: String =
    """WITH bl AS (SELECT label, greatest(0, least(16,
      |    CAST(ceil(log2(count(*) / 64.0)) AS INT))) AS bits
      |  FROM embeddings GROUP BY label),
      |e AS (SELECT vec_id, e0.label, embedding,
      |  substr(array_to_string(list_transform(embedding[1:16],
      |    x -> CASE WHEN x > 0 THEN '1' ELSE '0' END), ''), 1, bits) AS cell
      |  FROM embeddings e0 JOIN bl USING (label)),
      |p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.embedding ea, b.embedding eb
      |  FROM e a JOIN e b ON a.label = b.label AND a.cell = b.cell
      |  AND a.vec_id < b.vec_id),
      |u AS (SELECT a_id, b_id, unnest(ea) AS ax, unnest(eb) AS bx FROM p),
      |c AS (SELECT a_id, b_id, sum(ax::DOUBLE * bx::DOUBLE) AS dot,
      |        sum(ax::DOUBLE * ax::DOUBLE) AS na, sum(bx::DOUBLE * bx::DOUBLE) AS nb
      |      FROM u GROUP BY 1, 2)
      |SELECT a_id, b_id, round(dot / sqrt(na * nb), 4) AS cos FROM c
      |WHERE dot / sqrt(na * nb) >= 0.4 ORDER BY a_id, b_id""".stripMargin

  /** Fuzzy identifier join: all name pairs within edit distance 1 via
    * FastSS deletion-neighborhood blocking. Each name emits itself plus
    * its length single-character deletions; dist<=1 pairs MUST share a
    * variant, so a variant equi-join yields a candidate set linear in
    * names x length that a codegen'd levenshtein pass then verifies.
    * The variant string never shuffles: the join key is its xxhash64
    * (8 bytes vs a full name-length string — a hash collision can only
    * ADD candidates, which the levenshtein verify removes), and both
    * join sides are the same exchange, so Spark reuses one shuffle.
    * The oracle brute-forces the O(n^2) comparison — tractable only at
    * oracle scale, which is exactly the point: the blocked join is the
    * same answer with an equi-shuffle instead of a cross product. */
  def qFuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val names = T.customer(spark, dir).select($"c_name".as("name")).distinct()
    val dels = expr(
      "transform(sequence(1, length(name)), i -> concat(substring(name, 1, i - 1), substring(name, i + 1)))")
    val vars = names
      .select($"name", explode(array_union(array($"name"), dels)).as("v"))
      .select($"name", xxhash64($"v").as("h"))
    vars.select($"name".as("name_a"), $"h")
      .join(vars.select($"name".as("name_b"), $"h"), Seq("h"))
      .filter($"name_a" < $"name_b")
      // verify BEFORE dedup: the bounded O(n) editWithin1 kernel runs
      // map-side on the raw candidate stream (measured ~2% duplicate
      // rate), so the distinct shuffles only true pairs — 4x fewer
      // rows than deduping the candidate set first, and each verify is
      // a two-pointer scan, not levenshtein's O(n*m) DP
      .filter(graft.functions.F.editWithin1($"name_a", $"name_b"))
      .select($"name_a", $"name_b").distinct()
      .orderBy($"name_a", $"name_b")
      .limit(100)
  }

  val qFuzzyJoinSql: String =
    """SELECT a.c_name AS name_a, b.c_name AS name_b
      |FROM customer a JOIN customer b ON a.c_name < b.c_name
      |WHERE levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY name_a, name_b LIMIT 100""".stripMargin

  /** Exact duplicated-PASSAGE detection — the substring-dedup shape of
    * Lee et al. 2022 ("Deduplicating Training Data Makes Language
    * Models Better"), re-expressed without a suffix array: every
    * 8-token window (with its position) hashes to a 16-hex gram key;
    * windows whose gram occurs in ≥ 2 distinct documents are "shared";
    * per doc, shared positions ≤ 8 apart merge into maximal islands
    * (gap ≤ W ⇒ contiguous token coverage, so an island's duplicated
    * token count is exactly last−first+W — no double counting from
    * overlapping windows). The plan: one corpus scan + window explode,
    * one hash aggregate on the gram key (distinct-doc df), a semi-join
    * back, then doc-keyed windows — every shuffle is keyed on gram or
    * doc_id, nothing is quadratic, which is why this survives where
    * the paper's in-memory suffix array cannot. Spans, not just flags:
    * the output says HOW MUCH of each doc is duplicated text and the
    * longest run, the signal passage-level dedup cuts on. */
  def qDupPassages(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val W = 8
    val parts = (0 until W).map(k => expr(s"element_at(w, pos + $k)"))
    // keep per-window POSITION (unlike gramRows): islands need it
    val grams = T.documentsSpread(spark, dir)
      .select($"doc_id", split($"text", " ").as("w"))
      .select($"doc_id", size($"w").as("n_tok"), $"w", explode(expr(
        s"CASE WHEN size(w) >= $W THEN sequence(1, size(w) - ${W - 1}) ELSE array() END")).as("pos"))
      .select($"doc_id", $"n_tok", $"pos",
        substring(md5(concat_ws(" ", parts: _*).cast("binary")), 1, 16).as("g"))
      .cache()
    val shared = grams.groupBy($"g")
      .agg(countDistinct($"doc_id").as("df")).filter($"df" > 1).select($"g")
    val hits = grams.join(shared, Seq("g"), "left_semi")
    val wDoc = Window.partitionBy($"doc_id").orderBy($"pos")
    val islands = hits
      .withColumn("brk",
        when(lag($"pos", 1).over(wDoc).isNull ||
          $"pos" - lag($"pos", 1).over(wDoc) > W, 1).otherwise(0))
      .withColumn("isl", sum($"brk").over(
        wDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"doc_id", $"isl")
      .agg(max($"n_tok").as("n_tok"),
        (max($"pos") - min($"pos") + W).cast("long").as("span"))
    islands.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum($"span").as("dup_tokens"),
        max($"span").as("max_span"),
        round(sum($"span").cast("double") / max($"n_tok"), 4).as("dup_ratio"))
      .orderBy(desc("dup_tokens"), asc("doc_id"))
      .limit(100)
  }

  val qDupPassagesSql: String =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id, len(w) AS n_tok,
      |  unnest(list_transform(range(1, len(w) - 6), i ->
      |    {'pos': i, 'g': substr(md5(w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7]), 1, 16)}), recursive := true)
      |  FROM tok WHERE len(w) >= 8),
      |m AS (SELECT s.doc_id, s.n_tok, s.pos FROM sh s
      |      WHERE s.g IN (SELECT g FROM sh GROUP BY g HAVING count(DISTINCT doc_id) > 1)),
      |fl AS (SELECT doc_id, n_tok, pos,
      |  CASE WHEN lag(pos) OVER w IS NULL OR pos - lag(pos) OVER w > 8 THEN 1 ELSE 0 END AS brk
      |  FROM m WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |isl AS (SELECT doc_id, n_tok, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isl FROM fl),
      |sp AS (SELECT doc_id, max(n_tok) AS n_tok, isl, max(pos) - min(pos) + 8 AS span FROM isl GROUP BY doc_id, isl)
      |SELECT doc_id, count(*) AS n_spans, CAST(sum(span) AS BIGINT) AS dup_tokens,
      |  CAST(max(span) AS BIGINT) AS max_span,
      |  round(sum(span)::DOUBLE / max(n_tok), 4) AS dup_ratio
      |FROM sp GROUP BY doc_id ORDER BY dup_tokens DESC, doc_id LIMIT 100""".stripMargin

  /** Corpus duplication health report, RefinedWeb-style: per SOURCE,
    * what fraction of 8-token windows also occurs in another document
    * (the "duplicate text ratio" a curation pipeline tracks per crawl
    * before deciding how hard to dedup). Same positioned-window-hash
    * machinery as [[qDupPassages]], different rollup: window-level
    * coverage per doc, then per-source micro (window-weighted) and
    * macro (doc-averaged) rates plus the share of docs that are >20%
    * duplicated. One corpus scan builds the cached gram relation; the
    * df aggregate and the semi-join are keyed on the gram hash —
    * everything shuffles by gram or doc_id, nothing pairwise. */
  def qDupNgramCoverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val W = 8
    val parts = (0 until W).map(k => expr(s"element_at(w, pos + $k)"))
    val grams = T.documents(spark, dir)
      .select($"doc_id", split($"text", " ").as("w"))
      .select($"doc_id", explode(expr(
        s"CASE WHEN size(w) >= $W THEN sequence(1, size(w) - ${W - 1}) ELSE array() END")).as("pos"),
        $"w")
      .select($"doc_id", $"pos",
        substring(md5(concat_ws(" ", parts: _*).cast("binary")), 1, 16).as("g"))
      .cache()
    val shared = grams.groupBy($"g")
      .agg(countDistinct($"doc_id").as("df")).filter($"df" > 1).select($"g")
    val dupPerDoc = grams.join(shared, Seq("g"), "left_semi")
      .groupBy($"doc_id").agg(count(lit(1)).as("dup_w"))
    val perDoc = grams.groupBy($"doc_id").agg(count(lit(1)).as("n_w"))
      .join(dupPerDoc, Seq("doc_id"), "left")
      .withColumn("dup_w", coalesce($"dup_w", lit(0L)))
      .withColumn("frac", $"dup_w".cast("double") / $"n_w")
    perDoc
      .join(T.documents(spark, dir).select($"doc_id", $"source"), Seq("doc_id"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_w").as("n_windows"),
        sum($"dup_w").as("dup_windows"),
        round(sum($"dup_w").cast("double") / sum($"n_w"), 4).as("micro_dup"),
        round(avg($"frac"), 4).as("macro_dup"),
        round(avg(when($"frac" > 0.2, 1.0).otherwise(0.0)), 4).as("share_gt20"))
      .orderBy($"source")
  }

  val qDupNgramCoverageSql: String =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id,
      |  unnest(list_transform(range(1, len(w) - 6), i ->
      |    {'pos': i, 'g': substr(md5(w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7]), 1, 16)}), recursive := true)
      |  FROM tok WHERE len(w) >= 8),
      |dup AS (SELECT doc_id, count(*)::BIGINT AS dup_w FROM sh
      |  WHERE g IN (SELECT g FROM sh GROUP BY g HAVING count(DISTINCT doc_id) > 1)
      |  GROUP BY doc_id),
      |per AS (SELECT s.doc_id, count(*)::BIGINT AS n_w,
      |    coalesce(any_value(dup.dup_w), 0)::BIGINT AS dup_w
      |  FROM sh s LEFT JOIN dup ON dup.doc_id = s.doc_id
      |  GROUP BY s.doc_id),
      |j AS (SELECT d.source, per.n_w, per.dup_w,
      |    per.dup_w::DOUBLE / per.n_w AS frac
      |  FROM per JOIN documents d ON d.doc_id = per.doc_id)
      |SELECT source, count(*)::BIGINT AS n_docs,
      |  sum(n_w)::BIGINT AS n_windows, sum(dup_w)::BIGINT AS dup_windows,
      |  round(sum(dup_w)::DOUBLE / sum(n_w), 4) AS micro_dup,
      |  round(avg(frac), 4) AS macro_dup,
      |  round(avg(CASE WHEN frac > 0.2 THEN 1.0 ELSE 0.0 END), 4) AS share_gt20
      |FROM j GROUP BY source ORDER BY source""".stripMargin

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * algorithm): positioned 4-token-gram hashes, and from every window
    * of 4 consecutive grams keep the minimum hash (rightmost wins
    * ties) — guaranteeing any shared run of >= 7 tokens leaves at
    * least one common fingerprint while storing only ~1/4 of the
    * grams. The tie rule is encoded in the comparison key itself
    * (hash || reversed-position), so selection is a plain string `min`
    * over a per-doc ROWS window — deterministic on both engines, no
    * argmin ambiguity. Reported per source: distinct fingerprints,
    * how many also occur in another source (the cross-source overlap
    * a plagiarism/contamination sweep flags), and mean fingerprint
    * density. Per-doc windows + hash-keyed aggregates only — at 100 TB
    * the fingerprint index is the ~n/4-row relation this query builds,
    * never an all-pairs comparison. */
  def qWinnowing(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val K = 4; val W = 4
    val parts = (0 until K).map(k => expr(s"element_at(w, pos + $k)"))
    val grams = T.documents(spark, dir)
      .select($"doc_id", $"source", split($"text", " ").as("w"))
      .select($"doc_id", $"source", $"w", size($"w").as("n_w"), explode(expr(
        s"CASE WHEN size(w) >= $K THEN sequence(1, size(w) - ${K - 1}) ELSE array() END")).as("pos"))
      .select($"doc_id", $"source", ($"n_w" - lit(K - 1)).as("n_g"), $"pos",
        substring(md5(concat_ws(" ", parts: _*).cast("binary")), 1, 16).as("g"))
    val wSel = Window.partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(Window.currentRow, W - 1)
    val sel = grams
      .withColumn("key",
        concat($"g", lit("#"), lpad((lit(1000000000L) - $"pos").cast("string"), 10, "0")))
      .withColumn("selkey", min($"key").over(wSel))
      .filter($"pos" <= $"n_g" - lit(W - 1))
      .select($"doc_id", $"source", $"n_g", substring($"selkey", 1, 16).as("fp"))
    val docFps = sel.groupBy($"doc_id", $"source")
      .agg(max($"n_g").as("n_g"), countDistinct($"fp").as("n_fp")).cache()
    val srcFps = sel.select($"source", $"fp").distinct().cache()
    val spread = srcFps.groupBy($"fp")
      .agg(countDistinct($"source").as("n_src"))
    val shared = srcFps.join(spread, Seq("fp"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_fp_distinct"),
        sum(when($"n_src" > 1, 1L).otherwise(0L)).as("n_shared"))
    docFps.groupBy($"source")
      .agg(round(avg($"n_fp".cast("double") / $"n_g"), 4).as("avg_density"))
      .join(shared, Seq("source"))
      .select($"source", $"n_fp_distinct", $"n_shared",
        round($"n_shared".cast("double") / $"n_fp_distinct", 4).as("shared_ratio"),
        $"avg_density")
      .orderBy($"source")
  }

  val qWinnowingSql: String =
    """WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
      |g AS MATERIALIZED (SELECT doc_id, source, len(w) - 3 AS n_g,
      |    unnest(list_transform(range(1, len(w) - 2), i ->
      |      {'pos': i, 'gh': substr(md5(w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]), 1, 16)}), recursive := true)
      |  FROM tok WHERE len(w) >= 4),
      |k AS (SELECT doc_id, source, n_g, pos,
      |    gh || '#' || lpad((1000000000 - pos)::VARCHAR, 10, '0') AS key FROM g),
      |s AS MATERIALIZED (SELECT doc_id, source, n_g,
      |    substr(min(key) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING), 1, 16) AS fp,
      |    pos
      |  FROM k),
      |sel AS MATERIALIZED (SELECT doc_id, source, n_g, fp FROM s WHERE pos <= n_g - 3),
      |docfp AS (SELECT doc_id, source, max(n_g) AS n_g,
      |    count(DISTINCT fp)::BIGINT AS n_fp FROM sel GROUP BY 1, 2),
      |srcfp AS MATERIALIZED (SELECT DISTINCT source, fp FROM sel),
      |spread AS (SELECT fp, count(DISTINCT source) AS n_src FROM srcfp GROUP BY 1),
      |shared AS (SELECT source, count(*)::BIGINT AS n_fp_distinct,
      |    sum(CASE WHEN n_src > 1 THEN 1 ELSE 0 END)::BIGINT AS n_shared
      |  FROM srcfp JOIN spread USING (fp) GROUP BY 1),
      |dens AS (SELECT source, round(avg(n_fp::DOUBLE / n_g), 4) AS avg_density
      |  FROM docfp GROUP BY 1)
      |SELECT source, n_fp_distinct, n_shared,
      |  round(n_shared::DOUBLE / n_fp_distinct, 4) AS shared_ratio, avg_density
      |FROM dens JOIN shared USING (source) ORDER BY source""".stripMargin

  /** Sentence-level duplication profile (the CCNet/RefinedWeb line-dedup
    * signal): split every document into sentences, hash each, count
    * corpus-wide occurrences, and report per source how much of its
    * text is boilerplate — sentences that appear elsewhere in the
    * corpus. The whole pipeline is explode + two hash aggregates keyed
    * on the sentence hash: candidate discovery is exact-match
    * bucketing, never pairwise, so it runs at corpus scale (this IS
    * the first pass CCNet runs over Common Crawl). */
  def qLineDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // raw loader: the ~10-sentences-per-doc explode is below the
    // density where the spread pays (measured 0.43 -> 0.64 s spread)
    val sents = T.documents(spark, dir)
      .select($"doc_id", $"source", explode(split($"text", "\\. ")).as("s0"))
      .select($"doc_id", $"source", trim($"s0").as("s"))
      .filter(length($"s") > 0)
      .select($"doc_id", $"source", md5($"s").as("h"))
    val freq = sents.groupBy($"h").agg(count(lit(1)).as("cf"))
    val perDoc = sents.join(freq, Seq("h"))
      .groupBy($"doc_id", $"source")
      .agg(count(lit(1)).as("n_sent"),
        sum(when($"cf" > 1, 1L).otherwise(0L)).as("n_dup"))
    perDoc.groupBy($"source")
      .agg(sum($"n_sent").as("n_sents"),
        sum($"n_dup").as("n_dup_sents"),
        round(sum($"n_dup").cast("double") / sum($"n_sent"), 4).as("dup_ratio"),
        sum(when($"n_dup" > 0, 1L).otherwise(0L)).as("docs_with_dup"))
      .orderBy($"source")
  }

  val qLineDedupSql: String =
    """WITH sent AS MATERIALIZED (
      |  SELECT doc_id, source, md5(trim(s)) AS h
      |  FROM (SELECT doc_id, source, unnest(string_split(text, '. ')) AS s
      |        FROM documents)
      |  WHERE len(trim(s)) > 0),
      |freq AS (SELECT h, count(*)::BIGINT AS cf FROM sent GROUP BY 1),
      |perdoc AS (SELECT doc_id, source, count(*)::BIGINT AS n_sent,
      |    sum(CASE WHEN cf > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup
      |  FROM sent JOIN freq USING (h) GROUP BY 1, 2)
      |SELECT source, sum(n_sent)::BIGINT AS n_sents,
      |  sum(n_dup)::BIGINT AS n_dup_sents,
      |  round(sum(n_dup)::DOUBLE / sum(n_sent), 4) AS dup_ratio,
      |  sum(CASE WHEN n_dup > 0 THEN 1 ELSE 0 END)::BIGINT AS docs_with_dup
      |FROM perdoc GROUP BY source ORDER BY source""".stripMargin

  /** Probe bound of the serving-cost ground truth: the exact-Jaccard
    * pass anchors on the docs with id < this bound, so its cost is
    * |probes| x corpus (one inverted-index join), never corpus^2 —
    * the same probe-bounded discipline as the similarity family's
    * q_sim_serving_cost. Fixed, not corpus-proportional: at 100 TB
    * the ground-truth pass still costs one bounded sample. */
  private val ServingProbeDocs = 64L

  /** Dedup SERVING-COST table (round-15 verdict task 7) — the
    * capacity readout a 100 TB dedup run sizes before launch: for
    * each candidate-generation strategy the family ships, ONE row
    * with the full-corpus candidate volume (the shuffle/verify bill)
    * and precision/recall against a single exact-Jaccard ground
    * truth (3-gram Jaccard >= 0.8, the minhash family's contract) on
    * the probe-anchored pair sample. All four strategy rows derive
    * from ONE ckpt'd tagged candidate relation; the exact pass runs
    * ONCE (probe docs x corpus through the shingle inverted index).
    *
    * Strategies measured (candidate GENERATION only — production
    * exact-verifies candidates regardless, so generation is where
    * the strategies differ):
    *  - a_minhash_4x4: the production 16-component/4x4 band buckets
    *    ([[docBands]]).
    *  - b_simhash_band8: the 32-bit SimHash banded 4x8
    *    ([[qDedupSimhashPairs]]'s pre-verify join).
    *  - c_ngram_prefix: the AllPairs prefix-filter join
    *    ([[Linkage.setSimParts]], 4-gram shingles, t = 0.5).
    *  - d_embed_sign16: embedding-cosine blocking on the sign
    *    pattern of a 16-dim hashed-TF document vector. MEASURED
    *    DECISION: the fixture's `embeddings` table is synthetic
    *    noise uncorrelated with document text (cos ~ 0.0 on every
    *    true 3-gram near-dup pair at sf0.01) — blocking on it would
    *    measure the fixture, not the strategy, so the embedding
    *    route is exercised on text-derived vectors (the hashing
    *    trick: dim = h mod 16, sign = parity of h div 16, summed
    *    over token occurrences), which is also the cheap first
    *    stage a real pipeline runs before paying for model
    *    embeddings. */
  def qDedupServingCost(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the shingle relation feeds BOTH the minhash strategy (via
    // docBands' identical plan — Spark's plan-keyed cache substitutes
    // it) and the exact-Jaccard pass; registering the cache BEFORE the
    // strategy build lets the first materialization fill it for the
    // second instead of each paying the explode+md5 pipeline
    val shx = shingleRows(spark, dir, 3).cache()
    // ---- the ONE tagged candidate relation (full corpus) ----
    val bandsDf = docBands(spark, dir)
    val mh = bandsDf.select($"doc_id".as("a_id"), $"b", $"bandsig")
      .join(bandsDf.select($"doc_id".as("b_id"), $"b", $"bandsig"), Seq("b", "bandsig"))
      .filter($"a_id" < $"b_id").select($"a_id", $"b_id").distinct()
      .withColumn("strategy", lit("a_minhash_4x4"))
    val simBands = simhashes(spark, dir).select($"doc_id",
      posexplode(expr(
        "transform(sequence(0, 3), b -> substring(simhash, b * 8 + 1, 8))")).as(Seq("b", "key")))
    val sim = simBands.select($"doc_id".as("a_id"), $"b", $"key")
      .join(simBands.select($"doc_id".as("b_id"), $"b", $"key"), Seq("b", "key"))
      .filter($"a_id" < $"b_id").select($"a_id", $"b_id").distinct()
      .withColumn("strategy", lit("b_simhash_band8"))
    val pf = Linkage.setSimParts(spark, dir)._2
      .select($"da".as("a_id"), $"db".as("b_id"))
      .withColumn("strategy", lit("c_ngram_prefix"))
    val tfh = T.documentsSpread(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("t"))
      .filter(length($"t") > 0)
      .withColumn("h", expr("cast(conv(substring(md5(t), 1, 8), 16, 10) AS bigint)"))
    val dims = tfh.groupBy($"doc_id", ($"h" % 16).as("k"))
      .agg(sum(when(expr("(h div 16) % 2") === 0, 1L).otherwise(-1L)).as("s"))
    val evec = dims.groupBy($"doc_id")
      .agg(map_from_entries(collect_list(struct($"k", $"s"))).as("m"))
      .withColumn("bucket", expr(
        """array_join(transform(sequence(0, 15), k ->
          |  IF(coalesce(element_at(m, cast(k AS bigint)), cast(0 AS bigint)) > 0,
          |     '1', '0')), '')""".stripMargin))
    val em = evec.select($"doc_id".as("a_id"), $"bucket")
      .join(evec.select($"doc_id".as("b_id"), $"bucket"), Seq("bucket"))
      .filter($"a_id" < $"b_id").select($"a_id", $"b_id").distinct()
      .withColumn("strategy", lit("d_embed_sign16"))
    // ---- the ONE probe-anchored exact-Jaccard pass ----
    val sizes = shx.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = shx.filter($"doc_id" < ServingProbeDocs)
      .select($"doc_id".as("a_id"), $"sh")
      .join(shx.select($"doc_id".as("b_id"), $"sh"), Seq("sh"))
      .filter($"a_id" < $"b_id")
      .groupBy($"a_id", $"b_id").agg(count(lit(1)).as("ninter"))
    // the candidate union and the exact pass are independent once the
    // shingle cache exists — overlap their materializations (§2.6)
    val Seq(allc, truth) = inParallel(
      () => mh.unionByName(sim).unionByName(pf).unionByName(em)
        .select($"strategy", $"a_id", $"b_id").ckpt(),
      () => inter
        .join(sizes.select($"doc_id".as("a_id"), $"n".as("na")), Seq("a_id"))
        .join(sizes.select($"doc_id".as("b_id"), $"n".as("nb")), Seq("b_id"))
        .filter($"ninter" / ($"na" + $"nb" - $"ninter") >= 0.8)
        .select($"a_id", $"b_id").ckpt())
    // ---- per-strategy capacity x quality rows ----
    val counts = allc.groupBy($"strategy").agg(count(lit(1)).as("n_candidates"))
    val pslice = allc.filter($"a_id" < ServingProbeDocs)
    val pc = pslice.groupBy($"strategy").agg(count(lit(1)).as("n_cand_probe"))
    val hits = pslice.join(truth, Seq("a_id", "b_id"), "left_semi")
      .groupBy($"strategy").agg(count(lit(1)).as("n_hits"))
    val nTrue = truth.agg(count(lit(1)).as("n_true"))
    counts
      .join(pc, Seq("strategy"), "left")
      .join(hits, Seq("strategy"), "left")
      .crossJoin(broadcast(nTrue))
      .select($"strategy", $"n_candidates",
        coalesce($"n_cand_probe", lit(0L)).as("n_cand_probe"),
        coalesce($"n_hits", lit(0L)).as("n_hits"),
        $"n_true",
        round(coalesce($"n_hits", lit(0L)) /
          when(coalesce($"n_cand_probe", lit(0L)) =!= 0, $"n_cand_probe"), 4)
          .as("probe_precision"),
        round(coalesce($"n_hits", lit(0L)) / $"n_true", 4).as("probe_recall"))
      .orderBy($"strategy")
  }

  val qDedupServingCostSql: String =
    s"""$minhashCte,
       |mh_c AS (SELECT 'a_minhash_4x4' AS strategy, a_id, b_id FROM cand),
       |tw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |th AS (SELECT doc_id, md5(t) AS hh FROM tw),
       |tbits AS (SELECT doc_id, b,
       |  CASE WHEN ((strpos('0123456789abcdef', substr(hh, (b//4)+1, 1)) - 1) >> (b % 4)) & 1 = 1
       |       THEN 1 ELSE -1 END AS v
       |  FROM th, range(0, 32) r(b)),
       |tacc AS (SELECT doc_id, b, sum(v) AS s FROM tbits GROUP BY 1, 2),
       |tsh AS (SELECT doc_id,
       |  string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS simhash
       |  FROM tacc GROUP BY doc_id),
       |tbands AS (SELECT doc_id, b, substr(simhash, b*8+1, 8) AS key
       |  FROM tsh, range(0, 4) r(b)),
       |sh_c AS (SELECT DISTINCT 'b_simhash_band8' AS strategy,
       |    a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM tbands a JOIN tbands b ON a.b = b.b AND a.key = b.key
       |  WHERE a.doc_id < b.doc_id),
       |pw AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
       |ptok AS (SELECT DISTINCT doc_id,
       |    unnest(list_transform(range(1, len(ws) - 2), i ->
       |      ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3])) AS t
       |  FROM pw WHERE len(ws) >= 4),
       |psz AS (SELECT doc_id, count(*) AS l FROM ptok GROUP BY doc_id),
       |pfreq AS (SELECT t, count(*) AS df FROM ptok GROUP BY t),
       |ppref AS (SELECT doc_id, t FROM (
       |    SELECT ptok.doc_id, ptok.t,
       |      row_number() OVER (PARTITION BY ptok.doc_id ORDER BY pfreq.df, ptok.t) AS pos,
       |      psz.l
       |    FROM ptok JOIN pfreq USING (t) JOIN psz USING (doc_id))
       |  WHERE pos <= l - ceil(l * 0.5) + 1),
       |pf_c AS (SELECT DISTINCT 'c_ngram_prefix' AS strategy,
       |    a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM ppref a JOIN ppref b ON a.t = b.t WHERE a.doc_id < b.doc_id),
       |ew AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |eh AS (SELECT doc_id, (list_sum(list_transform(range(1, 9),
       |     i -> (strpos('0123456789abcdef', substr(md5(t), i, 1)) - 1) * pow(16.0, 8 - i)))::BIGINT) AS h
       |  FROM ew WHERE len(t) > 0),
       |edim AS (SELECT doc_id, h % 16 AS k,
       |    sum(CASE WHEN (h // 16) % 2 = 0 THEN 1 ELSE -1 END) AS s
       |  FROM eh GROUP BY 1, 2),
       |evec AS (SELECT d.doc_id,
       |    string_agg(CASE WHEN coalesce(e.s, 0) > 0 THEN '1' ELSE '0' END, '' ORDER BY r.k) AS bucket
       |  FROM (SELECT DISTINCT doc_id FROM documents) d CROSS JOIN range(0, 16) r(k)
       |  LEFT JOIN edim e ON e.doc_id = d.doc_id AND e.k = r.k
       |  GROUP BY d.doc_id),
       |em_c AS (SELECT DISTINCT 'd_embed_sign16' AS strategy,
       |    a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM evec a JOIN evec b ON a.bucket = b.bucket WHERE a.doc_id < b.doc_id),
       |allc AS MATERIALIZED (SELECT * FROM mh_c UNION ALL SELECT * FROM sh_c
       |  UNION ALL SELECT * FROM pf_c UNION ALL SELECT * FROM em_c),
       |ti AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM shx a JOIN shx b ON a.s = b.s AND a.doc_id < b.doc_id
       |  WHERE a.doc_id < $ServingProbeDocs GROUP BY 1, 2),
       |truth AS MATERIALIZED (SELECT i.a_id, i.b_id FROM ti i
       |  JOIN sh sa ON sa.doc_id = i.a_id JOIN sh sb ON sb.doc_id = i.b_id
       |  WHERE len(list_intersect(sa.shs, sb.shs))::DOUBLE /
       |        (len(sa.shs) + len(sb.shs) - len(list_intersect(sa.shs, sb.shs))) >= 0.8),
       |counts AS (SELECT strategy, count(*)::BIGINT AS n_candidates FROM allc GROUP BY 1),
       |pslice AS (SELECT strategy, a_id, b_id FROM allc WHERE a_id < $ServingProbeDocs),
       |pc2 AS (SELECT strategy, count(*)::BIGINT AS n_cand_probe FROM pslice GROUP BY 1),
       |hits AS (SELECT p.strategy, count(*)::BIGINT AS n_hits
       |  FROM pslice p JOIN truth USING (a_id, b_id) GROUP BY 1),
       |nt AS (SELECT count(*)::BIGINT AS n_true FROM truth)
       |SELECT c.strategy, c.n_candidates,
       |  coalesce(pc2.n_cand_probe, 0)::BIGINT AS n_cand_probe,
       |  coalesce(hits.n_hits, 0)::BIGINT AS n_hits, nt.n_true,
       |  round(coalesce(hits.n_hits, 0)::DOUBLE / nullif(coalesce(pc2.n_cand_probe, 0), 0), 4)
       |    AS probe_precision,
       |  round(coalesce(hits.n_hits, 0)::DOUBLE / nt.n_true, 4) AS probe_recall
       |FROM counts c LEFT JOIN pc2 USING (strategy) LEFT JOIN hits USING (strategy)
       |CROSS JOIN nt
       |ORDER BY c.strategy""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_winnowing", qWinnowing, Some(qWinnowingSql)),
    QueryDef("q_line_dedup", qLineDedup, Some(qLineDedupSql)),
    QueryDef("q_dup_ngram_coverage", qDupNgramCoverage, Some(qDupNgramCoverageSql)),
    QueryDef("q_dup_passages", qDupPassages, Some(qDupPassagesSql)),
    QueryDef("q_fuzzy_join", qFuzzyJoin, Some(qFuzzyJoinSql)),
    QueryDef("q_dedup_exact", qDedupExact, Some(qDedupExactSql)),
    QueryDef("q_dedup_minhash", qDedupMinhash, Some(qDedupMinhashSql)),
    QueryDef("q_dedup_survivors", qDedupSurvivors, Some(qDedupSurvivorsSql)),
    QueryDef("q_dedup_clusters", qDedupClusters, Some(qDedupClustersSql)),
    QueryDef("q_dedup_simhash", qDedupSimhash, Some(qDedupSimhashSql)),
    QueryDef("q_dedup_simhash_pairs", qDedupSimhashPairs, Some(qDedupSimhashPairsSql)),
    QueryDef("q_dedup_ngram_jaccard", qDedupNgramJaccard, Some(qDedupNgramJaccardSql)),
    QueryDef("q_dedup_containment", qDedupContainment, Some(qDedupContainmentSql)),
    QueryDef("q_dedup_minhash_sigs", qDedupMinhashSigs, Some(qDedupMinhashSigsSql)),
    QueryDef("q_minhash_est_audit", qMinhashEstAudit, Some(qMinhashEstAuditSql)),
    QueryDef("q_lsh_band_sweep", qLshBandSweep, Some(qLshBandSweepSql)),
    QueryDef("q_dedup_incremental", qDedupIncremental, Some(qDedupIncrementalSql)),
    QueryDef("q_clean_corpus", qCleanCorpus, Some(qCleanCorpusSql)),
    QueryDef("q_dedup_embedding", qDedupEmbedding, Some(qDedupEmbeddingSql)),
    QueryDef("q_dedup_serving_cost", qDedupServingCost, Some(qDedupServingCostSql)),
  )
}
