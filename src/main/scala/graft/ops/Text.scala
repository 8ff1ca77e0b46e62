package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operator family for LLM-data pipelines (north-star
  * scope, SURVEY.md §2 Tier B): token statistics, token/n-gram
  * frequency, quality scoring, language-ID heuristic, document
  * fingerprinting.
  *
  * Everything is built from codegen'd higher-order functions
  * (`split` / `transform` / `filter` / `aggregate`) over the token
  * array — no UDFs, no explode-multiplication in the per-doc queries,
  * so the hot path stays inside whole-stage codegen and scales linearly
  * in corpus size. Frequency queries explode once and hash-aggregate
  * (map-side partial combine keeps the shuffle at |vocab| not |tokens|).
  */
object Text extends QueryFamily {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")
  private def stopArr = array(stopwords.map(lit): _*)
  private val stopListSql = stopwords.map(s => s"'$s'").mkString("[", ", ", "]")

  /** Per-document token statistics: counts, distincts, type-token ratio,
    * average word length. */
  def qTokenStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.documents(spark, dir)
      .withColumn("w", split($"text", " "))
      .select(
        $"doc_id",
        size($"w").as("n_tokens"),
        size(array_distinct($"w")).as("n_distinct"),
        round(size(array_distinct($"w")).cast("double") / size($"w"), 4).as("ttr"),
        round((length($"text") - size($"w") + 1).cast("double") / size($"w"), 4).as("avg_wlen"))
      .orderBy($"doc_id")
  }

  val qTokenStatsSql: String =
    """SELECT doc_id, len(w) AS n_tokens, len(list_distinct(w)) AS n_distinct,
      | round(len(list_distinct(w))::DOUBLE / len(w), 4) AS ttr,
      | round((length(text) - len(w) + 1)::DOUBLE / len(w), 4) AS avg_wlen
      |FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Corpus token frequency: top 20 tokens (count desc, token asc). */
  def qTokenFreq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.documents(spark, dir)
      .select(explode(split($"text", " ")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token"))
      .limit(20)
  }

  val qTokenFreqSql: String =
    """SELECT token, count(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin

  /** Word-bigram frequency: top 20 (count desc, bigram asc). Bigrams are
    * built inside the array (transform over positions) then exploded
    * once — no self-join. */
  def qBigramTop(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.documents(spark, dir)
      .withColumn("w", split($"text", " "))
      .withColumn("bg", expr(
        "transform(slice(w, 1, size(w) - 1), (x, i) -> concat(x, ' ', element_at(w, i + 2)))"))
      .select(explode($"bg").as("bigram"))
      .groupBy($"bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("bigram"))
      .limit(20)
  }

  val qBigramTopSql: String =
    """SELECT bigram, count(*) AS n
      |FROM (
      |  SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram
      |  FROM (SELECT string_split(text, ' ') AS w FROM documents))
      |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin

  /** Corpus histogram per language x source. */
  def qLangStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.documents(spark, dir)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        round(avg($"n_chars"), 4).as("avg_chars"))
      .orderBy($"lang", $"source")
  }

  val qLangStatsSql: String =
    """SELECT lang, source, count(*) AS n_docs,
      | CAST(sum(n_chars) AS BIGINT) AS sum_chars, round(avg(n_chars), 4) AS avg_chars
      |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin

  /** Heuristic quality score per document: length saturation x
    * (1 - stopword ratio). The building blocks (token count, stopword
    * ratio, length clamp) are the standard web-corpus quality signals. */
  def qQualityScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.documents(spark, dir)
      .withColumn("w", split($"text", " "))
      .withColumn("n_stop",
        size(filter($"w", x => array_contains(stopArr, x))))
      .select(
        $"doc_id",
        size($"w").as("n_tokens"),
        $"n_stop",
        round($"n_stop".cast("double") / size($"w"), 4).as("stop_ratio"),
        round(least(lit(1.0), size($"w") / lit(100.0)) *
          (lit(1.0) - $"n_stop".cast("double") / size($"w")), 4).as("quality"))
      .orderBy($"doc_id")
  }

  val qQualityScoreSql: String =
    s"""SELECT doc_id, len(w) AS n_tokens, n_stop,
       | round(n_stop::DOUBLE / len(w), 4) AS stop_ratio,
       | round(least(1.0, len(w) / 100.0) * (1.0 - n_stop::DOUBLE / len(w)), 4) AS quality
       |FROM (
       |  SELECT doc_id, w, len(list_filter(w, x -> list_contains($stopListSql, x))) AS n_stop
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
       |ORDER BY doc_id""".stripMargin

  /** Language-ID heuristic: stopword-profile hit ratios with a
    * deterministic arg-max. (A real corpus would use char n-gram
    * profiles; the fixture vocabulary only carries English function
    * words, so profiles beyond `en` exist to exercise the arg-max.) */
  def qLangId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val enArr = array(Seq("the", "a", "of", "and").map(lit): _*)
    val deArr = array(Seq("der", "die", "das", "und").map(lit): _*)
    val frArr = array(Seq("le", "la", "et", "les").map(lit): _*)
    T.documents(spark, dir)
      .withColumn("w", split($"text", " "))
      .withColumn("en_score", round(size(filter($"w", x => array_contains(enArr, x))).cast("double") / size($"w"), 4))
      .withColumn("de_score", round(size(filter($"w", x => array_contains(deArr, x))).cast("double") / size($"w"), 4))
      .withColumn("fr_score", round(size(filter($"w", x => array_contains(frArr, x))).cast("double") / size($"w"), 4))
      .withColumn("pred_lang",
        when($"en_score" >= $"de_score" && $"en_score" >= $"fr_score" && $"en_score" > 0.02, lit("en"))
          .when($"de_score" >= $"fr_score" && $"de_score" > 0.02, lit("de"))
          .when($"fr_score" > 0.02, lit("fr"))
          .otherwise(lit("unk")))
      .select($"doc_id", $"en_score", $"de_score", $"fr_score", $"pred_lang", $"lang".as("true_lang"))
      .orderBy($"doc_id")
  }

  val qLangIdSql: String =
    """SELECT doc_id, en_score, de_score, fr_score,
      | CASE WHEN en_score >= de_score AND en_score >= fr_score AND en_score > 0.02 THEN 'en'
      |      WHEN de_score >= fr_score AND de_score > 0.02 THEN 'de'
      |      WHEN fr_score > 0.02 THEN 'fr'
      |      ELSE 'unk' END AS pred_lang,
      | lang AS true_lang
      |FROM (
      |  SELECT doc_id, lang,
      |   round(len(list_filter(w, x -> list_contains(['the','a','of','and'], x)))::DOUBLE / len(w), 4) AS en_score,
      |   round(len(list_filter(w, x -> list_contains(['der','die','das','und'], x)))::DOUBLE / len(w), 4) AS de_score,
      |   round(len(list_filter(w, x -> list_contains(['le','la','et','les'], x)))::DOUBLE / len(w), 4) AS fr_score
      |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents))
      |ORDER BY doc_id""".stripMargin

  /** Confusion matrix of the [[qLangId]] stopword heuristic against
    * the corpus's labeled `lang` column — the eval a pipeline owner
    * reads before trusting a cheap classifier to route 100 TB: one
    * (true, predicted) cell count per pair plus the row-normalized
    * share (per-true-language recall on the diagonal). The matrix is
    * |langs| x |preds| cells from ONE hash aggregate over the scored
    * scan; the row-share window runs on those bounded cells, never on
    * documents. */
  def qLangIdConfusion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = qLangId(spark, dir)
      .groupBy($"true_lang", $"pred_lang")
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"true_lang")
    cells
      .withColumn("row_share", round($"n".cast("double") / sum($"n").over(w), 4))
      .select($"true_lang", $"pred_lang", $"n", $"row_share")
      .orderBy($"true_lang", $"pred_lang")
  }

  val qLangIdConfusionSql: String =
    s"""WITH p AS ($qLangIdSql),
       |c AS (SELECT true_lang, pred_lang, count(*) AS n FROM p GROUP BY 1, 2)
       |SELECT true_lang, pred_lang, n,
       |  round(n::DOUBLE / sum(n) OVER (PARTITION BY true_lang), 4) AS row_share
       |FROM c ORDER BY true_lang, pred_lang""".stripMargin

  /** Content-defined document fingerprint: full-content hash plus a
    * coarse prefix bucket; per-source distinct-fingerprint counts give
    * the corpus-level duplication profile. */
  def qFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.documents(spark, dir)
      .withColumn("fp", md5($"text".cast("binary")))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"fp").as("n_unique"),
        countDistinct(substring($"fp", 1, 4)).as("n_buckets"))
      .orderBy($"source")
  }

  val qFingerprintSql: String =
    """SELECT source, count(*) AS n_docs,
      | count(DISTINCT md5(text)) AS n_unique,
      | count(DISTINCT substr(md5(text), 1, 4)) AS n_buckets
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Deterministic content-hash sampling: keep documents whose md5 falls
    * in the first quarter of hash space (a reproducible ~25% sample,
    * stable across engines, runs and cluster layouts — the property
    * that makes training-data subsets auditable). */
  def qSampleHash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.documents(spark, dir)
      .filter(substring(md5($"text".cast("binary")), 1, 1).isin("0", "1", "2", "3"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_sampled"), sum($"n_chars").as("sum_chars"))
      .orderBy($"lang")
  }

  val qSampleHashSql: String =
    """SELECT lang, count(*) AS n_sampled, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents
      |WHERE substr(md5(text), 1, 1) IN ('0', '1', '2', '3')
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Stratified deterministic sampling: per-language rates (en 12.5%,
    * others 50%) enforced by comparing the first md5 nibble against a
    * per-stratum threshold — reproducible downsampling of dominant
    * strata, the rebalancing move in corpus construction. */
  def qSampleStratified(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nib = expr(
      "locate(substring(md5(cast(text AS binary)), 1, 1), '0123456789abcdef') - 1")
    T.documents(spark, dir)
      .withColumn("nib", nib)
      .filter(($"lang" === "en" && $"nib" < 2) || ($"lang" =!= "en" && $"nib" < 8))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy($"lang")
  }

  val qSampleStratifiedSql: String =
    """SELECT lang, count(*) AS n_sampled
      |FROM (SELECT lang,
      |        strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 AS nib
      |      FROM documents)
      |WHERE (lang = 'en' AND nib < 2) OR (lang <> 'en' AND nib < 8)
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** TF-IDF: top-3 terms per document (docs < 50) by tf * ln(N/df).
    * Term and document frequencies are two hash aggregates over ONE
    * cached exploded token stream; the corpus size N is computed
    * in-plan (1-row aggregate, broadcast-NL cross join) instead of a
    * separate driver action. The tf⋈df join is left to AQE: at 100×
    * corpus the vocabulary side outgrows a safe driver broadcast, and
    * AQE still broadcasts it while it's small. */
  def qTfidf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = T.documents(spark, dir)
    val nDf = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val tokens = docs.select($"doc_id", explode(split($"text", " ")).as("t")).cache()
    val tf = tokens.groupBy($"doc_id", $"t").agg(count(lit(1)).as("tf"))
    val df = tokens.select($"doc_id", $"t").distinct()
      .groupBy($"t").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"doc_id").orderBy(desc("tfidf"), asc("t"))
    tf.join(df, Seq("t"))
      .crossJoin(broadcast(nDf))
      .withColumn("tfidf", $"tf" * log($"n_docs" / $"df"))
      .filter($"doc_id" < 50)
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"doc_id", $"rank", $"t".as("term"), round($"tfidf", 4).as("tfidf"))
      .orderBy($"doc_id", $"rank")
  }

  val qTfidfSql: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY doc_id, t),
      |df AS (SELECT t, count(*) AS df FROM (SELECT DISTINCT doc_id, t FROM tok) GROUP BY t),
      |n AS (SELECT count(*)::DOUBLE AS n FROM documents),
      |scored AS (SELECT doc_id, t, tf * ln(n.n / df.df) AS tfidf
      |  FROM tf JOIN df USING (t) CROSS JOIN n WHERE doc_id < 50),
      |ranked AS (SELECT doc_id, t, tfidf,
      |  row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, t) AS rank
      |  FROM scored)
      |SELECT doc_id, rank, t AS term, round(tfidf, 4) AS tfidf
      |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  /** Shannon entropy of the token distribution per source — a corpus
    * diversity signal (low entropy = templated/boilerplate text). */
  def qTokenEntropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // tf feeds both the totals and the entropy join — cache it; totals
    // is |sources| rows (~3), so broadcast it rather than shuffling the
    // whole tf relation onto 3 reducer keys
    val tokens = T.documents(spark, dir)
      .select($"source", explode(split($"text", " ")).as("t"))
    val tf = tokens.groupBy($"source", $"t").agg(count(lit(1)).as("n")).cache()
    val totals = tf.groupBy($"source").agg(sum($"n").as("total"))
    tf.join(broadcast(totals), Seq("source"))
      .withColumn("p", $"n".cast("double") / $"total")
      .groupBy($"source")
      .agg(round(-sum($"p" * log($"p")), 4).as("entropy"),
        countDistinct($"t").as("vocab"))
      .orderBy($"source")
  }

  val qTokenEntropySql: String =
    """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS t FROM documents),
      |tf AS (SELECT source, t, count(*) AS n FROM tok GROUP BY source, t),
      |tot AS (SELECT source, sum(n) AS total FROM tf GROUP BY source)
      |SELECT source,
      | round(-sum((n::DOUBLE / total) * ln(n::DOUBLE / total)), 4) AS entropy,
      | count(DISTINCT t) AS vocab
      |FROM tf JOIN tot USING (source)
      |GROUP BY source ORDER BY source""".stripMargin

  /** TF-IDF-weighted sparse cosine similarity join over 3-gram shingle
    * terms — the weighted complement to the Jaccard dedup family: rare
    * shared phrasing counts for more than boilerplate. Candidates come
    * only from the df-pruned inverted index (terms in > maxDf docs are
    * dropped: near-zero idf signal AND unbounded join degree — the cap
    * is what keeps the self-join linear in corpus size), dot products
    * aggregate per candidate pair, norms join in at |docs| scale. */
  def qTfidfSim(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = 3
    val maxDf = 50
    val parts = (0 until n).map(k => expr(s"element_at(w, i + $k)"))
    val sh = T.documents(spark, dir)
      .select($"doc_id", split($"text", " ").as("w"))
      .select($"doc_id", $"w", explode(expr(
        s"CASE WHEN size(w) >= $n THEN sequence(1, size(w) - ${n - 1}) ELSE array() END")).as("i"))
      .select($"doc_id", concat_ws(" ", parts: _*).as("g"))
    val tf = sh.groupBy($"doc_id", $"g").agg(count(lit(1)).as("tf"))
    val nDocs = T.documents(spark, dir).agg(count(lit(1)).cast("double").as("n_docs"))
    val dfG = tf.groupBy($"g").agg(count(lit(1)).as("df"))
    val w = tf.join(dfG.filter($"df" <= maxDf), "g")
      .crossJoin(broadcast(nDocs))
      .select($"g", $"doc_id", ($"tf" * log($"n_docs" / $"df")).as("wt"))
      .cache()
    val norms = w.groupBy($"doc_id").agg(sqrt(sum($"wt" * $"wt")).as("nrm"))
    val a = w.select($"g", $"doc_id".as("a_id"), $"wt".as("wa"))
    val b = w.select($"g", $"doc_id".as("b_id"), $"wt".as("wb"))
    a.join(b, "g").filter($"a_id" < $"b_id")
      .groupBy($"a_id", $"b_id").agg(sum($"wa" * $"wb").as("dot"))
      .join(norms.select($"doc_id".as("a_id"), $"nrm".as("na")), "a_id")
      .join(norms.select($"doc_id".as("b_id"), $"nrm".as("nb")), "b_id")
      .select($"a_id", $"b_id", round($"dot" / ($"na" * $"nb"), 4).as("cos"))
      .filter($"cos" >= 0.5)
      .orderBy($"a_id", $"b_id")
  }

  val qTfidfSimSql: String =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1), i ->
      |    w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
      |  FROM tok WHERE len(w) >= 3),
      |tf AS (SELECT doc_id, g, count(*) AS tf FROM sh GROUP BY doc_id, g),
      |nd AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
      |dfg AS (SELECT g, count(*) AS df FROM tf GROUP BY g HAVING count(*) <= 50),
      |w AS (SELECT tf.g, tf.doc_id, tf.tf * ln((SELECT n_docs FROM nd) / df) AS wt
      |      FROM tf JOIN dfg ON dfg.g = tf.g),
      |norms AS (SELECT doc_id, sqrt(sum(wt * wt)) AS nrm FROM w GROUP BY doc_id),
      |dots AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, sum(a.wt * b.wt) AS dot
      |  FROM w a JOIN w b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT a_id, b_id, round(dot / (na.nrm * nb.nrm), 4) AS cos
      |FROM dots JOIN norms na ON na.doc_id = a_id
      |          JOIN norms nb ON nb.doc_id = b_id
      |WHERE round(dot / (na.nrm * nb.nrm), 4) >= 0.5
      |ORDER BY a_id, b_id""".stripMargin

  /** Perplexity-proxy quality gate: per-document bigram cross-entropy
    * against the corpus's own bigram LM with Laplace smoothing —
    * P(w2|w1) = (c(w1 w2)+1)/(c(w1)+V). The LM-score filter of a
    * curation pipeline, computed exactly in-engine: the LM "tables"
    * are two aggregates over the corpus (|vocab^2| and |vocab| rows),
    * each doc bigram does two equi-key lookups against them, and the
    * per-doc score is one aggregation — every join is a key lookup
    * with degree 1, so the whole pass is linear in corpus tokens. */
  def qPerplexity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = T.documents(spark, dir)
      .select($"doc_id", split($"text", " ").as("w"))
    val big = toks
      .select($"doc_id", explode(expr(
        "CASE WHEN size(w) >= 2 THEN sequence(1, size(w) - 1) ELSE array() END")).as("i"), $"w")
      .select($"doc_id", expr("element_at(w, i)").as("w1"),
        expr("element_at(w, i + 1)").as("w2"))
      .cache()
    val c12 = big.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    val c1 = big.groupBy($"w1").agg(count(lit(1)).as("c1"))
    val v = big.select($"w1").union(big.select($"w2")).distinct()
      .agg(count(lit(1)).cast("double").as("v"))
    big.join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .select($"doc_id",
        log(($"c12" + lit(1.0)) / ($"c1" + $"v")).as("lp"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(-sum($"lp") / count(lit(1)), 4).as("cross_entropy"))
      .orderBy($"doc_id")
  }

  val qPerplexitySql: String =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |big AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      |  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM tok WHERE len(w) >= 2)),
      |c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1),
      |v AS (SELECT count(*)::DOUBLE AS v FROM
      |  (SELECT DISTINCT t FROM (SELECT w1 AS t FROM big UNION SELECT w2 FROM big))),
      |lp AS (SELECT b.doc_id, ln((c12.c12 + 1.0) / (c1.c1 + (SELECT v FROM v))) AS lp
      |  FROM big b JOIN c12 ON c12.w1 = b.w1 AND c12.w2 = b.w2
      |             JOIN c1 ON c1.w1 = b.w1)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  round(-sum(lp) / count(*), 4) AS cross_entropy
      |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** BM25 keyword retrieval (k1=1.2, b=0.75) for a fixed 3-term query
    * — the ranking function behind classic search and a standard
    * quality-retrieval gate in corpus curation. Shapes that scale:
    * per-(doc, term) tf is one token-stream aggregate filtered to the
    * query terms BEFORE the shuffle; df and avgdl are 1-row/3-row
    * aggregates broadcast back; the final top-20 is a
    * TakeOrderedAndProject, never a global sort. Ranking ties are cut
    * on the 4-dp rounded score so the oracle ranks identically. */
  def qBm25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val terms = Seq("spark", "window", "hash")
    val k1 = 1.2; val b = 0.75
    val docs = T.documents(spark, dir)
    val tokens = docs.select($"doc_id", explode(split($"text", " ")).as("t"))
    val dl = docs.select($"doc_id", size(split($"text", " ")).cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg($"dl").as("avgdl"))
    val tf = tokens.filter($"t".isin(terms: _*))
      .groupBy($"doc_id", $"t").agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy($"t").agg(count(lit(1)).cast("double").as("df"))
    // dl is corpus-sized (a row per doc) — never broadcast it; the
    // doc_id equi-join shards evenly and AQE may flip it to broadcast
    // only when the term-filtered tf side is genuinely small
    val contrib = tf
      .join(broadcast(df), Seq("t"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(($"n_docs" - $"df" + 0.5) / ($"df" + 0.5) + 1.0))
      .withColumn("c", $"idf" * ($"tf" * (k1 + 1)) /
        ($"tf" + lit(k1) * (lit(1 - b) + lit(b) * $"dl" / $"avgdl")))
    contrib.groupBy($"doc_id")
      .agg(round(sum($"c"), 4).as("score"), count(lit(1)).as("n_terms"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(20)
  }

  val qBm25Sql: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      |dl AS (SELECT doc_id, len(string_split(text, ' '))::DOUBLE AS dl FROM documents),
      |stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
      |tf AS (SELECT doc_id, t, count(*)::DOUBLE AS tf FROM tok
      |  WHERE t IN ('spark', 'window', 'hash') GROUP BY doc_id, t),
      |df AS (SELECT t, count(*)::DOUBLE AS df FROM tf GROUP BY t),
      |c AS (SELECT tf.doc_id,
      |    ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) *
      |    (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) AS c
      |  FROM tf JOIN df USING (t) JOIN dl ON dl.doc_id = tf.doc_id, stats s)
      |SELECT doc_id, round(sum(c), 4) AS score, count(*) AS n_terms
      |FROM c GROUP BY doc_id
      |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  /** Zipf's-law fit over the corpus vocabulary: regress log(freq) on
    * log(rank) with the built-in `regr_slope`/`regr_r2` aggregates.
    * The ranking runs over the VOCABULARY (already aggregated), but at
    * web scale distinct tokens reach 1e8-1e9, so a partitionless
    * `row_number()` window would still funnel the whole vocab through
    * one task. `Skew.globalRowNumber` distributes it: range-partition
    * on (freq DESC, t) — a total order, t is unique — rank locally,
    * add broadcast prefix-sum offsets. Same ranks, same oracle. */
  def qZipfFit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vocab = T.documents(spark, dir)
      .select(explode(split($"text", " ")).as("t"))
      .groupBy($"t").agg(count(lit(1)).cast("double").as("freq"))
    Skew.globalRowNumber(vocab, Seq(desc("freq"), asc("t")),
        rankName = "irank")
      .withColumn("rank", $"irank".cast("double"))
      .agg(
        count(lit(1)).as("n_vocab"),
        round(expr("regr_slope(ln(freq), ln(rank))"), 4).as("zipf_slope"),
        round(expr("regr_r2(ln(freq), ln(rank))"), 4).as("r2"))
  }

  val qZipfFitSql: String =
    """WITH vocab AS (SELECT t, count(*)::DOUBLE AS freq
      |  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
      |  GROUP BY t),
      |ranked AS (SELECT freq,
      |  row_number() OVER (ORDER BY freq DESC, t)::DOUBLE AS rank FROM vocab)
      |SELECT count(*) AS n_vocab,
      | round(regr_slope(ln(freq), ln(rank)), 4) AS zipf_slope,
      | round(regr_r2(ln(freq), ln(rank)), 4) AS r2
      |FROM ranked""".stripMargin

  /** Per-source distribution drift: KL(source ‖ corpus) over unigram
    * distributions. The corpus-total is a 1-row broadcast; everything
    * else is hash aggregates and a vocabulary-keyed equi-join — the
    * domain-shift monitor a training-data pipeline runs per ingest
    * batch. All inputs are integer counts, so the per-term doubles are
    * engine-identical before the final rounded sum. The corpus is
    * tokenized ONCE: the (source, token) counts are cached
    * (vocabulary × |sources|-bounded) and the corpus-wide token
    * distribution rolls up from them by summing over sources — the
    * q_heavy_hitters partials pattern, not a second explode of the
    * corpus (round-6 verdict, What's wrong #3). */
  def qSourceDivergence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = T.documents(spark, dir)
      .select($"source", explode(split($"text", " ")).as("tok"))
    val src = toks.groupBy($"source", $"tok").agg(count(lit(1)).as("c"))
      .cache()
    val srcTot = src.groupBy($"source").agg(sum($"c").as("n"))
    val corp = src.groupBy($"tok").agg(sum($"c").as("cc"))
    val corpTot = corp.agg(sum($"cc").as("nn"))
    val p = $"c".cast("double") / $"n"
    val q = $"cc".cast("double") / $"nn"
    src.join(srcTot, Seq("source"))
      .join(corp, Seq("tok"))
      .crossJoin(broadcast(corpTot))
      .groupBy($"source")
      .agg(round(sum(p * log(p / q)), 4).as("kl_div"))
      .orderBy($"source")
  }

  val qSourceDivergenceSql: String =
    """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |src AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY 1, 2),
      |srctot AS (SELECT source, sum(c) AS n FROM src GROUP BY 1),
      |corp AS (SELECT tok, count(*) AS cc FROM toks GROUP BY 1),
      |corptot AS (SELECT sum(cc) AS nn FROM corp)
      |SELECT source,
      |  round(sum((c::DOUBLE / n) * ln((c::DOUBLE / n) / (cc::DOUBLE / nn))), 4) AS kl_div
      |FROM src JOIN srctot USING (source) JOIN corp USING (tok), corptot
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Subword-style token counting with a GPT-2-ish pre-tokenizer
    * regex (` ?letters | ?digits | ?punct-run | whitespace-run`) next
    * to the plain whitespace count — the "fertility" audit (chars per
    * token) an LLM-data pipeline runs before committing a tokenizer
    * budget. Pure map-side projection: `regexp_extract_all` + a
    * higher-order `filter`, no shuffle at any scale. The pattern uses
    * only syntax Java regex (Spark) and RE2 (DuckDB) match
    * identically: no lookaround, leftmost-first alternation. */
  def qTokenBpe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.documents(spark, dir)
      .select($"doc_id", $"n_chars",
        size(split($"text", " ")).cast("long").as("n_ws"),
        expr("size(filter(regexp_extract_all(text, ' ?\\\\p{L}+| ?\\\\p{N}+| ?[^\\\\s\\\\p{L}\\\\p{N}]+|\\\\s+', 0), x -> x NOT RLIKE '^\\\\s+$'))")
          .cast("long").as("n_bpe"))
      .select($"doc_id", $"n_ws", $"n_bpe",
        round($"n_chars" / $"n_bpe", 4).as("chars_per_token"))
      .orderBy($"doc_id")
  }

  val qTokenBpeSql: String =
    """SELECT doc_id, n_ws, n_bpe,
      |  round(n_chars / n_bpe, 4) AS chars_per_token
      |FROM (
      |  SELECT doc_id, n_chars,
      |    len(string_split(text, ' '))::BIGINT AS n_ws,
      |    len(list_filter(
      |      regexp_extract_all(text, ' ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'),
      |      x -> NOT regexp_matches(x, '^\s+$')))::BIGINT AS n_bpe
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Two merge steps of BPE tokenizer TRAINING — the inner loop that
    * builds a subword vocabulary, run on DataFrames. Each step counts
    * adjacent-symbol pairs over the word-frequency table (weighted by
    * word count), picks the most frequent pair (ties → lexicographic,
    * so both engines agree), and applies the merge to every word's
    * symbol sequence. The distributed shape: the working set is the
    * DISTINCT-WORD table (vocabulary-sized — at 100 TB of text ~10⁷
    * rows, never the corpus), `localCheckpoint`ed once; each round is
    * ONE hash aggregate over (pair → weighted count) plus a 1-row
    * argmax to the driver — exactly the merge-table broadcast a real
    * BPE trainer does per rule. Symbol sequences are space-joined
    * strings and the merge is a literal `replace` of " a b " with
    * " ab " — leftmost non-overlapping in both engines, i.e. the BPE
    * greedy application order. */
  def qBpeMerges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wc = T.documents(spark, dir)
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      .withColumn("seq", concat(lit(" "), regexp_replace($"w", "(.)", "$1 ")))
      .select($"cnt", $"seq")
      .ckpt()
    def topPair(seqs: DataFrame): (String, String, Long) = {
      val r = seqs.select($"cnt", split(trim($"seq"), " ").as("s"))
        .filter(size($"s") >= 2)
        .select($"cnt", explode(expr(
          "transform(sequence(1, size(s) - 1), i -> struct(element_at(s, i) AS a, element_at(s, i + 1) AS b))")).as("p"))
        .groupBy($"p.a", $"p.b").agg(sum($"cnt").as("c"))
        .orderBy(desc("c"), asc("a"), asc("b"))
        .head()
      (r.getString(0), r.getString(1), r.getLong(2))
    }
    val (a1, b1, c1) = topPair(wc)
    // Column literals, not SQL-string interpolation: a corpus token
    // containing a quote or backslash must reach `replace` as data,
    // never as expression syntax (round-6 ADVICE)
    val merged1 = wc.withColumn("seq",
      replace($"seq", lit(s" $a1 $b1 "), lit(s" $a1$b1 ")))
    val (a2, b2, c2) = topPair(merged1)
    Seq((1, a1, b1, a1 + b1, c1), (2, a2, b2, a2 + b2, c2))
      .toDF("step", "lft", "rgt", "merged", "wcount")
  }

  val qBpeMergesSql: String =
    """WITH wc AS (SELECT w, count(*) AS cnt
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE len(w) > 0 GROUP BY w),
      |s0 AS (SELECT ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS seq, cnt
      |  FROM wc),
      |p1 AS (SELECT s[i] AS a, s[i + 1] AS b, sum(cnt) AS c
      |  FROM (SELECT cnt, s, unnest(range(1, len(s))) AS i
      |        FROM (SELECT cnt, string_split(trim(seq), ' ') AS s FROM s0)
      |        WHERE len(s) >= 2)
      |  GROUP BY 1, 2),
      |t1 AS (SELECT a, b, c FROM p1 ORDER BY c DESC, a, b LIMIT 1),
      |s1 AS (SELECT replace(seq, ' ' || t1.a || ' ' || t1.b || ' ',
      |                      ' ' || t1.a || t1.b || ' ') AS seq, cnt
      |  FROM s0, t1),
      |p2 AS (SELECT s[i] AS a, s[i + 1] AS b, sum(cnt) AS c
      |  FROM (SELECT cnt, s, unnest(range(1, len(s))) AS i
      |        FROM (SELECT cnt, string_split(trim(seq), ' ') AS s FROM s1)
      |        WHERE len(s) >= 2)
      |  GROUP BY 1, 2),
      |t2 AS (SELECT a, b, c FROM p2 ORDER BY c DESC, a, b LIMIT 1)
      |SELECT 1 AS step, a AS lft, b AS rgt, a || b AS merged,
      |  c::BIGINT AS wcount FROM t1
      |UNION ALL
      |SELECT 2, a, b, a || b, c::BIGINT FROM t2
      |ORDER BY step""".stripMargin

  /** BPE training composed to depth 8 (round-14 verdict task 6 — the
    * composition proof [[qBpeMerges]] stops short of, matching the
    * unigram family's EM-2 standard): eight merge rounds folded over
    * the distinct-word table, each round ONE vocabulary-bounded pair-
    * count hash aggregate plus a 1-row argmax collected to the driver
    * and broadcast back as the merge rule (the q_pagerank lineage
    * discipline: per-round ckpt so eight rounds never stack lineage).
    * Emits the full merge table with the corpus fertility
    * (symbols/word occurrence) after EACH round — the trajectory a
    * tokenizer-budget decision reads (fertility falls monotonically;
    * where it plateaus is where training stops paying). Scale shape:
    * every round's relation is the DISTINCT-WORD table (~10⁷ rows at
    * 100 TB of text, never the corpus), so depth-k training costs k
    * vocabulary-sized aggregates after the single corpus tokenize.
    * Oracle unrolls the identical eight rounds; DedupTextSpec replays
    * the fold on the driver. */
  def qBpeTrain8(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    var wc = T.documents(spark, dir)
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      .withColumn("seq", concat(lit(" "), regexp_replace($"w", "(.)", "$1 ")))
      .select($"cnt", $"seq")
      .ckpt()
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long, Double)]()
    for (step <- 1 to 8) {
      val top = wc.select($"cnt", split(trim($"seq"), " ").as("s"))
        .filter(size($"s") >= 2)
        .select($"cnt", explode(expr(
          "transform(sequence(1, size(s) - 1), i -> struct(element_at(s, i) AS a, element_at(s, i + 1) AS b))")).as("p"))
        .groupBy($"p.a", $"p.b").agg(sum($"cnt").as("c"))
        .orderBy(desc("c"), asc("a"), asc("b"))
        .head()
      val (a, b, c) = (top.getString(0), top.getString(1), top.getLong(2))
      // literal replace (never SQL interpolation): corpus tokens with
      // quotes/backslashes stay data — the round-6 advice rule
      wc = wc.withColumn("seq",
        replace($"seq", lit(s" $a $b "), lit(s" $a$b "))).ckpt()
      val fert = wc
        .select(round(sum($"cnt" * size(split(trim($"seq"), " "))).cast("double")
          / sum($"cnt"), 4).as("f"))
        .head().getDouble(0)
      out += ((step, a, b, a + b, c, fert))
    }
    out.toSeq.toDF("step", "lft", "rgt", "merged", "wcount", "fertility")
      .orderBy($"step")
  }

  val qBpeTrain8Sql: String = {
    def roundCtes(i: Int): String =
      s"""p$i AS (SELECT s[j] AS a, s[j + 1] AS b, sum(cnt) AS c
         |  FROM (SELECT cnt, s, unnest(range(1, len(s))) AS j
         |        FROM (SELECT cnt, string_split(trim(seq), ' ') AS s FROM s${i - 1})
         |        WHERE len(s) >= 2)
         |  GROUP BY 1, 2),
         |t$i AS (SELECT a, b, c FROM p$i ORDER BY c DESC, a, b LIMIT 1),
         |s$i AS MATERIALIZED (SELECT replace(seq, ' ' || t$i.a || ' ' || t$i.b || ' ',
         |                      ' ' || t$i.a || t$i.b || ' ') AS seq, cnt
         |  FROM s${i - 1}, t$i),
         |f$i AS (SELECT round(sum(cnt * len(string_split(trim(seq), ' ')))::DOUBLE
         |    / sum(cnt), 4) AS fert FROM s$i)""".stripMargin
    def row(i: Int): String =
      s"""SELECT $i AS step, a AS lft, b AS rgt, a || b AS merged,
         |  c::BIGINT AS wcount, (SELECT fert FROM f$i) AS fertility FROM t$i
         |""".stripMargin
    s"""WITH wc AS (SELECT w, count(*) AS cnt
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0 GROUP BY w),
       |s0 AS MATERIALIZED (SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS seq, cnt
       |  FROM wc),
       |${(1 to 8).map(roundCtes).mkString(",\n")}
       |${(1 to 8).map(row).mkString("UNION ALL\n")}ORDER BY step""".stripMargin
  }

  /** Version stamp for the stored BPE merge table; bumping invalidates
    * sidecars built by older code (same discipline as
    * [[materializeUniVocab]]). */
  private val BpeMergesVersion = 1

  /** Stored depth-8 BPE merge table of a fixture: (step, lft, rgt,
    * merged) from [[qBpeTrain8]]. */
  def bpeMergesSidecarPath(dir: String): String =
    Fixtures.sidecarPath(dir, "bpemerges")

  private def bpeMergesFresh(path: String): Boolean =
    !sys.env.get("SPARK_GRAFT_REBUILD_INDEX").contains("1") &&
      new java.io.File(path, s"_GRAFT_BPEMERGES_V$BpeMergesVersion").isFile

  /** Build-once/serve-many for the TRAINED BPE tokenizer (round-15
    * verdict task 3, completing build→serve symmetry with the unigram
    * family): the depth-8 merge table materializes once per fixture
    * and every serve pass reads the STORED rules. The build is the
    * SAME code path as [[qBpeTrain8]] (integer pair counts, lexical
    * tie-break), so stored == retrain is exact equality
    * (DedupTextSpec pins it). SPARK_GRAFT_REBUILD_INDEX=1 forces a
    * rebuild. */
  def materializeBpeMerges(spark: SparkSession, dir: String): String = {
    val path = bpeMergesSidecarPath(dir)
    if (!bpeMergesFresh(path)) {
      qBpeTrain8(spark, dir).select("step", "lft", "rgt", "merged")
        .write.mode("overwrite").parquet(path)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(path, s"_GRAFT_BPEMERGES_V$BpeMergesVersion"), "")
    }
    path
  }

  def storedBpeMerges(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(materializeBpeMerges(spark, dir))

  /** Test hook: install an externally-trained merge table as `dir`'s
    * stored sidecar (see [[installUniVocab]] — the fertility-drift
    * path needs rules trained on a DIFFERENT corpus). */
  private[graft] def installBpeMerges(
      spark: SparkSession, merges: DataFrame, dir: String): String = {
    val path = bpeMergesSidecarPath(dir)
    merges.write.mode("overwrite").parquet(path)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, s"_GRAFT_BPEMERGES_V$BpeMergesVersion"), "")
    path
  }

  /** Encode the distinct-word table under the stored merge rules: the
    * 8-row merge table is collected (bounded — depth, not data) and
    * replayed as 8 chained literal `replace`s over the char-split
    * symbol sequence, exactly the training fold's application order
    * (leftmost non-overlapping). One projection, no shuffle: at
    * 100 TB the encode is merge-depth x distinct-words, never
    * corpus x rules. Merge strings travel as Column literals, never
    * SQL-string interpolation (round-6 advice: corpus tokens with
    * quotes/backslashes are data). */
  private def bpeEncode(spark: SparkSession, dir: String, words: DataFrame): DataFrame = {
    import spark.implicits._
    val merges = storedBpeMerges(spark, dir).orderBy($"step")
      .select($"lft", $"rgt").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val init = words.withColumn("seq",
      concat(lit(" "), regexp_replace($"w", "(.)", "$1 ")))
    merges.foldLeft(init) { case (df, (a, b)) =>
      df.withColumn("seq", replace($"seq", lit(s" $a $b "), lit(s" $a$b ")))
    }.withColumn("ps", split(trim($"seq"), " ")).drop("seq")
  }

  /** BPE SERVE pass — encode the whole corpus under the STORED depth-8
    * merge table (round-15 verdict task 3): one corpus scan reduces
    * text to (source, word, count), the stored rules replay once per
    * DISTINCT word ([[bpeEncode]]), and per source the pass reports
    * fertility (pieces/word — the tokenizer-budget number), the
    * piece-length mix (len-5+ closes the partition: l1..l4 + l5p =
    * n_pieces), and the untrained regex pre-tokenizer's tokens/word
    * ([[qTokenBpe]]) as the in-row baseline. The trained-unigram
    * baseline for the same sources lives in [[qUnigramApply]] keyed
    * identically — recomputing its Viterbi DP here would double-bill
    * the serve pass, so the comparison is a same-key read across the
    * two artifacts, not a recompute. Oracle replays the merges over
    * the SAME sidecar ({BPEMERGES} token) via a step-indexed
    * recursive CTE, so a green row proves the serve path against the
    * stored artifact, not a retrain. */
  def qBpeApply(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val srcWords = T.documents(spark, dir)
      .select($"source", explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"source", $"w").agg(count(lit(1)).as("c"))
      .ckpt()
    val words = srcWords.select($"w").distinct()
    val wstats = bpeEncode(spark, dir, words)
      .select($"w",
        size($"ps").cast("long").as("np"),
        expr("size(filter(ps, x -> length(x) = 1))").cast("long").as("l1"),
        expr("size(filter(ps, x -> length(x) = 2))").cast("long").as("l2"),
        expr("size(filter(ps, x -> length(x) = 3))").cast("long").as("l3"),
        expr("size(filter(ps, x -> length(x) = 4))").cast("long").as("l4"),
        expr("size(filter(ps, x -> length(x) >= 5))").cast("long").as("l5p"))
    val bySrc = srcWords.join(wstats, Seq("w"))
      .groupBy($"source")
      .agg(sum($"c").as("n_words"),
        sum($"c" * $"np").as("n_pieces"),
        sum($"c" * $"l1").as("pieces_len1"),
        sum($"c" * $"l2").as("pieces_len2"),
        sum($"c" * $"l3").as("pieces_len3"),
        sum($"c" * $"l4").as("pieces_len4"),
        sum($"c" * $"l5p").as("pieces_len5p"))
    val bpe = T.documents(spark, dir)
      .groupBy($"source")
      .agg(sum(expr(
          "size(filter(regexp_extract_all(text, ' ?\\\\p{L}+| ?\\\\p{N}+| ?[^\\\\s\\\\p{L}\\\\p{N}]+|\\\\s+', 0), x -> x NOT RLIKE '^\\\\s+$'))")
          .cast("long")).as("n_bpe"),
        sum(size(split($"text", " ")).cast("long")).as("n_ws"))
    bySrc.join(bpe, Seq("source"))
      .select($"source", $"n_words", $"n_pieces",
        round($"n_pieces" / $"n_words", 4).as("fertility"),
        $"pieces_len1", $"pieces_len2", $"pieces_len3", $"pieces_len4",
        $"pieces_len5p",
        round($"n_bpe" / $"n_ws", 4).as("bpe_tokens_per_word"))
      .orderBy($"source")
  }

  /** The step-indexed merge replay both oracle SQLs share: 8 recursive
    * iterations over the distinct-word relation, each applying the
    * next stored rule — the SQL twin of [[bpeEncode]]. */
  private def bpeEncodeSqlCtes(wordsCte: String): String =
    s"""m AS MATERIALIZED (SELECT step, lft, rgt
       |  FROM read_parquet('{BPEMERGES}/*.parquet')),
       |$wordsCte,
       |enc(w, step, seq) AS (
       |  SELECT w, 0::BIGINT, ' ' || regexp_replace(w, '(.)', '\\1 ', 'g')
       |  FROM words
       |  UNION ALL
       |  SELECT e.w, e.step + 1,
       |    replace(e.seq, ' ' || m.lft || ' ' || m.rgt || ' ',
       |            ' ' || m.lft || m.rgt || ' ')
       |  FROM enc e JOIN m ON m.step = e.step + 1
       |  WHERE e.step < 8),
       |done AS MATERIALIZED (SELECT w, string_split(trim(seq), ' ') AS ps
       |  FROM enc WHERE step = 8)""".stripMargin

  val qBpeApplySql: String =
    s"""WITH RECURSIVE
       |tok AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
       |srcw AS MATERIALIZED (SELECT source, w, count(*)::BIGINT AS c
       |  FROM tok WHERE len(w) > 0 GROUP BY 1, 2),
       |${bpeEncodeSqlCtes("words AS MATERIALIZED (SELECT DISTINCT w FROM srcw)")},
       |wstat AS (SELECT w,
       |    len(ps)::BIGINT AS np,
       |    len(list_filter(ps, x -> len(x) = 1))::BIGINT AS l1,
       |    len(list_filter(ps, x -> len(x) = 2))::BIGINT AS l2,
       |    len(list_filter(ps, x -> len(x) = 3))::BIGINT AS l3,
       |    len(list_filter(ps, x -> len(x) = 4))::BIGINT AS l4,
       |    len(list_filter(ps, x -> len(x) >= 5))::BIGINT AS l5p
       |  FROM done),
       |agg AS (SELECT srcw.source,
       |    CAST(sum(srcw.c) AS BIGINT) AS n_words,
       |    CAST(sum(srcw.c * wstat.np) AS BIGINT) AS n_pieces,
       |    CAST(sum(srcw.c * wstat.l1) AS BIGINT) AS pieces_len1,
       |    CAST(sum(srcw.c * wstat.l2) AS BIGINT) AS pieces_len2,
       |    CAST(sum(srcw.c * wstat.l3) AS BIGINT) AS pieces_len3,
       |    CAST(sum(srcw.c * wstat.l4) AS BIGINT) AS pieces_len4,
       |    CAST(sum(srcw.c * wstat.l5p) AS BIGINT) AS pieces_len5p
       |  FROM srcw JOIN wstat ON wstat.w = srcw.w
       |  GROUP BY 1),
       |bpe AS (SELECT source,
       |    sum(len(list_filter(
       |      regexp_extract_all(text, ' ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+'),
       |      x -> NOT regexp_matches(x, '^\\s+$$'))))::BIGINT AS n_bpe,
       |    sum(len(string_split(text, ' ')))::BIGINT AS n_ws
       |  FROM documents GROUP BY 1)
       |SELECT agg.source, n_words, n_pieces,
       |  round(n_pieces::DOUBLE / n_words, 4) AS fertility,
       |  pieces_len1, pieces_len2, pieces_len3, pieces_len4, pieces_len5p,
       |  round(bpe.n_bpe::DOUBLE / bpe.n_ws, 4) AS bpe_tokens_per_word
       |FROM agg JOIN bpe ON bpe.source = agg.source
       |ORDER BY agg.source""".stripMargin

  /** BPE STALENESS trigger — the retrain decision mirroring
    * [[qUnigramStale]] (round-15 verdict task 4): the pending shard
    * (last ~10% of doc ids) is encoded under the STORED merge table
    * and its fertility compared against the train-era slice under the
    * SAME rules. BPE has no OOV concept — an unseen character is just
    * a symbol no rule ever merges — so script/vocabulary drift
    * manifests AS fertility (and as the singleton-piece rate, reported
    * for both eras as the drift diagnostic). The gate is fertility
    * ratio > 1.1, a double derived purely from integer piece/word
    * tallies, so both engines compute it bit-identically. One corpus
    * scan splits word counts by era; the merge replay runs ONCE per
    * distinct word shared by both sides — at 100 TB the trigger costs
    * one tokenize plus depth x distinct-words, and only a true
    * trigger pays the retrain. */
  def qBpeStale(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = T.documents(spark, dir).select($"doc_id", $"text")
    val cut = docs.agg((max($"doc_id") - (count(lit(1)) / 10).cast("long")).as("cut0"))
    val words = docs.crossJoin(broadcast(cut))
      .select(($"doc_id" > $"cut0").as("is_new"),
        explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(
        sum(when($"is_new", 1L).otherwise(0L)).as("c_new"),
        sum(when(!$"is_new", 1L).otherwise(0L)).as("c_old"))
      .ckpt()
    val wstats = bpeEncode(spark, dir, words.select($"w"))
      .select($"w",
        size($"ps").cast("long").as("np"),
        expr("size(filter(ps, x -> length(x) = 1))").cast("long").as("l1"))
    words.join(wstats, Seq("w"))
      .agg(
        sum($"c_old").as("nwt"), sum($"c_old" * $"np").as("npt"),
        sum($"c_old" * $"l1").as("l1t"),
        sum($"c_new").as("nws"), sum($"c_new" * $"np").as("nps"),
        sum($"c_new" * $"l1").as("l1s"))
      .select(
        $"nwt".as("n_words_train"), $"nws".as("n_words_shard"),
        round($"npt" / $"nwt", 4).as("fertility_train"),
        round($"nps" / $"nws", 4).as("fertility_shard"),
        round($"l1t" / $"npt", 4).as("singleton_rate_train"),
        round($"l1s" / $"nps", 4).as("singleton_rate_shard"),
        round(($"nps" / $"nws") / ($"npt" / $"nwt"), 4).as("fertility_ratio"),
        (($"nps" / $"nws") / ($"npt" / $"nwt") > 1.1).as("retrain"))
  }

  val qBpeStaleSql: String =
    s"""WITH RECURSIVE
       |cut AS (SELECT max(doc_id) - (count(*) // 10) AS cut0 FROM documents),
       |tok AS (SELECT (doc_id > cut0) AS is_new,
       |    unnest(string_split(text, ' ')) AS w
       |  FROM documents, cut),
       |wordera AS MATERIALIZED (SELECT w,
       |    CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS c_new,
       |    CAST(sum(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT) AS c_old
       |  FROM tok WHERE len(w) > 0 GROUP BY w),
       |${bpeEncodeSqlCtes("words AS MATERIALIZED (SELECT w FROM wordera)")},
       |wstat AS (SELECT w, len(ps)::BIGINT AS np,
       |    len(list_filter(ps, x -> len(x) = 1))::BIGINT AS l1
       |  FROM done),
       |agg AS (SELECT
       |    CAST(sum(c_old) AS BIGINT) AS nwt,
       |    CAST(sum(c_old * np) AS BIGINT) AS npt,
       |    CAST(sum(c_old * l1) AS BIGINT) AS l1t,
       |    CAST(sum(c_new) AS BIGINT) AS nws,
       |    CAST(sum(c_new * np) AS BIGINT) AS nps,
       |    CAST(sum(c_new * l1) AS BIGINT) AS l1s
       |  FROM wordera JOIN wstat ON wstat.w = wordera.w)
       |SELECT nwt AS n_words_train, nws AS n_words_shard,
       |  round(npt::DOUBLE / nwt, 4) AS fertility_train,
       |  round(nps::DOUBLE / nws, 4) AS fertility_shard,
       |  round(l1t::DOUBLE / npt, 4) AS singleton_rate_train,
       |  round(l1s::DOUBLE / nps, 4) AS singleton_rate_shard,
       |  round((nps::DOUBLE / nws) / (npt::DOUBLE / nwt), 4) AS fertility_ratio,
       |  ((nps::DOUBLE / nws) / (npt::DOUBLE / nwt) > 1.1) AS retrain
       |FROM agg""".stripMargin

  /** Token-window document chunking with overlap — the context-window
    * prep every LLM training/RAG pipeline runs before embedding or
    * packing: window W=32 tokens, stride S=24 (8-token overlap so no
    * boundary sentence is lost). Chunk starts are generated INSIDE the
    * token array (`sequence` over 1 + ceil(max(n-W,0)/S) positions)
    * and posexploded once, so the operator itself is map-side only —
    * the only exchange in the plan is the presentation sort; output
    * rows ≈ |tokens|/S, and it scales linearly with the corpus at any
    * SF. The tail chunk is the one starting at the
    * last stride boundary (short if fewer than W tokens remain);
    * chunk_id is the 0-based window index. */
  def qChunkOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val W = 32
    val S = 24
    T.documents(spark, dir)
      .withColumn("w", split($"text", " "))
      .withColumn("starts", expr(
        s"sequence(1, 1 + ($S * cast(ceil(greatest(size(w) - $W, 0) / $S.0d) as int)), $S)"))
      .select($"doc_id", $"w", posexplode($"starts").as(Seq("chunk_id", "start")))
      .select(
        $"doc_id", $"chunk_id", $"start",
        size(slice($"w", $"start", lit(W))).as("n_tokens"),
        array_join(slice($"w", $"start", lit(W)), " ").as("chunk_text"))
      .orderBy($"doc_id", $"chunk_id")
  }

  val qChunkOverlapSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |c AS (SELECT doc_id, w, len(w) AS n,
      |        (1 + ceil(greatest(len(w) - 32, 0) / 24.0))::BIGINT AS k FROM d),
      |x AS (SELECT doc_id, w, n, unnest(range(1, k + 1)) AS gs FROM c)
      |SELECT doc_id, gs - 1 AS chunk_id, (gs - 1) * 24 + 1 AS start,
      |  least(n - (gs - 1) * 24, 32) AS n_tokens,
      |  array_to_string(w[(gs - 1) * 24 + 1 : least((gs - 1) * 24 + 32, n)], ' ')
      |    AS chunk_text
      |FROM x ORDER BY doc_id, chunk_id""".stripMargin

  /** Interpolated Kneser-Ney bigram probabilities (D = 0.75) for the
    * corpus's 20 most frequent bigrams — the smoothing every n-gram
    * LM trains with: discounted bigram evidence backed off to the
    * CONTINUATION unigram (how many distinct left-contexts a word
    * completes, not how often it occurs). One explode builds the
    * bigram relation; everything after is vocab-bounded — left-context
    * totals and distinct-follower counts from one hash aggregate on
    * w1, continuation counts from one on w2, and the distinct-bigram
    * normalizer is a 1-row broadcast. Shuffle rows are |distinct
    * bigrams|, never |tokens|, so the estimator holds at 100 TB. */
  def qKneserNey(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bi = T.documents(spark, dir)
      .withColumn("w", split($"text", " "))
      .withColumn("bg", expr(
        "transform(slice(w, 1, size(w) - 1), (x, i) -> struct(x AS w1, element_at(w, i + 2) AS w2))"))
      .select(explode($"bg").as("b"))
      .select($"b.w1", $"b.w2")
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("n"))
      .cache()
    val left = bi.groupBy($"w1").agg(
      sum($"n").as("c_w1"), count(lit(1)).as("n1p_left"))
    val cont = bi.groupBy($"w2").agg(count(lit(1)).as("n1p_right"))
    val tot = bi.agg(count(lit(1)).as("n_bigrams"))
    bi.join(left, "w1").join(cont, "w2").crossJoin(broadcast(tot))
      .select(
        concat($"w1", lit(" "), $"w2").as("bigram"), $"n",
        round(
          greatest($"n" - lit(0.75), lit(0.0)) / $"c_w1" +
            lit(0.75) * $"n1p_left" / $"c_w1" *
            ($"n1p_right" / $"n_bigrams"), 6).as("p_kn"))
      .orderBy(desc("n"), asc("bigram"))
      .limit(20)
  }

  val qKneserNeySql: String =
    """WITH u AS (
      |  SELECT w, unnest(range(1, len(w))) AS i
      |  FROM (SELECT string_split(text, ' ') AS w FROM documents)),
      |bi AS (SELECT w[i] AS w1, w[i + 1] AS w2, count(*) AS n
      |  FROM u GROUP BY 1, 2),
      |lft AS (SELECT w1, sum(n) AS c_w1, count(*) AS n1p_left FROM bi GROUP BY w1),
      |cont AS (SELECT w2, count(*) AS n1p_right FROM bi GROUP BY w2),
      |tot AS (SELECT count(*) AS n_bigrams FROM bi)
      |SELECT bi.w1 || ' ' || bi.w2 AS bigram, n,
      |  round(greatest(n - 0.75, 0.0) / c_w1
      |        + 0.75 * n1p_left / c_w1 * (n1p_right / n_bigrams), 6) AS p_kn
      |FROM bi JOIN lft USING (w1) JOIN cont USING (w2) CROSS JOIN tot
      |ORDER BY n DESC, bigram LIMIT 20""".stripMargin

  /** Two batch gradient-descent steps of a logistic-regression quality
    * classifier (label: source == 'src0'; features: intercept, token
    * count / 100, stopword ratio) — training a document filter model
    * IN the engine, the way production pipelines fit fastText-style
    * quality gates over corpus features. Each step is ONE hash
    * aggregate over the cached feature relation (the gradient is an
    * avg of per-row terms — map-side combinable, never a weight-sized
    * shuffle); the 3 scalar weights cross the driver as a 1-row fetch,
    * the BPE-merge precedent for iterative scalar state. Gradients are
    * stabilized to 6dp on BOTH engines (the q_kmeans_iterated rule) and
    * the learning rate is 1.0, so every weight stays exactly on the
    * 6dp grid and cross-engine agreement is boundary-free; losses are
    * reported at 4dp. Step 1 starts from w = 0 where sigmoid is
    * exactly 0.5 — no transcendental enters the first gradient. */
  def qLogregSteps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val feat = T.documents(spark, dir)
      .withColumn("w", split($"text", " "))
      .select(
        when($"source" === "src0", 1.0).otherwise(0.0).as("y"),
        (size($"w") / lit(100.0)).as("x1"),
        (size(filter($"w", x => array_contains(stopArr, x))).cast("double") /
          size($"w")).as("x2"))
      .cache()
    def g6(c: Column) = round(avg(c), 6) + lit(0.0)
    def p(b: Double, wl: Double, ws: Double): Column =
      lit(1.0) / (lit(1.0) +
        exp(-(lit(b) + lit(wl) * $"x1" + lit(ws) * $"x2")))
    def logloss(pc: Column): Column =
      round(avg(-($"y" * log(pc) + (lit(1.0) - $"y") * log(lit(1.0) - pc))), 4)
    // step 1 from w = 0: p is exactly 0.5
    val r1 = feat.agg(g6(lit(0.5) - $"y"), g6((lit(0.5) - $"y") * $"x1"),
      g6((lit(0.5) - $"y") * $"x2")).head()
    val (b1, wl1, ws1) = (-r1.getDouble(0), -r1.getDouble(1), -r1.getDouble(2))
    // step 2 gradient + step-1 loss in one pass at the updated weights
    val p1 = p(b1, wl1, ws1)
    val r2 = feat.agg(g6(p1 - $"y"), g6((p1 - $"y") * $"x1"),
      g6((p1 - $"y") * $"x2"), logloss(p1)).head()
    val (b2, wl2, ws2) = (b1 - r2.getDouble(0), wl1 - r2.getDouble(1),
      ws1 - r2.getDouble(2))
    val loss2 = feat.agg(logloss(p(b2, wl2, ws2))).head().getDouble(0)
    Seq((1, b1, wl1, ws1, r2.getDouble(3)), (2, b2, wl2, ws2, loss2))
      .toDF("step", "b", "w_len", "w_stop", "loss")
      .orderBy($"step")
  }

  val qLogregStepsSql: String =
    s"""WITH f AS (SELECT
       |  CASE WHEN source = 'src0' THEN 1.0 ELSE 0.0 END AS y,
       |  len(w) / 100.0 AS x1,
       |  len(list_filter(w, x -> list_contains($stopListSql, x)))::DOUBLE
       |    / len(w) AS x2
       |  FROM (SELECT source, string_split(text, ' ') AS w FROM documents)),
       |g1 AS (SELECT round(avg(0.5 - y), 6) + 0.0 AS gb,
       |  round(avg((0.5 - y) * x1), 6) + 0.0 AS gl,
       |  round(avg((0.5 - y) * x2), 6) + 0.0 AS gs FROM f),
       |w1 AS (SELECT -gb AS b, -gl AS wl, -gs AS ws FROM g1),
       |p1 AS (SELECT y, x1, x2,
       |  1.0 / (1.0 + exp(-(b + wl * x1 + ws * x2))) AS p FROM f, w1),
       |g2 AS (SELECT round(avg(p - y), 6) + 0.0 AS gb,
       |  round(avg((p - y) * x1), 6) + 0.0 AS gl,
       |  round(avg((p - y) * x2), 6) + 0.0 AS gs,
       |  round(avg(-(y * ln(p) + (1.0 - y) * ln(1.0 - p))), 4) AS loss FROM p1),
       |w2 AS (SELECT b - g2.gb AS b, wl - g2.gl AS wl, ws - g2.gs AS ws
       |  FROM w1, g2),
       |p2 AS (SELECT y, x1, x2,
       |  1.0 / (1.0 + exp(-(b + wl * x1 + ws * x2))) AS p FROM f, w2),
       |l2 AS (SELECT round(avg(-(y * ln(p) + (1.0 - y) * ln(1.0 - p))), 4)
       |  AS loss FROM p2)
       |SELECT 1 AS step, b, wl AS w_len, ws AS w_stop, loss FROM w1, g2
       |UNION ALL
       |SELECT 2, b, wl, ws, loss FROM w2, l2
       |ORDER BY step""".stripMargin

  /** Mutual information between bucketed document features and the
    * source label — the feature-selection statistic that decides which
    * corpus signals are worth feeding a quality classifier. Both
    * features melt into (feature, bucket, label) IN-ROW (one explode of
    * a 2-struct array, so the corpus is scanned once) and collapse to a
    * ≤ 2×10×2-cell joint count table in one hash aggregate; marginals
    * and totals then derive FROM the joint (never a rescan), and
    * MI = Σ p(b,y)·ln(p(b,y)/(p(b)p(y))) is a sum over the tiny cell
    * table. Per-feature MI plus cell count, 6dp. */
  def qMutualInfo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = T.documents(spark, dir)
      .withColumn("w", split($"text", " "))
      .withColumn("n_stop",
        size(filter($"w", x => array_contains(stopArr, x))))
      .select(
        when($"source" === "src0", 1L).otherwise(0L).as("y"),
        least(lit(9L), expr("size(w) div 20")).as("len_b"),
        least(lit(9L),
          floor($"n_stop".cast("double") / size($"w") * 10).cast("long"))
          .as("stop_b"))
    val joint = base.select($"y", explode(array(
        struct(lit("len_bucket").as("feature"), $"len_b".as("b")),
        struct(lit("stop_bucket").as("feature"), $"stop_b".as("b")))).as("f"))
      .select($"f.feature".as("feature"), $"f.b".as("b"), $"y")
      .groupBy($"feature", $"b", $"y").agg(count(lit(1)).as("n_by"))
      // <=40 cells, consumed by three marginal rollups + the final MI
      // sum — cached so the corpus is scanned once, not per consumer
      .cache()
    val nb = joint.groupBy($"feature", $"b").agg(sum($"n_by").as("n_b"))
    val ny = joint.groupBy($"feature", $"y").agg(sum($"n_by").as("n_y"))
    val tot = joint.groupBy($"feature").agg(sum($"n_by").as("n"))
    joint.join(nb, Seq("feature", "b")).join(ny, Seq("feature", "y"))
      .join(tot, Seq("feature"))
      .groupBy($"feature")
      .agg(
        round(sum(($"n_by".cast("double") / $"n") *
          log($"n_by".cast("double") * $"n" / ($"n_b".cast("double") * $"n_y"))), 6)
          .as("mi"),
        count(lit(1)).as("n_cells"))
      .orderBy($"feature")
  }

  val qMutualInfoSql: String =
    s"""WITH base AS (SELECT
       |  CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS y,
       |  least(9, len(w) // 20) AS len_b,
       |  least(9, floor(n_stop::DOUBLE / len(w) * 10))::BIGINT AS stop_b
       |  FROM (SELECT source, w,
       |          len(list_filter(w, x -> list_contains($stopListSql, x))) AS n_stop
       |        FROM (SELECT source, string_split(text, ' ') AS w FROM documents))),
       |m AS (SELECT 'len_bucket' AS feature, len_b AS b, y FROM base
       |      UNION ALL SELECT 'stop_bucket', stop_b, y FROM base),
       |j AS (SELECT feature, b, y, count(*) AS n_by FROM m GROUP BY 1, 2, 3),
       |nb AS (SELECT feature, b, sum(n_by) AS n_b FROM j GROUP BY 1, 2),
       |ny AS (SELECT feature, y, sum(n_by) AS n_y FROM j GROUP BY 1, 2),
       |t AS (SELECT feature, sum(n_by) AS n FROM j GROUP BY 1)
       |SELECT feature,
       |  round(sum((n_by::DOUBLE / n) *
       |    ln(n_by::DOUBLE * n / (n_b::DOUBLE * n_y))), 6) AS mi,
       |  count(*) AS n_cells
       |FROM j JOIN nb USING (feature, b) JOIN ny USING (feature, y)
       |  JOIN t USING (feature)
       |GROUP BY feature ORDER BY feature""".stripMargin

  /** ROC-AUC of the heuristic quality score against the source label —
    * the evaluation metric every trained/heuristic document filter is
    * judged by, computed WITHOUT sorting the corpus: Mann-Whitney U
    * with midrank tie handling. The corpus collapses first to one row
    * per distinct 4dp score (≤ 10001 rows by construction) carrying
    * (count, positives); midranks come from a cumulative window over
    * that bounded grid, never the fact table — so the only
    * corpus-sized operation is one hash aggregate, and every term of
    * U is an exact integer or half-integer (the final division is the
    * sole floating-point step). */
  def qAucQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val scored = T.documents(spark, dir)
      .withColumn("w", split($"text", " "))
      .withColumn("n_stop",
        size(filter($"w", x => array_contains(stopArr, x))))
      .select(
        round(least(lit(1.0), size($"w") / lit(100.0)) *
          (lit(1.0) - $"n_stop".cast("double") / size($"w")), 4).as("score"),
        when($"source" === "src0", 1L).otherwise(0L).as("y"))
    val grid = scored.groupBy($"score")
      .agg(count(lit(1)).as("c"), sum($"y").as("np"))
    val cum = grid.withColumn("cumb",
      sum($"c").over(Window.orderBy($"score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - $"c")
    cum.agg(
        sum($"c").as("n"), sum($"np").as("npos"),
        sum($"np" * ($"cumb" + ($"c" + lit(1)) / lit(2.0))).as("rsum"))
      .select(
        $"n".as("n_docs"), $"npos".as("n_pos"),
        round(($"rsum" - $"npos" * ($"npos" + 1) / lit(2.0)) /
          ($"npos" * ($"n" - $"npos")), 6).as("auc"))
  }

  val qAucQualitySql: String =
    s"""WITH s AS (SELECT
       |  round(least(1.0, len(w) / 100.0) * (1.0 - n_stop::DOUBLE / len(w)), 4)
       |    AS score,
       |  CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS y
       |  FROM (SELECT source, w,
       |          len(list_filter(w, x -> list_contains($stopListSql, x))) AS n_stop
       |        FROM (SELECT source, string_split(text, ' ') AS w FROM documents))),
       |g AS (SELECT score, count(*) AS c, sum(y) AS np FROM s GROUP BY score),
       |o AS (SELECT score, c, np,
       |  sum(c) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND
       |    CURRENT ROW) - c AS cumb FROM g)
       |SELECT sum(c)::BIGINT AS n_docs, sum(np)::BIGINT AS n_pos,
       |  round((sum(np * (cumb + (c + 1) / 2.0)) - sum(np) * (sum(np) + 1) / 2.0)
       |        / (sum(np) * (sum(c) - sum(np))), 6) AS auc
       |FROM o""".stripMargin

  /** Area under the precision-recall curve (average precision) of the
    * same heuristic quality score against the source label — the
    * class-imbalance-honest companion to q_auc_quality's ROC-AUC (at
    * 100 TB the positive class is often <1% and ROC-AUC saturates).
    * Identical grid discipline: one hash aggregate to the ≤10001-row
    * 4dp score grid, one cumulative window ordered by score DESC, and
    * AP = Σ np_i·(cumTP_i/cumN_i) / n_pos — the positive total factors
    * out, so ONE final aggregate closes it with no scalar broadcast. */
  def qPrAuc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val scored = T.documents(spark, dir)
      .withColumn("w", split($"text", " "))
      .withColumn("n_stop",
        size(filter($"w", x => array_contains(stopArr, x))))
      .select(
        round(least(lit(1.0), size($"w") / lit(100.0)) *
          (lit(1.0) - $"n_stop".cast("double") / size($"w")), 4).as("score"),
        when($"source" === "src0", 1L).otherwise(0L).as("y"))
    val grid = scored.groupBy($"score")
      .agg(count(lit(1)).as("c"), sum($"y").as("np"))
    val w = Window.orderBy(desc("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("cumn", sum($"c").over(w))
      .withColumn("cumtp", sum($"np").over(w))
      .agg(sum($"c").as("n_docs"), sum($"np").as("n_pos"),
        round(sum($"np" * $"cumtp" / $"cumn") / sum($"np"), 6).as("pr_auc"))
  }

  val qPrAucSql: String =
    s"""WITH s AS (SELECT
       |  round(least(1.0, len(w) / 100.0) * (1.0 - n_stop::DOUBLE / len(w)), 4)
       |    AS score,
       |  CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS y
       |  FROM (SELECT source, w,
       |          len(list_filter(w, x -> list_contains($stopListSql, x))) AS n_stop
       |        FROM (SELECT source, string_split(text, ' ') AS w FROM documents))),
       |g AS (SELECT score, count(*) AS c, sum(y) AS np FROM s GROUP BY score),
       |o AS (SELECT c, np,
       |  sum(c) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING AND
       |    CURRENT ROW) AS cumn,
       |  sum(np) OVER (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING AND
       |    CURRENT ROW) AS cumtp FROM g)
       |SELECT sum(c)::BIGINT AS n_docs, sum(np)::BIGINT AS n_pos,
       |  round(sum(np * cumtp / cumn) / sum(np), 6) AS pr_auc
       |FROM o""".stripMargin

  /** TextRank keyword extraction — weighted PageRank (d=0.85, 3
    * unrolled iterations) over the ±2-window token co-occurrence graph
    * restricted to the top-200 non-stopword vocabulary. The corpus-
    * sized work is exactly two hash aggregates (token counts for the
    * vocabulary cut; pair counts for the edges); everything after is
    * ≤200-node / ≤200²-edge bounded, so the iteration cost is constant
    * at any SF. Pair building reuses the shifted-zip directed-offsets
    * shape of q_cooccur_window (symmetrized after the aggregate).
    * Reports the top-15 keywords by rank. */
  def qTextrank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vocab = T.documents(spark, dir)
      .select(explode(split($"text", " ")).as("t"))
      .groupBy($"t").agg(count(lit(1)).as("cnt"))
      .filter(!array_contains(stopArr, $"t") && length($"t") > 2)
      .orderBy(desc("cnt"), asc("t")).limit(200)
      .select($"t").cache()
    def shifted(d: Int) =
      s"transform(slice(w, 1, size(w) - $d), (x, i) -> struct(x AS center, element_at(w, i + 1 + $d) AS context))"
    val directed = T.documents(spark, dir)
      .withColumn("w", split($"text", " "))
      .select(explode(expr(s"concat(${shifted(1)}, ${shifted(2)})")).as("p"))
      .groupBy($"p.center", $"p.context")
      .agg(count(lit(1)).as("n"))
    val sym = directed
      .union(directed.select($"context".as("center"), $"center".as("context"), $"n"))
      .groupBy($"center", $"context").agg(sum($"n").as("wt"))
    val edges = sym
      .join(broadcast(vocab.withColumnRenamed("t", "center")), Seq("center"))
      .join(broadcast(vocab.withColumnRenamed("t", "context")), Seq("context"))
      .cache()
    val p = edges
      .join(edges.groupBy($"center").agg(sum($"wt").as("wsum")), Seq("center"))
      .select($"center", $"context", ($"wt".cast("double") / $"wsum").as("p"))
      .cache()
    var r = vocab.select($"t", lit(1.0).as("r"))
    for (_ <- 1 to 3) {
      val contrib = p
        .join(r.withColumnRenamed("t", "center").withColumnRenamed("r", "rc"),
          Seq("center"))
        .groupBy($"context".as("t")).agg(sum($"p" * $"rc").as("mass"))
      r = vocab.join(contrib, Seq("t"), "left")
        .select($"t",
          (lit(0.15) + lit(0.85) * coalesce($"mass", lit(0.0))).as("r"))
        .ckpt()
    }
    r.select($"t".as("token"), round($"r", 6).as("score"))
      .orderBy(desc("score"), asc("token")).limit(15)
  }

  val qTextrankSql: String =
    s"""WITH toks AS MATERIALIZED (SELECT t, count(*)::BIGINT AS cnt
       |  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
       |  GROUP BY t),
       |vocab AS MATERIALIZED (SELECT t FROM toks
       |  WHERE NOT list_contains($stopListSql, t) AND len(t) > 2
       |  ORDER BY cnt DESC, t LIMIT 200),
       |d AS (SELECT string_split(text, ' ') AS w FROM documents),
       |a AS (SELECT w, unnest(range(1, len(w) + 1)) AS i FROM d),
       |b AS (SELECT w, i,
       |        unnest(range(greatest(i - 2, 1), least(i + 2, len(w)) + 1)) AS j
       |      FROM a),
       |sym AS (SELECT w[i] AS center, w[j] AS context, count(*)::BIGINT AS wt
       |  FROM b WHERE j != i GROUP BY 1, 2),
       |edges AS MATERIALIZED (SELECT center, context, wt FROM sym
       |  WHERE center IN (SELECT t FROM vocab) AND context IN (SELECT t FROM vocab)),
       |p AS MATERIALIZED (SELECT center, context,
       |    wt::DOUBLE / (sum(wt) OVER (PARTITION BY center)) AS p
       |  FROM edges),
       |r0 AS MATERIALIZED (SELECT t, 1.0 AS r FROM vocab),
       |r1 AS MATERIALIZED (SELECT v.t,
       |    0.15 + 0.85 * coalesce(sum(p.p * r0.r), 0.0) AS r
       |  FROM vocab v LEFT JOIN p ON p.context = v.t
       |  LEFT JOIN r0 ON r0.t = p.center GROUP BY v.t),
       |r2 AS MATERIALIZED (SELECT v.t,
       |    0.15 + 0.85 * coalesce(sum(p.p * r1.r), 0.0) AS r
       |  FROM vocab v LEFT JOIN p ON p.context = v.t
       |  LEFT JOIN r1 ON r1.t = p.center GROUP BY v.t),
       |r3 AS MATERIALIZED (SELECT v.t,
       |    0.15 + 0.85 * coalesce(sum(p.p * r2.r), 0.0) AS r
       |  FROM vocab v LEFT JOIN p ON p.context = v.t
       |  LEFT JOIN r2 ON r2.t = p.center GROUP BY v.t)
       |SELECT t AS token, round(r, 6) AS score
       |FROM r3 ORDER BY score DESC, token LIMIT 15""".stripMargin

  /** Kolmogorov-Smirnov statistic of the quality-score classifier —
    * max |TPR−FPR| over thresholds, the industry-standard separation
    * measure next to ROC-AUC (q_auc_quality) and PR-AUC (q_pr_auc).
    * Same 4dp score-grid discipline; because the CDF terms are exact
    * integer ratios (no running float sums), D is bit-identical across
    * engines and the argmax threshold is picked by the rounded key
    * with a score tie-break. */
  def qKsClassifier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val scored = T.documents(spark, dir)
      .withColumn("w", split($"text", " "))
      .withColumn("n_stop",
        size(filter($"w", x => array_contains(stopArr, x))))
      .select(
        round(least(lit(1.0), size($"w") / lit(100.0)) *
          (lit(1.0) - $"n_stop".cast("double") / size($"w")), 4).as("score"),
        when($"source" === "src0", 1L).otherwise(0L).as("y"))
    val grid = scored.groupBy($"score")
      .agg(count(lit(1)).as("c"), sum($"y").as("np"))
    val w = Window.orderBy($"score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    grid
      .withColumn("cp", sum($"np").over(w))
      .withColumn("cn", sum($"c" - $"np").over(w))
      .withColumn("npos", sum($"np").over(all))
      .withColumn("nneg", sum($"c" - $"np").over(all))
      .withColumn("d",
        abs($"cp".cast("double") / $"npos" - $"cn".cast("double") / $"nneg"))
      .orderBy(desc("d"), asc("score")).limit(1)
      .select(($"npos" + $"nneg").as("n_docs"), $"npos".as("n_pos"),
        round($"d", 6).as("ks"), $"score".as("ks_score"))
  }

  val qKsClassifierSql: String =
    s"""WITH s AS (SELECT
       |  round(least(1.0, len(w) / 100.0) * (1.0 - n_stop::DOUBLE / len(w)), 4)
       |    AS score,
       |  CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS y
       |  FROM (SELECT source, w,
       |          len(list_filter(w, x -> list_contains($stopListSql, x))) AS n_stop
       |        FROM (SELECT source, string_split(text, ' ') AS w FROM documents))),
       |g AS (SELECT score, count(*) AS c, sum(y) AS np FROM s GROUP BY score),
       |o AS (SELECT score,
       |  sum(np) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND
       |    CURRENT ROW) AS cp,
       |  sum(c - np) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND
       |    CURRENT ROW) AS cn,
       |  sum(np) OVER () AS npos, sum(c - np) OVER () AS nneg FROM g),
       |d AS (SELECT score, npos, nneg,
       |    abs(cp::DOUBLE / npos - cn::DOUBLE / nneg) AS d FROM o)
       |SELECT (npos + nneg)::BIGINT AS n_docs, npos::BIGINT AS n_pos,
       |  round(d, 6) AS ks, score AS ks_score
       |FROM d ORDER BY d DESC, score LIMIT 1""".stripMargin

  /** Brier score with the Murphy reliability/resolution/uncertainty
    * decomposition over 10 probability bins — the calibration-aware
    * accuracy report for the quality-score classifier (q_calibration
    * gives ECE; this splits the SQUARED error into blame components).
    * Everything derives from ONE (score, y)-cell grid (≤ 2·10001
    * rows): the Brier itself is grid-exact (Σ c·(s−y)²), bins
    * re-aggregate the grid, and the two 1-row summaries meet in a
    * broadcast — one fact scan total. */
  def qBrierScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = T.documents(spark, dir)
      .withColumn("w", split($"text", " "))
      .withColumn("n_stop",
        size(filter($"w", x => array_contains(stopArr, x))))
      .select(
        round(least(lit(1.0), size($"w") / lit(100.0)) *
          (lit(1.0) - $"n_stop".cast("double") / size($"w")), 4).as("score"),
        when($"source" === "src0", 1L).otherwise(0L).as("y"))
    val grid = scored.groupBy($"score", $"y").agg(count(lit(1)).as("c")).cache()
    val brier = grid.agg(sum($"c").as("n"),
      sum($"c" * ($"score" - $"y") * ($"score" - $"y")).as("se"),
      sum($"c" * $"y").as("sy"))
    val bins = grid
      .groupBy(least(floor($"score" * 10), lit(9L)).as("b"))
      .agg(sum($"c").as("nb"), sum($"c" * $"score").as("ssum"),
        sum($"c" * $"y").as("ysum"))
    val binAgg = bins.agg(
      sum($"nb" * ($"ssum" / $"nb" - $"ysum" / $"nb") *
        ($"ssum" / $"nb" - $"ysum" / $"nb")).as("relsum"),
      sum($"ysum" * $"ysum" / $"nb").as("yb2"))
    brier.crossJoin(broadcast(binAgg))
      .withColumn("ybar", $"sy".cast("double") / $"n")
      .select($"n",
        round($"se" / $"n", 6).as("brier"),
        round($"relsum" / $"n", 6).as("reliability"),
        round($"yb2" / $"n" - $"ybar" * $"ybar", 6).as("resolution"),
        round($"ybar" * (lit(1.0) - $"ybar"), 6).as("uncertainty"))
  }

  val qBrierScoreSql: String =
    s"""WITH s AS (SELECT
       |  round(least(1.0, len(w) / 100.0) * (1.0 - n_stop::DOUBLE / len(w)), 4)
       |    AS score,
       |  CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS y
       |  FROM (SELECT source, w,
       |          len(list_filter(w, x -> list_contains($stopListSql, x))) AS n_stop
       |        FROM (SELECT source, string_split(text, ' ') AS w FROM documents))),
       |grid AS MATERIALIZED (SELECT score, y, count(*)::BIGINT AS c
       |  FROM s GROUP BY 1, 2),
       |br AS (SELECT sum(c)::BIGINT AS n,
       |    sum(c * (score - y) * (score - y)) AS se, sum(c * y)::BIGINT AS sy
       |  FROM grid),
       |bins AS (SELECT least(floor(score * 10), 9) AS b, sum(c)::BIGINT AS nb,
       |    sum(c * score) AS ssum, sum(c * y)::BIGINT AS ysum
       |  FROM grid GROUP BY 1),
       |ba AS (SELECT
       |    sum(nb * (ssum / nb - ysum::DOUBLE / nb) *
       |      (ssum / nb - ysum::DOUBLE / nb)) AS relsum,
       |    sum(ysum::DOUBLE * ysum / nb) AS yb2 FROM bins)
       |SELECT n, round(se / n, 6) AS brier,
       |  round(relsum / n, 6) AS reliability,
       |  round(yb2 / n - (sy::DOUBLE / n) * (sy::DOUBLE / n), 6) AS resolution,
       |  round((sy::DOUBLE / n) * (1.0 - sy::DOUBLE / n), 6) AS uncertainty
       |FROM br, ba""".stripMargin

  /** Pairwise Jensen-Shannon divergence between source unigram
    * distributions — the symmetric, bounded companion to the KL
    * report (q_source_divergence) a mixing planner reads to decide
    * which sources are redundant. Shared-token terms come from ONE
    * self-join of the cached (source, token, p) relation keyed on
    * token (per-token work is |sources|²-bounded, linear in vocab);
    * tokens private to one side close in constant form — their
    * contribution is exactly p·ln2 — so no full-outer join is needed:
    * JSD = ½Σ_shared [...] + ½ln2·((1−mass_a) + (1−mass_b)). */
  def qJsdMatrix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val st = T.documents(spark, dir)
      .select($"source", explode(split($"text", " ")).as("t"))
      .groupBy($"source", $"t").agg(count(lit(1)).as("n"))
    val tot = st.groupBy($"source").agg(sum($"n").as("ns"))
    val p = st.join(broadcast(tot), Seq("source"))
      .select($"source", $"t", ($"n".cast("double") / $"ns").as("p"))
      .cache()
    val ln2 = 0.6931471805599453
    p.select($"source".as("src_a"), $"t", $"p".as("pa"))
      .join(p.select($"source".as("src_b"), $"t", $"p".as("pb")), Seq("t"))
      .filter($"src_a" < $"src_b")
      .groupBy($"src_a", $"src_b")
      .agg(
        sum($"pa" * log(lit(2.0) * $"pa" / ($"pa" + $"pb")) +
          $"pb" * log(lit(2.0) * $"pb" / ($"pa" + $"pb"))).as("cshared"),
        sum($"pa").as("ma"), sum($"pb").as("mb"))
      .select($"src_a", $"src_b",
        round(lit(0.5) * $"cshared" +
          lit(0.5) * lit(ln2) * (lit(2.0) - $"ma" - $"mb"), 6).as("jsd"))
      .orderBy(desc("jsd"), asc("src_a"), asc("src_b"))
      .limit(15)
  }

  val qJsdMatrixSql: String =
    """WITH st AS (SELECT source, t, count(*)::BIGINT AS n
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS t FROM documents)
      |  GROUP BY 1, 2),
      |tot AS (SELECT source, sum(n)::BIGINT AS ns FROM st GROUP BY source),
      |p AS MATERIALIZED (SELECT st.source, t, n::DOUBLE / ns AS p
      |  FROM st JOIN tot ON st.source = tot.source),
      |j AS (SELECT a.source AS src_a, b.source AS src_b,
      |    sum(a.p * ln(2.0 * a.p / (a.p + b.p)) +
      |        b.p * ln(2.0 * b.p / (a.p + b.p))) AS cshared,
      |    sum(a.p) AS ma, sum(b.p) AS mb
      |  FROM p a JOIN p b ON a.t = b.t AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT src_a, src_b,
      |  round(0.5 * cshared + 0.5 * 0.6931471805599453 * (2.0 - ma - mb), 6)
      |    AS jsd
      |FROM j ORDER BY jsd DESC, src_a, src_b LIMIT 15""".stripMargin

  /** Self-BLEU-1 of a 20-document probe set against the rest of the
    * corpus — the diversity audit run on generated corpora (high
    * self-BLEU = the corpus repeats itself). BLEU's clipped unigram
    * precision needs, per token, the maximum per-document count among
    * REFERENCE docs (everyone but the candidate); keeping the TOP-2
    * per-token counts (one partitioned window over the (token, doc)
    * count relation) makes that exact without a per-probe rescan:
    * ref_max = top1 unless the probe itself holds it, else top2.
    * Probes are the 20 smallest content-md5 docs — deterministic and
    * corpus-size-independent. All-integer arithmetic to the final
    * division. */
  def qSelfBleu(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val dt = T.documents(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("t"))
      .groupBy($"doc_id", $"t").agg(count(lit(1)).as("c"))
      .cache()
    val w2 = Window.partitionBy($"t").orderBy(desc("c"), asc("doc_id"))
    val top2 = dt.withColumn("rn", row_number().over(w2)).filter($"rn" <= 2)
      .groupBy($"t").agg(
        max(when($"rn" === 1, $"c")).as("m1"),
        max(when($"rn" === 1, $"doc_id")).as("d1"),
        max(when($"rn" === 2, $"c")).as("m2"))
      .select($"t", $"m1", $"d1", coalesce($"m2", lit(0L)).as("m2"))
    val probes = T.documents(spark, dir)
      .select($"doc_id", md5($"text".cast("binary")).as("h"))
      .orderBy($"h", $"doc_id").limit(20)
      .select($"doc_id")
    dt.join(broadcast(probes), Seq("doc_id"))
      .join(top2, Seq("t"))
      .select($"doc_id", $"c",
        when($"d1" === $"doc_id", $"m2").otherwise($"m1").as("refmax"))
      .groupBy($"doc_id")
      .agg(sum(least($"c", $"refmax")).as("clip"), sum($"c").as("tot"))
      .select($"doc_id", $"clip", $"tot",
        round($"clip".cast("double") / $"tot", 4).as("self_bleu1"))
      .orderBy($"doc_id")
  }

  val qSelfBleuSql: String =
    """WITH dt AS MATERIALIZED (SELECT doc_id, t, count(*)::BIGINT AS c
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      |  GROUP BY 1, 2),
      |r AS (SELECT t, c, doc_id,
      |    row_number() OVER (PARTITION BY t ORDER BY c DESC, doc_id) AS rn
      |  FROM dt),
      |top2 AS (SELECT t, max(CASE WHEN rn = 1 THEN c END) AS m1,
      |    max(CASE WHEN rn = 1 THEN doc_id END) AS d1,
      |    coalesce(max(CASE WHEN rn = 2 THEN c END), 0) AS m2
      |  FROM r WHERE rn <= 2 GROUP BY t),
      |probes AS (SELECT doc_id FROM
      |  (SELECT doc_id, md5(text) AS h FROM documents ORDER BY h, doc_id LIMIT 20)),
      |sc AS (SELECT dt.doc_id, dt.c,
      |    CASE WHEN d1 = dt.doc_id THEN m2 ELSE m1 END AS refmax
      |  FROM dt JOIN probes USING (doc_id) JOIN top2 USING (t))
      |SELECT doc_id, sum(least(c, refmax))::BIGINT AS clip,
      |  sum(c)::BIGINT AS tot,
      |  round(sum(least(c, refmax))::DOUBLE / sum(c), 4) AS self_bleu1
      |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Chao1 species-richness estimate of the corpus vocabulary — the
    * "how many word types exist that we haven't seen yet" projection
    * (bias-corrected: V + f1(f1−1)/(2(f2+1))) that complements the
    * Heaps-law fit with a nonparametric asymptote. Singleton and
    * doubleton counts come from re-aggregating the vocab-bounded
    * count-of-counts relation; one corpus scan, exact integers until
    * the final division. */
  def qChao1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.documents(spark, dir)
      .select(explode(split($"text", " ")).as("t"))
      .groupBy($"t").agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("v"),
        sum(when($"cnt" === 1, 1L).otherwise(0L)).as("f1"),
        sum(when($"cnt" === 2, 1L).otherwise(0L)).as("f2"))
      .select($"v", $"f1", $"f2",
        round($"v" + $"f1" * ($"f1" - 1) / (lit(2.0) * ($"f2" + 1)), 2)
          .as("chao1"))
  }

  val qChao1Sql: String =
    """WITH c AS (SELECT t, count(*)::BIGINT AS cnt
      |  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
      |  GROUP BY t),
      |a AS (SELECT count(*)::BIGINT AS v,
      |    sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)::BIGINT AS f1,
      |    sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END)::BIGINT AS f2
      |  FROM c)
      |SELECT v, f1, f2,
      |  round(v + f1 * (f1 - 1) / (2.0 * (f2 + 1)), 2) AS chao1
      |FROM a""".stripMargin

  /** Skip-gram window co-occurrence counts (window ±2, self excluded) —
    * the (center, context) statistic word2vec/GloVe-style embedding
    * training consumes, where PMI over ADJACENT pairs (q_pmi_bigrams)
    * is too narrow. DIRECTED pairs at offsets +1 and +2 are built as
    * two single-level shifted zips inside the token array (the
    * codegen-friendly qBigramTop shape — a nested transform+filter
    * over a ±window evaluates interpreted and measured 4x slower) and
    * exploded once; the window's symmetry is restored AFTER the hash
    * aggregate by unioning the |distinct pairs|-sized directed counts
    * with their swap — so the corpus-sized stream carries 2x|tokens|
    * rows, not 4x, and the shuffle stays |vocab|²-bounded. Top-20 by
    * count desc, then center/context asc. */
  def qCooccurWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def shifted(d: Int) =
      s"transform(slice(w, 1, size(w) - $d), (x, i) -> struct(x AS center, element_at(w, i + 1 + $d) AS context))"
    val directed = T.documents(spark, dir)
      .withColumn("w", split($"text", " "))
      .select(explode(expr(
        s"concat(${shifted(1)}, ${shifted(2)})")).as("p"))
      .groupBy($"p.center", $"p.context")
      .agg(count(lit(1)).as("n"))
    directed
      .union(directed.select($"context".as("center"), $"center".as("context"), $"n"))
      .groupBy($"center", $"context")
      .agg(sum($"n").as("n"))
      .orderBy(desc("n"), asc("center"), asc("context"))
      .limit(20)
  }

  val qCooccurWindowSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |a AS (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM d),
      |b AS (SELECT w, i,
      |        unnest(range(greatest(i - 2, 1), least(i + 2, len(w)) + 1)) AS j
      |      FROM a)
      |SELECT w[i] AS center, w[j] AS context, count(*) AS n
      |FROM b WHERE j != i
      |GROUP BY 1, 2 ORDER BY n DESC, center, context LIMIT 20""".stripMargin

  /** Hill estimator of the vocabulary's power-law tail exponent —
    * the Zipf fit's robust companion: alpha = k / sum(ln(x_i /
    * x_{k+1})) over the k=100 largest token frequencies. Only a
    * k+1-row TakeOrdered leaves the frequency aggregate, so the
    * estimator costs one vocab pass plus a 101-row reduction at any
    * SF; frequency ties at the threshold contribute ln(1) = 0 in
    * both engines, so the boundary is tie-proof by construction. */
  def qTailIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 100
    val cnt = T.documents(spark, dir)
      .select(explode(split($"text", " ")).as("t"))
      .filter(length($"t") > 0)
      .groupBy($"t").agg(count(lit(1)).as("cnt"))
    val top = cnt.orderBy(desc("cnt"), asc("t")).limit(k + 1).ckpt()
    top.crossJoin(broadcast(top.agg(min($"cnt").cast("double").as("xk1"))))
      .agg(sum(log($"cnt" / $"xk1")).as("sumlog"),
        max($"xk1").as("xk1"))
      .select(lit(k).as("k"), $"xk1".cast("bigint").as("x_k1"),
        round(lit(k.toDouble) / $"sumlog", 4).as("alpha"))
  }

  val qTailIndexSql: String =
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
      |cnt AS (SELECT t, count(*) AS cnt FROM tok WHERE len(t) > 0 GROUP BY t),
      |top AS (SELECT cnt FROM cnt ORDER BY cnt DESC, t LIMIT 101),
      |thr AS (SELECT CAST(min(cnt) AS DOUBLE) AS xk1 FROM top)
      |SELECT 100 AS k, xk1::BIGINT AS x_k1,
      |  round(100.0 / sum(ln(cnt / xk1)), 4) AS alpha
      |FROM top, thr GROUP BY xk1""".stripMargin

  /** Tokenizer vocabulary-coverage curve: what fraction of all corpus
    * token OCCURRENCES the top-K vocabulary entries capture, for
    * K ∈ {100, 1000, 10000} — the sizing curve a tokenizer/vocab
    * decision reads (its complement is the OOV rate a K-entry vocab
    * pays). One corpus scan builds the vocab-keyed count table; the
    * global frequency rank comes from [[Skew.globalRowNumber]] (range
    * partition + local rank + broadcast offsets — no vocab-sized
    * single-task sort); each cutoff's mass is then a conditional
    * aggregate over the rank ≤ 10000 head, so the full vocabulary
    * never funnels anywhere after ranking. All masses are exact
    * integer sums; the only double is the final share. */
  def qVocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = T.documents(spark, dir)
      .select(explode(split($"text", " ")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("c"))
      .cache()
    val tot = counts.agg(sum($"c").cast("double").as("total"))
    val head = Skew.globalRowNumber(counts, Seq(desc("c"), asc("tok")),
        rankName = "rn")
      .filter($"rn" <= 10000)
      .ckpt()
    Seq(100, 1000, 10000).map { k =>
      head.filter($"rn" <= k)
        .agg(lit(k).as("cutoff"), count(lit(1)).as("vocab_kept"),
          sum($"c").as("covered_tokens"))
    }.reduce(_ union _)
      .crossJoin(broadcast(tot))
      .select($"cutoff", $"vocab_kept", $"covered_tokens",
        round($"covered_tokens" / $"total", 6).as("coverage"))
      .orderBy($"cutoff")
  }

  val qVocabCoverageSql: String =
    """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |c AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
      |r AS (SELECT tok, c, row_number() OVER (ORDER BY c DESC, tok) AS rn FROM c),
      |tot AS (SELECT sum(c)::DOUBLE AS total FROM c),
      |k AS (SELECT unnest([100, 1000, 10000]) AS k)
      |SELECT k.k AS cutoff, count(*) AS vocab_kept,
      |  CAST(sum(r.c) AS BIGINT) AS covered_tokens,
      |  round(sum(r.c) / (SELECT total FROM tot), 6) AS coverage
      |FROM k JOIN r ON r.rn <= k.k
      |GROUP BY k.k ORDER BY cutoff""".stripMargin

  /** Feature-hashing collision audit: how much of the vocabulary
    * collides when tokens hash into 2^k buckets, for k ∈ {10, 12, 14}
    * — the table that picks the hashing-trick width before a model
    * ships with silently-merged features. The distinct vocabulary is
    * hashed ONCE (md5-derived 48-bit integer, the cross-engine hash
    * discipline); each k is then a distinct-count over the cached
    * vocab-sized relation, so the corpus is scanned once total. */
  def qFeatureHashAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hashed = T.documents(spark, dir)
      .select(explode(split($"text", " ")).as("tok"))
      .distinct()
      .select($"tok",
        expr("cast(conv(substring(md5(cast(tok as binary)), 1, 12), 16, 10) AS bigint)").as("h"))
      .cache()
    Seq(10, 12, 14).map { k =>
      hashed.select(pmod($"h", lit(1L << k)).as("b"))
        .agg(lit(k).as("k"), lit(1L << k).as("n_buckets"),
          count(lit(1)).as("n_tokens"),
          countDistinct($"b").as("buckets_used"))
    }.reduce(_ union _)
      .select($"k", $"n_buckets", $"n_tokens", $"buckets_used",
        round(($"n_tokens" - $"buckets_used").cast("double") / $"n_tokens", 6)
          .as("collision_rate"))
      .orderBy($"k")
  }

  val qFeatureHashAuditSql: String =
    """WITH v AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM documents),
      |h AS (SELECT tok,
      |    (list_sum(list_transform(range(1, 13),
      |       i -> (strpos('0123456789abcdef', substr(md5(tok), i, 1)) - 1) * pow(16.0, 12 - i)))::BIGINT) AS h
      |  FROM v),
      |k AS (SELECT unnest([10, 12, 14]) AS k)
      |SELECT k.k AS k, (1 << k.k)::BIGINT AS n_buckets, count(*) AS n_tokens,
      |  count(DISTINCT h.h % (1 << k.k)) AS buckets_used,
      |  round((count(*) - count(DISTINCT h.h % (1 << k.k)))::DOUBLE / count(*), 6)
      |    AS collision_rate
      |FROM k CROSS JOIN h GROUP BY k.k ORDER BY k""".stripMargin

  /** Distinctive vocabulary per source by Monroe et al.'s log-odds
    * with an informative Dirichlet prior ("Fightin' Words"): for each
    * (source, token), the z-scored log-odds delta of the token's rate
    * in the source vs the REST of the corpus, with prior mass
    * α_t = α₀·g_t/N proportional to the corpus rate (α₀ = 500) — the
    * estimator that, unlike raw tf-idf, doesn't crown rare noise. One
    * corpus scan to (source, token) counts; globals derive by rollup
    * (no second tokenize); the per-source top-3 runs through the
    * two-phase salted top-k, and z is rounded to 4 dp BEFORE ranking
    * so the selection is engine-stable. */
  def qLogOddsTerms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val a0 = 500.0
    val cs = T.documents(spark, dir)
      .select($"source", explode(split($"text", " ")).as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("c"))
      .cache()
    val g = cs.groupBy($"tok").agg(sum($"c").as("g"))
    val ns = cs.groupBy($"source").agg(sum($"c").as("ns"))
    val tot = g.agg(sum($"g").cast("double").as("nn"))
    val scored = cs
      .join(g, Seq("tok"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("alpha", lit(a0) * $"g" / $"nn")
      .withColumn("cr", ($"g" - $"c").cast("double"))
      .withColumn("nr", $"nn" - $"ns")
      .withColumn("delta",
        log(($"c" + $"alpha") / ($"ns" + lit(a0) - $"c" - $"alpha"))
          - log(($"cr" + $"alpha") / ($"nr" + lit(a0) - $"cr" - $"alpha")))
      .withColumn("z", round($"delta" /
        sqrt(lit(1.0) / ($"c" + $"alpha") + lit(1.0) / ($"cr" + $"alpha")), 4))
    Skew.twoPhaseTopK(scored, Seq($"source"),
        Seq($"z".desc, $"tok".asc), 3, "rk")
      .select($"source", $"rk".cast("long").as("rk"), $"tok", $"c", $"z")
      .orderBy($"source", $"rk")
  }

  val qLogOddsTermsSql: String =
    """WITH cs AS (SELECT source, tok, count(*) AS c FROM
      |    (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY 1, 2),
      |g AS (SELECT tok, CAST(sum(c) AS BIGINT) AS g FROM cs GROUP BY tok),
      |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM cs GROUP BY source),
      |tot AS (SELECT sum(g)::DOUBLE AS nn FROM g),
      |sc AS (SELECT cs.source, cs.tok, cs.c,
      |    500.0 * g.g / t.nn AS alpha,
      |    (g.g - cs.c)::DOUBLE AS cr,
      |    t.nn - ns.ns AS nr,
      |    ns.ns AS ns
      |  FROM cs JOIN g USING (tok) JOIN ns USING (source), tot t),
      |z AS (SELECT source, tok, c,
      |    round((ln((c + alpha) / (ns + 500.0 - c - alpha))
      |         - ln((cr + alpha) / (nr + 500.0 - cr - alpha)))
      |      / sqrt(1.0 / (c + alpha) + 1.0 / (cr + alpha)), 4) AS z
      |  FROM sc),
      |r AS (SELECT source, tok, c, z,
      |    row_number() OVER (PARTITION BY source ORDER BY z DESC, tok) AS rk
      |  FROM z)
      |SELECT source, rk, tok, c, z FROM r WHERE rk <= 3
      |ORDER BY source, rk""".stripMargin

  /** Flesch reading-ease profile per source: words per sentence
    * (sentence boundaries = runs of [.!?]; a fixture without
    * punctuation degenerates to one sentence per doc, identically in
    * both engines), syllables per word via the vowel-group heuristic
    * (each maximal [aeiouy]+ run ≈ one syllable, floor 1), and
    * Flesch = 206.835 − 1.015·(W/S) − 84.6·(Syl/W). Everything is
    * in-array column algebra — per-doc counts come from higher-order
    * functions over the token array, no explode, zero shuffle before
    * the per-source rollup. The readability gate complements
    * `q_quality_score`'s stopword heuristics in a curation stack. */
  def qReadability(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    T.documents(spark, dir)
      .withColumn("w", split($"text", " "))
      .select($"source",
        size($"w").cast("double").as("words"),
        greatest(size(expr("regexp_extract_all(text, '[.!?]+', 0)")), lit(1))
          .cast("double").as("sentences"),
        expr("""aggregate(w, 0L, (acc, x) ->
          |  acc + greatest(size(regexp_extract_all(x, '[aeiouy]+', 0)), 1))"""
          .stripMargin).cast("double").as("syllables"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        round(avg($"words" / $"sentences"), 4).as("words_per_sentence"),
        round(avg($"syllables" / $"words"), 4).as("syllables_per_word"),
        round(avg(lit(206.835) - lit(1.015) * ($"words" / $"sentences")
          - lit(84.6) * ($"syllables" / $"words")), 2).as("flesch"))
      .orderBy($"source")
  }

  val qReadabilitySql: String =
    """WITH d AS (SELECT source, string_split(text, ' ') AS w,
      |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::DOUBLE AS sentences
      |  FROM documents),
      |f AS (SELECT source, len(w)::DOUBLE AS words, sentences,
      |    (list_sum(list_transform(w, x ->
      |      greatest(len(regexp_extract_all(x, '[aeiouy]+')), 1))))::DOUBLE AS syllables
      |  FROM d)
      |SELECT source, count(*) AS n_docs,
      |  round(avg(words / sentences), 4) AS words_per_sentence,
      |  round(avg(syllables / words), 4) AS syllables_per_word,
      |  round(avg(206.835 - 1.015 * (words / sentences)
      |    - 84.6 * (syllables / words)), 2) AS flesch
      |FROM f GROUP BY source ORDER BY source""".stripMargin

  /** Calibration audit (reliability table + expected calibration
    * error) of a probabilistic classifier — here the stopword-density
    * English-ness score, binned into 10 equal-width confidence
    * buckets: per bucket the mean predicted probability (confidence)
    * vs the observed English rate (accuracy), and ECE = the
    * n-weighted mean |acc − conf| — the one number that says whether
    * scores can be READ as probabilities (the gate before any
    * score-thresholded curation decision). One corpus scan, a ≤10-row
    * hash aggregate, and a 1-row ECE broadcast back onto the bins.
    * The score is rounded to 6 dp BEFORE binning so the bucket
    * boundary decision is bit-identical across engines. */
  def qCalibration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = T.documents(spark, dir)
      .withColumn("w", split($"text", " "))
      .withColumn("stop_ratio",
        size(filter($"w", x => array_contains(stopArr, x))).cast("double")
          / size($"w"))
      .select($"lang", least(lit(1.0), round($"stop_ratio" * 3, 6)).as("p"))
      .withColumn("y", when($"lang" === "en", 1.0).otherwise(0.0))
      .withColumn("bin", least(floor($"p" * 10), lit(9.0)).cast("int"))
    val bins = scored.groupBy($"bin")
      .agg(count(lit(1)).as("n"), avg($"p").as("conf"), avg($"y").as("acc"))
      .ckpt()
    val ece = bins.agg(
      (sum($"n" * abs($"acc" - $"conf")) / sum($"n")).as("ece"))
    bins.crossJoin(broadcast(ece))
      .select($"bin", $"n", round($"conf", 4).as("conf"),
        round($"acc", 4).as("acc"),
        round(abs($"acc" - $"conf"), 4).as("gap"),
        round($"ece", 4).as("ece"))
      .orderBy($"bin")
  }

  val qCalibrationSql: String =
    s"""WITH d AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
       |s AS (SELECT lang, least(1.0, round(
       |    len(list_filter(w, x -> list_contains($stopListSql, x)))::DOUBLE
       |      / len(w) * 3, 6)) AS p FROM d),
       |b AS (SELECT CAST(least(floor(p * 10), 9) AS INT) AS bin, p,
       |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y FROM s),
       |g AS (SELECT bin, count(*) AS n, avg(p) AS conf, avg(y) AS acc
       |      FROM b GROUP BY bin),
       |e AS (SELECT sum(n * abs(acc - conf)) / sum(n) AS ece FROM g)
       |SELECT bin, n, round(conf, 4) AS conf, round(acc, 4) AS acc,
       |  round(abs(acc - conf), 4) AS gap, round(e.ece, 4) AS ece
       |FROM g, e ORDER BY bin""".stripMargin

  /** Reciprocal-rank fusion of two keyword retrieval rankings (BM25
    * and raw tf·idf) for the fixed query {spark, window, hash}:
    * rrf(d) = Σ_lists 1/(60 + rank_d) over each list's top 20 — the
    * standard zero-tuning way to merge heterogeneous retrievers
    * (lexical + semantic) in a RAG stack. Shape matters more than the
    * formula: per-term tf and dl are computed IN-ARRAY in one corpus
    * scan (no token explode, no shuffle), both scores come from the
    * same cached per-doc feature row against a 1-row broadcast stats
    * relation, and only the two 20-row rank lists join. Scores are
    * rounded to 4 dp BEFORE ranking so rank assignment — and thus the
    * fused order — is bit-identical across engines. */
  def qRrfFusion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val terms = Seq("spark", "window", "hash")
    val k1 = 1.2; val b = 0.75
    val feat = T.documents(spark, dir)
      .withColumn("w", split($"text", " "))
      .select(Seq($"doc_id", size($"w").cast("double").as("dl")) ++
        terms.zipWithIndex.map { case (t, i) =>
          expr(s"cast(size(filter(w, x -> x = '$t')) AS double)").as(s"tf$i")
        }: _*)
      .ckpt()
    val aggCols =
      Seq(count(lit(1)).cast("double").as("n_docs"), avg($"dl").as("avgdl")) ++
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1.0).otherwise(0.0)).as(s"df$i"))
    val stats = feat.agg(aggCols.head, aggCols.tail: _*)
    def bm25Term(i: Int): Column = {
      val idf = log(($"n_docs" - col(s"df$i") + 0.5) / (col(s"df$i") + 0.5) + 1.0)
      when(col(s"tf$i") > 0,
        idf * (col(s"tf$i") * (k1 + 1)) /
          (col(s"tf$i") + lit(k1) * (lit(1 - b) + lit(b) * $"dl" / $"avgdl")))
        .otherwise(0.0)
    }
    def tfidfTerm(i: Int): Column =
      when(col(s"tf$i") > 0 && col(s"df$i") > 0,
        col(s"tf$i") * log($"n_docs" / col(s"df$i"))).otherwise(0.0)
    val scored = feat.crossJoin(broadcast(stats))
      .filter(terms.indices.map(i => col(s"tf$i") > 0).reduce(_ || _))
      .select($"doc_id",
        round(terms.indices.map(bm25Term).reduce(_ + _), 4).as("s_bm25"),
        round(terms.indices.map(tfidfTerm).reduce(_ + _), 4).as("s_tfidf"))
      .ckpt()
    def top20(score: Column, name: String): DataFrame =
      scored.orderBy(score.desc, $"doc_id".asc).limit(20)
        .withColumn(name, row_number().over(
          Window.orderBy(score.desc, $"doc_id".asc)))
        .select($"doc_id", col(name))
    top20($"s_bm25", "ra").join(top20($"s_tfidf", "rb"), Seq("doc_id"), "full_outer")
      .select($"doc_id",
        round(coalesce(lit(1.0) / (lit(60) + $"ra"), lit(0.0))
          + coalesce(lit(1.0) / (lit(60) + $"rb"), lit(0.0)), 6).as("rrf"),
        coalesce($"ra", lit(0)).cast("long").as("ra"),
        coalesce($"rb", lit(0)).cast("long").as("rb"))
      .orderBy(desc("rrf"), asc("doc_id"))
      .limit(10)
  }

  val qRrfFusionSql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |feat AS (SELECT doc_id, len(w)::DOUBLE AS dl,
      |    len(list_filter(w, x -> x = 'spark'))::DOUBLE AS tf0,
      |    len(list_filter(w, x -> x = 'window'))::DOUBLE AS tf1,
      |    len(list_filter(w, x -> x = 'hash'))::DOUBLE AS tf2
      |  FROM d),
      |stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl,
      |    sum(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
      |    sum(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
      |    sum(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2
      |  FROM feat),
      |scored AS (SELECT doc_id,
      |    round(
      |      (CASE WHEN tf0 > 0 THEN ln((n_docs - df0 + 0.5) / (df0 + 0.5) + 1.0)
      |        * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl)) ELSE 0.0 END)
      |      + (CASE WHEN tf1 > 0 THEN ln((n_docs - df1 + 0.5) / (df1 + 0.5) + 1.0)
      |        * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl)) ELSE 0.0 END)
      |      + (CASE WHEN tf2 > 0 THEN ln((n_docs - df2 + 0.5) / (df2 + 0.5) + 1.0)
      |        * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)) ELSE 0.0 END), 4) AS s_bm25,
      |    round(
      |      (CASE WHEN tf0 > 0 AND df0 > 0 THEN tf0 * ln(n_docs / df0) ELSE 0.0 END)
      |      + (CASE WHEN tf1 > 0 AND df1 > 0 THEN tf1 * ln(n_docs / df1) ELSE 0.0 END)
      |      + (CASE WHEN tf2 > 0 AND df2 > 0 THEN tf2 * ln(n_docs / df2) ELSE 0.0 END), 4) AS s_tfidf
      |  FROM feat, stats
      |  WHERE tf0 > 0 OR tf1 > 0 OR tf2 > 0),
      |ta AS (SELECT doc_id, row_number() OVER (ORDER BY s_bm25 DESC, doc_id) AS ra
      |  FROM scored QUALIFY ra <= 20),
      |tb AS (SELECT doc_id, row_number() OVER (ORDER BY s_tfidf DESC, doc_id) AS rb
      |  FROM scored QUALIFY rb <= 20)
      |SELECT coalesce(ta.doc_id, tb.doc_id) AS doc_id,
      |  round(coalesce(1.0 / (60 + ra), 0.0) + coalesce(1.0 / (60 + rb), 0.0), 6) AS rrf,
      |  coalesce(ra, 0) AS ra, coalesce(rb, 0) AS rb
      |FROM ta FULL OUTER JOIN tb ON ta.doc_id = tb.doc_id
      |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin

  /** Tokenizer fertility (subwords per word) per source under a fixed
    * 4-chars-per-subword budget — the capacity-planning number that
    * converts a word-count corpus estimate into a TRAINING-TOKEN
    * estimate (and flags sources whose long words will blow the
    * context budget). ceil(len/4) is a deterministic stand-in for a
    * BPE segmenter (the real vocabulary's merge table lives in
    * [[qTokenBpe]]); the shape — token explode, elementary per-token
    * arithmetic, per-source rollup — is exactly the production plan
    * with the segmenter swapped in. */
  def qTokenizerFertility(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = T.documents(spark, dir)
      .select($"source", explode(split($"text", " ")).as("t"))
      .withColumn("sub", ceil(length($"t") / lit(4.0)).cast("long"))
    words.groupBy($"source")
      .agg(count(lit(1)).as("n_words"),
        sum($"sub").as("n_subwords"),
        round(sum($"sub").cast("double") / count(lit(1)), 4).as("fertility"),
        round(avg(length($"t").cast("double")), 4).as("avg_word_len"))
      .orderBy($"source")
  }

  val qTokenizerFertilitySql: String =
    """WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS t FROM documents),
      |s AS (SELECT source, t, CAST(ceil(len(t) / 4.0) AS BIGINT) AS sub FROM w)
      |SELECT source, count(*)::BIGINT AS n_words, sum(sub)::BIGINT AS n_subwords,
      |  round(sum(sub)::DOUBLE / count(*), 4) AS fertility,
      |  round(avg(len(t)::DOUBLE), 4) AS avg_word_len
      |FROM s GROUP BY source ORDER BY source""".stripMargin

  /** Pairwise vocabulary Jaccard between sources — the corpus-mixing
    * diagnostic ("how much does crawl A's vocabulary overlap crawl
    * B's?") that informs dedup budgets and mixing temperatures. The
    * corpus reduces to the DISTINCT (source, token) relation first —
    * bounded by |sources| x |vocab|, saturating rather than
    * SF-scaling — so the token-keyed self-join that counts
    * intersections is bounded work at any corpus size; union sizes
    * come from the same relation via inclusion-exclusion. Top-15
    * most-overlapping pairs keep the output a report, not a dump. */
  def qSourceJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val st = T.documents(spark, dir)
      .select($"source", explode(split($"text", " ")).as("t"))
      .distinct()
      .cache() // per-source sizes + the intersection self-join
    val sizes = st.groupBy($"source").agg(count(lit(1)).as("v"))
    val inter = st.select($"source".as("src_a"), $"t")
      .join(st.select($"source".as("src_b"), $"t"), Seq("t"))
      .filter($"src_a" < $"src_b")
      .groupBy($"src_a", $"src_b").agg(count(lit(1)).as("i"))
    inter
      .join(broadcast(sizes.select($"source".as("src_a"), $"v".as("va"))), Seq("src_a"))
      .join(broadcast(sizes.select($"source".as("src_b"), $"v".as("vb"))), Seq("src_b"))
      .select($"src_a", $"src_b", $"i",
        round($"i".cast("double") / ($"va" + $"vb" - $"i"), 4).as("jaccard"))
      .orderBy(desc("jaccard"), asc("src_a"), asc("src_b"))
      .limit(15)
  }

  val qSourceJaccardSql: String =
    """WITH st AS (SELECT DISTINCT source, unnest(string_split(text, ' ')) AS t
      |  FROM documents),
      |sz AS (SELECT source, count(*)::BIGINT AS v FROM st GROUP BY 1),
      |it AS (SELECT a.source AS src_a, b.source AS src_b, count(*)::BIGINT AS i
      |  FROM st a JOIN st b ON a.t = b.t AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT src_a, src_b, i,
      |  round(i::DOUBLE / (sa.v + sb.v - i), 4) AS jaccard
      |FROM it JOIN sz sa ON sa.source = src_a JOIN sz sb ON sb.source = src_b
      |ORDER BY jaccard DESC, src_a, src_b LIMIT 15""".stripMargin

  /** Herfindahl-Hirschman concentration of the training mix: Σ share²
    * over source token shares (1/|sources| = perfectly balanced, 1 =
    * single-source), with the effective source count 1/HHI — the
    * one-number diversity check on a mixing plan. One aggregate to
    * per-source token counts, window total over the 20-row relation,
    * closed-form rollup. */
  def qHhiConcentration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perSource = T.documents(spark, dir)
      .select($"source", size(split($"text", " ")).cast("long").as("toks"))
      .groupBy($"source").agg(sum($"toks").as("n"))
    val all = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    perSource
      .withColumn("share", $"n".cast("double") / sum($"n").over(all))
      .agg(count(lit(1)).as("n_sources"),
        round(sum($"share" * $"share"), 6).as("hhi"),
        round(lit(1.0) / sum($"share" * $"share"), 2).as("effective_sources"))
  }

  val qHhiConcentrationSql: String =
    """WITH ps AS (SELECT source, sum(len(string_split(text, ' ')))::BIGINT AS n
      |  FROM documents GROUP BY 1),
      |sh AS (SELECT n::DOUBLE / sum(n) OVER () AS share FROM ps)
      |SELECT count(*)::BIGINT AS n_sources,
      |  round(sum(share * share), 6) AS hhi,
      |  round(1.0 / sum(share * share), 2) AS effective_sources
      |FROM sh""".stripMargin

  /** Good-Turing frequency-of-frequencies over trigrams: for counts
    * r = 1..10, the number of distinct trigrams seen exactly r times
    * (N_r), the smoothed count r* = (r+1)·N_{r+1}/N_r, each r's share
    * of corpus mass, and the missing-mass estimate P0 = N_1/N — the
    * classic unseen-event correction under every back-off LM.
    * Trigrams, not unigrams: the fixture's unigram vocabulary is
    * closed (every word frequent), while the trigram tail is where
    * singletons live — exactly the regime Good-Turing exists for. Two
    * nested hash aggregates reduce the corpus to the O(max count)
    * freq-of-freq relation; N_{r+1} is aligned by a self-join of that
    * bounded relation (no window, no gap bugs when some r is
    * absent). */
  def qGoodTuring(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = T.documents(spark, dir)
      .select(split($"text", " ").as("w"))
      .select($"w", explode(expr(
        "CASE WHEN size(w) >= 3 THEN sequence(1, size(w) - 2) ELSE array() END")).as("i"))
      .select(concat_ws(" ", expr("element_at(w, i)"),
        expr("element_at(w, i + 1)"), expr("element_at(w, i + 2)")).as("t"))
      .groupBy($"t").agg(count(lit(1)).as("r"))
    val fof = counts.groupBy($"r").agg(count(lit(1)).as("n_r")).cache()
    val tot = counts.agg(sum($"r").cast("double").as("n"))
    val n1 = fof.filter($"r" === 1)
      .agg(coalesce(sum($"n_r"), lit(0L)).cast("double").as("n1"))
    val next = fof.select(($"r" - 1).as("r"), $"n_r".as("n_r1"))
    fof.filter($"r" <= 10)
      .join(next, Seq("r"), "left")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(n1))
      .select($"r", $"n_r",
        round((($"r" + lit(1L)) * coalesce($"n_r1", lit(0L))).cast("double") / $"n_r", 6).as("r_star"),
        round(($"r" * $"n_r").cast("double") / $"n", 6).as("mass_share"),
        round($"n1" / $"n", 6).as("p0"))
      .orderBy($"r")
  }

  val qGoodTuringSql: String =
    """WITH tok AS (SELECT string_split(text, ' ') AS w FROM documents),
      |tri AS (SELECT unnest(list_transform(range(1, len(w) - 1), i ->
      |    w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS t
      |  FROM tok WHERE len(w) >= 3),
      |cnt AS (SELECT t, count(*)::BIGINT AS r FROM tri GROUP BY 1),
      |fof AS MATERIALIZED (SELECT r, count(*)::BIGINT AS n_r FROM cnt GROUP BY 1),
      |tot AS (SELECT sum(r)::DOUBLE AS n FROM cnt),
      |n1 AS (SELECT coalesce(sum(n_r), 0)::DOUBLE AS n1 FROM fof WHERE r = 1)
      |SELECT f.r, f.n_r,
      |  round(((f.r + 1) * coalesce(f2.n_r, 0))::DOUBLE / f.n_r, 6) AS r_star,
      |  round((f.r * f.n_r)::DOUBLE / tot.n, 6) AS mass_share,
      |  round(n1.n1 / tot.n, 6) AS p0
      |FROM fof f LEFT JOIN fof f2 ON f2.r = f.r + 1, tot, n1
      |WHERE f.r <= 10 ORDER BY f.r""".stripMargin

  /** Heaps'-law fit: vocabulary growth V = K·N^beta estimated from the
    * per-source (tokens, distinct-tokens) points by least squares in
    * log-log space — the planning constant that answers "how much new
    * vocabulary does another 10x of corpus buy". One explode + one
    * hash aggregate reduce the corpus to |sources| points; the fit is
    * closed-form sums over that bounded relation (the q_forecast
    * discipline — identical arithmetic on both engines). The fixture's
    * flat dictionary makes beta ~ 0, and a slope rounding to zero can
    * carry either IEEE sign depending on the engine's accumulation
    * order (+0.0 in Spark vs -0.0 in DuckDB at sf0.1 — a hash
    * mismatch on equal values); adding +0.0 AFTER the round
    * normalizes the signed zero in both engines. */
  def qHeapsLaw(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pts = T.documents(spark, dir)
      .select($"source", explode(split($"text", " ")).as("t"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_tok"), countDistinct($"t").as("vocab"))
      .select(log($"n_tok".cast("double")).as("x"),
        log($"vocab".cast("double")).as("y"))
    pts.agg(
        count(lit(1)).cast("double").as("m"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sx2"))
      .select($"m".cast("long").as("n_sources"),
        (round(($"m" * $"sxy" - $"sx" * $"sy") /
          ($"m" * $"sx2" - $"sx" * $"sx"), 4) + lit(0.0)).as("beta"),
        round(exp(($"sy" - ($"m" * $"sxy" - $"sx" * $"sy") /
          ($"m" * $"sx2" - $"sx" * $"sx") * $"sx") / $"m"), 4).as("k"))
  }

  val qHeapsLawSql: String =
    """WITH pts AS (
      |  SELECT ln(count(*)::DOUBLE) AS x,
      |    ln(count(DISTINCT t)::DOUBLE) AS y
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS t FROM documents)
      |  GROUP BY source),
      |s AS (SELECT count(*)::DOUBLE AS m, sum(x) AS sx, sum(y) AS sy,
      |    sum(x * y) AS sxy, sum(x * x) AS sx2 FROM pts)
      |SELECT m::BIGINT AS n_sources,
      |  round((m * sxy - sx * sy) / (m * sx2 - sx * sx), 4) + 0.0 AS beta,
      |  round(exp((sy - (m * sxy - sx * sy) / (m * sx2 - sx * sx) * sx) / m), 4) AS k
      |FROM s""".stripMargin

  /** One Viterbi iteration of unigram-LM tokenizer training (the
    * SentencePiece estimator, Kudo 2018) — the OTHER tokenizer-training
    * algorithm next to [[qBpeMerges]]'s merge rules: seed a candidate
    * vocabulary (every ≤4-char substring of every word), score pieces
    * by corpus frequency, Viterbi-segment each DISTINCT word under
    * those scores, and report the top-20 pieces by segmentation usage
    * — the expected-count signal the EM step would re-estimate from.
    *
    * Scale shape: everything after the first tokenize is
    * VOCABULARY-bounded, never corpus-bounded — words aggregate to a
    * distinct-word table (Heaps-law growth), candidate generation and
    * the DP both run in-array per distinct word, and corpus counts
    * re-enter only as multiplicities. The DP is one codegen'd
    * `aggregate` fold per word: position i's cell is the max over the
    * ≤4 admissible predecessors of dp[j] + logp(piece(j+1..i)),
    * carrying (value, backpointer) structs in the accumulator array
    * (single chars are always in vocab, so every position is
    * reachable); a second fold walks the backpointers to emit the
    * argmax segmentation. Tie-break pinned: equal path scores prefer
    * the LONGEST piece (min j), encoded as max over (v, -(s-1))
    * structs here and `first(s-1 ORDER BY v DESC, s)` in the oracle.
    * The top-200 multi-char piece carve and the final top-20 both ride
    * [[Skew.twoPhaseTopK]], so no window ever sees the unbounded piece
    * stream; the oracle replays the identical DP as a recursive CTE
    * (list state indexed by correlated subquery, NOT list lambdas —
    * the DuckDB 1.0.0 recursive-lambda corruption from the
    * q_pack_waste work applies here too). */
  /** Shared unigram-LM pipeline: (wordMap, scores). `wordMap` is the
    * distinct-word table with corpus count `c` and the word's own
    * piece→logp map `m` (only vocab pieces the word contains — ≤ 4 ×
    * word length entries); `scores` is the pruned-vocab score table.
    * Both ckpt'd/derived so the corpus parquet is scanned once. */
  /** Candidate pieces of a word column `w`: every substring of length
    * 1-4 (the training family's piece-length cap). */
  private val pieceArr = expr(
    """flatten(transform(sequence(1, length(w)), i ->
      |  filter(transform(array(1, 2, 3, 4), l ->
      |    IF(i + l - 1 <= length(w), substring(w, i, l), NULL)),
      |    x -> x IS NOT NULL)))""".stripMargin)

  private def uniPipeline(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val words = T.documents(spark, dir)
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("c"))
      .ckpt()
    val occ = words.select($"w", $"c", explode(pieceArr).as("p"))
    val freq = occ.groupBy($"p").agg(sum($"c").as("f")).ckpt()
    val top = Skew.twoPhaseTopK(freq.filter(length($"p") > 1), Seq(),
        Seq(desc("f"), asc("p")), k = 200, rankName = "__r")
      .drop("__r")
    val vocab = freq.filter(length($"p") === 1).unionByName(top)
    val fTot = vocab.agg(sum($"f").as("ftot"))
    val scores = vocab.crossJoin(broadcast(fTot))
      .select($"p", log($"f" / $"ftot").as("lp"))
      .ckpt()
    val wordMap = occ.select($"w", $"p").distinct()
      .join(broadcast(scores), Seq("p"))
      .groupBy($"w")
      .agg(map_from_entries(collect_list(struct($"p", $"lp"))).as("m"))
      .join(words, Seq("w"))
    (wordMap, scores)
  }

  /** The unigram DP's input relation (distinct words + their piece
    * maps) — exposed so ScaleSpec can pin that the per-word DP volume
    * is vocabulary-bounded, not corpus-bounded. */
  private[graft] def unigramDpWords(spark: SparkSession, dir: String): DataFrame =
    uniPipeline(spark, dir)._1

  /** Viterbi DP fold over one word: array of (v, j) structs, element k
    * = best path score for the k-1-char prefix and the NEGATED
    * backpointer that achieved it. `lookup(piece)` supplies the score
    * expression so the prune variant can knock one piece out. */
  private def uniStFold(lookup: String => String): String =
    s"""aggregate(
       |  sequence(1, length(w)),
       |  array(named_struct('v', CAST(0.0 AS DOUBLE), 'j', 0)),
       |  (acc, i) -> array_append(acc,
       |    array_max(transform(sequence(greatest(1, i - 3), i), s ->
       |      named_struct(
       |        'v', element_at(acc, s).v +
       |          coalesce(${lookup("substring(w, s, i - s + 1)")},
       |                   CAST(-1e18 AS DOUBLE)),
       |        'j', -(s - 1))))))""".stripMargin

  private val uniBaseLookup: String => String =
    piece => s"element_at(m, $piece)"

  /** Backtrack fold: walks `st`'s negated backpointers from the last
    * position down and emits the argmax segmentation's pieces. */
  private val uniPsFold: String =
    """aggregate(
      |  sequence(length(w), 1, -1),
      |  named_struct('cur', length(w), 'ps', CAST(array() AS ARRAY<STRING>)),
      |  (acc, i) -> IF(i = acc.cur,
      |    named_struct(
      |      'cur', -element_at(st, i + 1).j,
      |      'ps', array_append(acc.ps,
      |        substring(w, -element_at(st, i + 1).j + 1,
      |                  i + element_at(st, i + 1).j))),
      |    acc),
      |  acc -> acc.ps)""".stripMargin

  def qUnigramLm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (wordMap, scores) = uniPipeline(spark, dir)
    val segs = wordMap
      .withColumn("st", expr(uniStFold(uniBaseLookup)))
      .withColumn("ps", expr(uniPsFold))
      .select($"c", explode($"ps").as("p"))
    val usage = segs.groupBy($"p").agg(sum($"c").as("usage"))
    Skew.twoPhaseTopK(usage, Seq(), Seq(desc("usage"), asc("p")), k = 20,
        rankName = "rank")
      .join(broadcast(scores), Seq("p"))
      .select($"rank".cast("long").as("rank"), $"p".as("piece"), $"usage",
        round($"lp", 4).as("logp"))
      .orderBy($"rank")
  }

  /** The prune half of the unigram-LM training iteration: for the
    * top-10 multi-char pieces by Viterbi usage, the corpus
    * negative-log-likelihood INCREASE if that piece were removed from
    * the vocabulary — SentencePiece's prune criterion (it drops the
    * pieces whose removal costs least; single chars are never
    * candidates because they guarantee segmentability). Each
    * (word, piece) pair re-runs the SAME Viterbi fold with that one
    * piece's score knocked out (the `lookup` parameter of
    * [[uniStFold]]); pairs exist only where the word's own piece map
    * contains the piece, so the re-DP volume is (words containing a
    * top piece) x 10, vocabulary-bounded like everything else here. A
    * zero nll_gain is the algorithm's real signal — the piece has an
    * equal-cost alternative segmentation and would be pruned first
    * (the fixture's "co"/"lumn" pair re-segments as "colu"+"mn" at
    * identical cost). */
  def qUnigramPrune(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (wordMap, _) = uniPipeline(spark, dir)
    val base = wordMap
      .withColumn("st", expr(uniStFold(uniBaseLookup)))
      .withColumn("nll0", expr("element_at(st, length(w) + 1).v"))
      .withColumn("ps", expr(uniPsFold))
      .drop("st")
      .ckpt()
    val usage = base.select($"c", explode($"ps").as("p"))
      .groupBy($"p").agg(sum($"c").as("usage"))
    val top10 = Skew.twoPhaseTopK(usage.filter(length($"p") > 1), Seq(),
      Seq(desc("usage"), asc("p")), k = 10, rankName = "rank")
    val pruneLookup: String => String = piece =>
      s"IF($piece = rp, CAST(NULL AS DOUBLE), element_at(m, $piece))"
    val pairs = base
      .select($"w", $"c", $"m", $"nll0", explode(map_keys($"m")).as("rp"))
      .join(broadcast(top10.select($"p".as("rp"))), Seq("rp"))
      .withColumn("st1", expr(uniStFold(pruneLookup)))
      .select($"rp", ($"c" * ($"nll0" - expr("element_at(st1, length(w) + 1).v")))
        .as("gain"))
    pairs.groupBy($"rp").agg(sum($"gain").as("g"))
      .join(broadcast(top10), $"rp" === $"p")
      .select($"rank".cast("long").as("rank"), $"p".as("piece"), $"usage",
        round($"g", 4).as("nll_gain"))
      .orderBy($"rank")
  }

  val qUnigramPruneSql: String =
    """WITH RECURSIVE tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |words AS MATERIALIZED (SELECT w, count(*)::BIGINT AS c FROM tok WHERE len(w) > 0 GROUP BY w),
      |pos AS (SELECT w, c, unnest(range(1, len(w) + 1)) AS i FROM words),
      |pieces AS (SELECT w, c, substr(w, i, L) AS p
      |  FROM pos CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS L) ls
      |  WHERE i + L - 1 <= len(w)),
      |freq AS (SELECT p, CAST(sum(c) AS BIGINT) AS f FROM pieces GROUP BY p),
      |vocab AS (SELECT p, f FROM freq WHERE len(p) = 1
      |  UNION ALL
      |  SELECT p, f FROM (SELECT p, f FROM freq WHERE len(p) > 1 ORDER BY f DESC, p LIMIT 200)),
      |sc AS MATERIALIZED (SELECT p, ln(f::DOUBLE / (SELECT sum(f) FROM vocab)) AS lp FROM vocab),
      |wm AS MATERIALIZED (SELECT wp.w, map(list(wp.p ORDER BY wp.p), list(sc.lp ORDER BY wp.p)) AS m
      |  FROM (SELECT DISTINCT w, p FROM pieces) wp JOIN sc ON sc.p = wp.p
      |  GROUP BY wp.w),
      |walk(w, i, dp, bp) AS (
      |  SELECT w, 0::BIGINT, [0.0]::DOUBLE[], [0]::BIGINT[] FROM wm
      |  UNION ALL
      |  SELECT r.w, r.i + 1,
      |    list_append(r.dp, (SELECT max(t.dpv + coalesce(map_extract(wm.m, substr(r.w, t.s, r.i + 2 - t.s))[1], -1e18))
      |       FROM (SELECT unnest(r.dp) AS dpv, generate_subscripts(r.dp, 1) AS s) t
      |       WHERE t.s >= greatest(1, r.i - 2))),
      |    list_append(r.bp, (SELECT first(t.s - 1 ORDER BY t.dpv + coalesce(map_extract(wm.m, substr(r.w, t.s, r.i + 2 - t.s))[1], -1e18) DESC, t.s)
      |       FROM (SELECT unnest(r.dp) AS dpv, generate_subscripts(r.dp, 1) AS s) t
      |       WHERE t.s >= greatest(1, r.i - 2)))
      |  FROM walk r JOIN wm ON wm.w = r.w
      |  WHERE r.i < len(r.w)),
      |done AS MATERIALIZED (SELECT w, dp, bp, dp[len(w) + 1] AS nll0 FROM walk WHERE i = len(w)),
      |bt(w, cur, piece) AS (
      |  SELECT w, len(w)::BIGINT, NULL::VARCHAR FROM done
      |  UNION ALL
      |  SELECT b.w, d.bp[b.cur + 1],
      |    substr(b.w, d.bp[b.cur + 1] + 1, b.cur - d.bp[b.cur + 1])
      |  FROM bt b JOIN done d ON d.w = b.w
      |  WHERE b.cur > 0),
      |usage AS (SELECT piece AS p, CAST(sum(c) AS BIGINT) AS usage
      |  FROM bt JOIN words ON words.w = bt.w
      |  WHERE piece IS NOT NULL GROUP BY piece),
      |t10 AS MATERIALIZED (SELECT p, usage, row_number() OVER (ORDER BY usage DESC, p) AS rank
      |  FROM usage WHERE len(p) > 1 QUALIFY rank <= 10),
      |prs AS MATERIALIZED (SELECT wm.w, t10.p AS rp FROM wm JOIN t10 ON list_contains(map_keys(wm.m), t10.p)),
      |walk2(w, rp, i, dp) AS (
      |  SELECT w, rp, 0::BIGINT, [0.0]::DOUBLE[] FROM prs
      |  UNION ALL
      |  SELECT r.w, r.rp, r.i + 1,
      |    list_append(r.dp, (SELECT max(t.dpv + coalesce(
      |         CASE WHEN substr(r.w, t.s, r.i + 2 - t.s) = r.rp THEN NULL
      |              ELSE map_extract(wm.m, substr(r.w, t.s, r.i + 2 - t.s))[1] END, -1e18))
      |       FROM (SELECT unnest(r.dp) AS dpv, generate_subscripts(r.dp, 1) AS s) t
      |       WHERE t.s >= greatest(1, r.i - 2)))
      |  FROM walk2 r JOIN wm ON wm.w = r.w
      |  WHERE r.i < len(r.w)),
      |fin2 AS (SELECT w, rp, dp[len(w) + 1] AS v1 FROM walk2 WHERE i = len(w))
      |SELECT t10.rank AS rank, t10.p AS piece, t10.usage,
      |  round(sum(words.c * (done.nll0 - fin2.v1)), 4) AS nll_gain
      |FROM fin2 JOIN done ON done.w = fin2.w
      |  JOIN words ON words.w = fin2.w
      |  JOIN t10 ON t10.p = fin2.rp
      |GROUP BY 1, 2, 3 ORDER BY rank""".stripMargin

  /** SECOND EM iteration of unigram-LM training — the M-step
    * [[qUnigramLm]] stops short of, proving the training LOOP
    * composes (the claim q_knn_graph_churn makes for index
    * maintenance, made here for tokenizer training): piece scores are
    * RE-ESTIMATED from iteration-1's Viterbi segmentation counts
    * (hard-EM M-step: p(piece) ∝ usage, add-one smoothed over the
    * retained vocabulary so zero-usage single chars stay finite —
    * they must survive every round to guarantee segmentability;
    * zero-usage multi-char pieces drop, which is the estimator's
    * built-in prune), and Viterbi re-runs under the NEW scores. The
    * report is iteration-2's top-20 pieces with their re-estimated
    * log-probs next to the iteration-1 usage that produced them — the
    * convergence readout (stable top pieces ⇒ the vocabulary has
    * settled). Scale shape identical to iteration 1: everything after
    * the one tokenize is vocabulary-bounded; the M-step is one
    * aggregate over the |vocab|-row usage table; each word's
    * iteration-2 piece map rebuilds from its OWN iteration-1 map keys
    * (no re-tokenize, no second corpus scan). Oracle replays both
    * iterations as recursive CTEs. */
  /** Shared EM-iteration-2 pipeline: (base, scores2). `base` is the
    * iteration-1 Viterbi segmentation (word, count, piece map,
    * pieces); `scores2` is the hard-EM re-estimated vocabulary
    * (p, u1, lp) — every quantity derives from INTEGER usage counts
    * (u1, Σu1, |vocab|), so `lp` is bit-for-bit reproducible across
    * builds: the property [[materializeUniVocab]]'s stored==retrain
    * differential rests on. */
  private def uniEm2Pipeline(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val (wordMap, scores) = uniPipeline(spark, dir)
    val base = wordMap
      .withColumn("st", expr(uniStFold(uniBaseLookup)))
      .withColumn("ps", expr(uniPsFold))
      .drop("st")
      .ckpt()
    val usage1 = base.select($"c", explode($"ps").as("p"))
      .groupBy($"p").agg(sum($"c").as("u1"))
    // M-step vocabulary: pieces the Viterbi pass actually used, plus
    // every single char (segmentability floor)
    val vocab2 = scores.select($"p")
      .join(usage1, Seq("p"), "left")
      .select($"p", coalesce($"u1", lit(0L)).as("u1"))
      .filter($"u1" > 0 || length($"p") === 1)
      .ckpt()
    val tot2 = vocab2.agg(sum($"u1").as("ut"), count(lit(1)).as("v"))
    val scores2 = vocab2.crossJoin(broadcast(tot2))
      .select($"p", $"u1", log(($"u1" + 1).cast("double") / ($"ut" + $"v")).as("lp"))
      .ckpt()
    (base, scores2)
  }

  def qUnigramEm2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (base, scores2) = uniEm2Pipeline(spark, dir)
    val wordMap2 = base.select($"w", $"c", explode(map_keys($"m")).as("p"))
      .join(broadcast(scores2.select($"p", $"lp")), Seq("p"))
      .groupBy($"w")
      .agg(map_from_entries(collect_list(struct($"p", $"lp"))).as("m"),
        max($"c").as("c"))
    val segs2 = wordMap2
      .withColumn("st", expr(uniStFold(uniBaseLookup)))
      .withColumn("ps", expr(uniPsFold))
      .select($"c", explode($"ps").as("p"))
    val usage2 = segs2.groupBy($"p").agg(sum($"c").as("usage"))
    Skew.twoPhaseTopK(usage2, Seq(), Seq(desc("usage"), asc("p")), k = 20,
        rankName = "rank")
      .join(broadcast(scores2), Seq("p"))
      .select($"rank".cast("long").as("rank"), $"p".as("piece"), $"usage",
        $"u1".as("usage_prev"), round($"lp", 4).as("logp2"))
      .orderBy($"rank")
  }

  val qUnigramEm2Sql: String =
    """WITH RECURSIVE tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |words AS MATERIALIZED (SELECT w, count(*)::BIGINT AS c FROM tok WHERE len(w) > 0 GROUP BY w),
      |pos AS (SELECT w, c, unnest(range(1, len(w) + 1)) AS i FROM words),
      |pieces AS (SELECT w, c, substr(w, i, L) AS p
      |  FROM pos CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS L) ls
      |  WHERE i + L - 1 <= len(w)),
      |freq AS (SELECT p, CAST(sum(c) AS BIGINT) AS f FROM pieces GROUP BY p),
      |vocab AS (SELECT p, f FROM freq WHERE len(p) = 1
      |  UNION ALL
      |  SELECT p, f FROM (SELECT p, f FROM freq WHERE len(p) > 1 ORDER BY f DESC, p LIMIT 200)),
      |sc AS MATERIALIZED (SELECT p, ln(f::DOUBLE / (SELECT sum(f) FROM vocab)) AS lp FROM vocab),
      |wm AS MATERIALIZED (SELECT wp.w, map(list(wp.p ORDER BY wp.p), list(sc.lp ORDER BY wp.p)) AS m
      |  FROM (SELECT DISTINCT w, p FROM pieces) wp JOIN sc ON sc.p = wp.p
      |  GROUP BY wp.w),
      |walk(w, i, dp, bp) AS (
      |  SELECT w, 0::BIGINT, [0.0]::DOUBLE[], [0]::BIGINT[] FROM wm
      |  UNION ALL
      |  SELECT r.w, r.i + 1,
      |    list_append(r.dp, (SELECT max(t.dpv + coalesce(map_extract(wm.m, substr(r.w, t.s, r.i + 2 - t.s))[1], -1e18))
      |       FROM (SELECT unnest(r.dp) AS dpv, generate_subscripts(r.dp, 1) AS s) t
      |       WHERE t.s >= greatest(1, r.i - 2))),
      |    list_append(r.bp, (SELECT first(t.s - 1 ORDER BY t.dpv + coalesce(map_extract(wm.m, substr(r.w, t.s, r.i + 2 - t.s))[1], -1e18) DESC, t.s)
      |       FROM (SELECT unnest(r.dp) AS dpv, generate_subscripts(r.dp, 1) AS s) t
      |       WHERE t.s >= greatest(1, r.i - 2)))
      |  FROM walk r JOIN wm ON wm.w = r.w
      |  WHERE r.i < len(r.w)),
      |done AS MATERIALIZED (SELECT w, dp, bp FROM walk WHERE i = len(w)),
      |bt(w, cur, piece) AS (
      |  SELECT w, len(w)::BIGINT, NULL::VARCHAR FROM done
      |  UNION ALL
      |  SELECT b.w, d.bp[b.cur + 1],
      |    substr(b.w, d.bp[b.cur + 1] + 1, b.cur - d.bp[b.cur + 1])
      |  FROM bt b JOIN done d ON d.w = b.w
      |  WHERE b.cur > 0),
      |usage1 AS (SELECT piece AS p, CAST(sum(c) AS BIGINT) AS u1
      |  FROM bt JOIN words ON words.w = bt.w
      |  WHERE piece IS NOT NULL GROUP BY piece),
      |v2 AS MATERIALIZED (SELECT sc.p, coalesce(u.u1, 0)::BIGINT AS u1
      |  FROM sc LEFT JOIN usage1 u ON u.p = sc.p
      |  WHERE coalesce(u.u1, 0) > 0 OR len(sc.p) = 1),
      |sc2 AS MATERIALIZED (SELECT p, u1,
      |    ln((u1 + 1)::DOUBLE / ((SELECT sum(u1) FROM v2) + (SELECT count(*) FROM v2))) AS lp
      |  FROM v2),
      |wm2 AS MATERIALIZED (SELECT k.w, map(list(k.p ORDER BY k.p), list(sc2.lp ORDER BY k.p)) AS m
      |  FROM (SELECT w, unnest(map_keys(m)) AS p FROM wm) k JOIN sc2 ON sc2.p = k.p
      |  GROUP BY k.w),
      |walk2(w, i, dp, bp) AS (
      |  SELECT w, 0::BIGINT, [0.0]::DOUBLE[], [0]::BIGINT[] FROM wm2
      |  UNION ALL
      |  SELECT r.w, r.i + 1,
      |    list_append(r.dp, (SELECT max(t.dpv + coalesce(map_extract(wm2.m, substr(r.w, t.s, r.i + 2 - t.s))[1], -1e18))
      |       FROM (SELECT unnest(r.dp) AS dpv, generate_subscripts(r.dp, 1) AS s) t
      |       WHERE t.s >= greatest(1, r.i - 2))),
      |    list_append(r.bp, (SELECT first(t.s - 1 ORDER BY t.dpv + coalesce(map_extract(wm2.m, substr(r.w, t.s, r.i + 2 - t.s))[1], -1e18) DESC, t.s)
      |       FROM (SELECT unnest(r.dp) AS dpv, generate_subscripts(r.dp, 1) AS s) t
      |       WHERE t.s >= greatest(1, r.i - 2)))
      |  FROM walk2 r JOIN wm2 ON wm2.w = r.w
      |  WHERE r.i < len(r.w)),
      |done2 AS MATERIALIZED (SELECT w, dp, bp FROM walk2 WHERE i = len(w)),
      |bt2(w, cur, piece) AS (
      |  SELECT w, len(w)::BIGINT, NULL::VARCHAR FROM done2
      |  UNION ALL
      |  SELECT b.w, d.bp[b.cur + 1],
      |    substr(b.w, d.bp[b.cur + 1] + 1, b.cur - d.bp[b.cur + 1])
      |  FROM bt2 b JOIN done2 d ON d.w = b.w
      |  WHERE b.cur > 0),
      |usage2 AS (SELECT piece AS p, CAST(sum(c) AS BIGINT) AS usage
      |  FROM bt2 JOIN words ON words.w = bt2.w
      |  WHERE piece IS NOT NULL GROUP BY piece)
      |SELECT row_number() OVER (ORDER BY u.usage DESC, u.p) AS rank, u.p AS piece,
      |  u.usage, sc2.u1 AS usage_prev, round(sc2.lp, 4) AS logp2
      |FROM usage2 u JOIN sc2 ON sc2.p = u.p
      |ORDER BY u.usage DESC, u.p LIMIT 20""".stripMargin

  /** The EM-2 vocabulary WITHOUT the sidecar — the retrain side of
    * the stored==retrain differential (DedupTextSpec). */
  private[graft] def uniEm2Scores(spark: SparkSession, dir: String): DataFrame =
    uniEm2Pipeline(spark, dir)._2

  /** Version stamp for the stored unigram vocabulary: bumping it
    * invalidates sidecars built by older code (the
    * [[graft.ops.Similarity]] index-freshness discipline). */
  private val UniVocabVersion = 1

  /** Stored trained unigram-LM vocabulary of a fixture: the EM-2
    * piece scores (p, u1, lp) from [[uniEm2Pipeline]]. */
  def uniVocabSidecarPath(dir: String): String =
    Fixtures.sidecarPath(dir, "univocab")

  private def uniVocabFresh(path: String): Boolean =
    !sys.env.get("SPARK_GRAFT_REBUILD_INDEX").contains("1") &&
      new java.io.File(path, s"_GRAFT_UNIVOCAB_V$UniVocabVersion").isFile

  /** Build-once/serve-many for the TRAINED tokenizer (round-14
    * verdict task 3 — the tokenizer family's q_index_persist): the
    * EM-2 vocabulary materializes to [[uniVocabSidecarPath]] and every
    * serve pass ([[qUnigramApply]]) reads the STORED artifact instead
    * of retraining. The build is exactly reproducible — lp derives
    * from integer usage counts only — so stored == retrain is a
    * bit-equality check (TextSpec pins it). SPARK_GRAFT_REBUILD_INDEX=1
    * forces a rebuild. */
  def materializeUniVocab(spark: SparkSession, dir: String): String = {
    val path = uniVocabSidecarPath(dir)
    if (!uniVocabFresh(path)) {
      uniEm2Pipeline(spark, dir)._2
        .write.mode("overwrite").parquet(path)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(path, s"_GRAFT_UNIVOCAB_V$UniVocabVersion"), "")
    }
    path
  }

  def storedUniVocab(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(materializeUniVocab(spark, dir))

  /** Test hook: install an externally-trained vocabulary as `dir`'s
    * stored sidecar, stamped fresh at the current version. A
    * self-trained sidecar covers every character of its own corpus
    * (segmentability floor), so the serve passes' OOV/char-fallback
    * path is unreachable without serving under a vocab trained on a
    * DIFFERENT corpus — which is exactly the production shape
    * (frozen tokenizer, new shards). */
  private[graft] def installUniVocab(
      spark: SparkSession, vocab: DataFrame, dir: String): String = {
    val path = uniVocabSidecarPath(dir)
    vocab.write.mode("overwrite").parquet(path)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, s"_GRAFT_UNIVOCAB_V$UniVocabVersion"), "")
    path
  }

  /** Tokenizer SERVE pass — encode the whole corpus under the STORED
    * trained unigram vocabulary (round-14 verdict task 3: the family
    * had train-only; this is the pass a pipeline actually runs on
    * every new shard once the tokenizer is frozen). One corpus scan
    * reduces the text to (source, word, count); the Viterbi encode
    * then runs once per DISTINCT word against the broadcast stored
    * vocab (|vocab| ≤ #chars + 200 — KB-sized at any corpus scale) —
    * the same in-array DP fold as training ([[uniStFold]]), so at
    * 100 TB the encode cost is vocabulary x distinct-words bounded,
    * never corpus x DP. Per source it reports: fertility
    * (pieces/word — THE tokenizer-budget number), OOV-char rate
    * (chars with no vocab entry; 0 on the training corpus itself by
    * the segmentability floor, non-zero on unseen shards), the
    * piece-length mix, and the GPT-2-ish regex pre-tokenizer's
    * tokens/word ([[qTokenBpe]]'s n_bpe) as the untrained baseline in
    * the same row. A word with ZERO in-vocab pieces (every character
    * unseen at train time — possible on a genuinely new-script shard)
    * never enters the DP; it falls back to char-per-piece
    * (np = l1 = oovc = char count) via a left join against the full
    * word list, so it inflates fertility and the OOV rate instead of
    * silently vanishing from n_words (the r15 ADVICE blind spot: the
    * former inner join under-reported exactly the OOV drift this
    * family exists to detect). Oracle replays the DP as a recursive
    * CTE against the SAME stored sidecar ({UNIVOCAB} token) with the
    * same left-join fallback, so a green row proves the serve path,
    * not the training. */
  def qUnigramApply(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vocab = storedUniVocab(spark, dir).select($"p", $"lp")
    val srcWords = T.documents(spark, dir)
      .select($"source", explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"source", $"w").agg(count(lit(1)).as("c"))
      .ckpt()
    val words = srcWords.select($"w").distinct()
    val wordMap = words.select($"w", explode(pieceArr).as("p")).distinct()
      .join(broadcast(vocab), Seq("p"))
      .groupBy($"w")
      .agg(map_from_entries(collect_list(struct($"p", $"lp"))).as("m"))
    val wstatsDp = wordMap
      .withColumn("st", expr(uniStFold(uniBaseLookup)))
      .withColumn("ps", expr(uniPsFold))
      .select($"w",
        size($"ps").cast("long").as("np"),
        expr("size(filter(ps, x -> length(x) = 1))").cast("long").as("l1"),
        expr("size(filter(ps, x -> length(x) = 2))").cast("long").as("l2"),
        expr("size(filter(ps, x -> length(x) = 3))").cast("long").as("l3"),
        expr("size(filter(ps, x -> length(x) = 4))").cast("long").as("l4"),
        expr("""size(filter(transform(sequence(1, length(w)), i ->
          |  substring(w, i, 1)), ch -> element_at(m, ch) IS NULL))""".stripMargin)
          .cast("long").as("oovc"))
    // Piece-less words (zero in-vocab pieces ⇒ no known chars) fall
    // back to one OOV piece per character instead of dropping out.
    val wstats = words.join(wstatsDp, Seq("w"), "left")
      .select($"w",
        coalesce($"np", length($"w").cast("long")).as("np"),
        coalesce($"l1", length($"w").cast("long")).as("l1"),
        coalesce($"l2", lit(0L)).as("l2"),
        coalesce($"l3", lit(0L)).as("l3"),
        coalesce($"l4", lit(0L)).as("l4"),
        coalesce($"oovc", length($"w").cast("long")).as("oovc"),
        length($"w").cast("long").as("nc"))
    val bySrc = srcWords.join(wstats, Seq("w"))
      .groupBy($"source")
      .agg(sum($"c").as("n_words"),
        sum($"c" * $"np").as("n_pieces"),
        sum($"c" * $"l1").as("pieces_len1"),
        sum($"c" * $"l2").as("pieces_len2"),
        sum($"c" * $"l3").as("pieces_len3"),
        sum($"c" * $"l4").as("pieces_len4"),
        sum($"c" * $"oovc").as("oov_chars"),
        sum($"c" * $"nc").as("n_chars"))
    val bpe = T.documents(spark, dir)
      .groupBy($"source")
      .agg(sum(expr(
          "size(filter(regexp_extract_all(text, ' ?\\\\p{L}+| ?\\\\p{N}+| ?[^\\\\s\\\\p{L}\\\\p{N}]+|\\\\s+', 0), x -> x NOT RLIKE '^\\\\s+$'))")
          .cast("long")).as("n_bpe"),
        sum(size(split($"text", " ")).cast("long")).as("n_ws"))
    bySrc.join(bpe, Seq("source"))
      .select($"source", $"n_words", $"n_pieces",
        round($"n_pieces" / $"n_words", 4).as("fertility"),
        round($"oov_chars" / $"n_chars", 6).as("oov_char_rate"),
        $"pieces_len1", $"pieces_len2", $"pieces_len3", $"pieces_len4",
        round($"n_bpe" / $"n_ws", 4).as("bpe_tokens_per_word"))
      .orderBy($"source")
  }

  /** Tokenizer STALENESS trigger — the retrain decision completing the
    * family's build→serve→maintain lifecycle (the [[qUnigramApply]]
    * serve pass's q_pq_staleness analogue): the pending shard (the
    * last ~10% of doc ids, the count-proportional carve every
    * incremental lifecycle here uses) is encoded under the STORED
    * vocabulary and its fertility + OOV-char rate are compared
    * against the train-era slice under the SAME vocab. A shard whose
    * fertility ratio exceeds 1.1 or whose OOV rate exceeds 1% gets
    * `retrain = true` — the one-number nightly gate before paying a
    * full EM retrain. The decision compares doubles derived purely
    * from integer counts (piece/word/char tallies), so both engines
    * compute bit-identical ratios and the boundary needs no rounding
    * guard. One corpus scan splits word counts by era; the Viterbi
    * DP runs ONCE per distinct word (shared by both sides of the
    * comparison), vocab broadcast — at 100 TB the trigger costs one
    * tokenize plus a vocabulary x distinct-words DP, and only a true
    * trigger pays the retrain. Like [[qUnigramApply]], a word with
    * zero in-vocab pieces falls back to char-per-piece
    * (np = oovc = char count) through a left join, so an all-new-
    * script shard DRIVES the trigger instead of vanishing from it
    * (r15 ADVICE fix, mirrored in the oracle SQL). */
  def qUnigramStale(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vocab = storedUniVocab(spark, dir).select($"p", $"lp")
    val docs = T.documents(spark, dir).select($"doc_id", $"text")
    val cut = docs.agg((max($"doc_id") - (count(lit(1)) / 10).cast("long")).as("cut0"))
    val words = docs.crossJoin(broadcast(cut))
      .select(($"doc_id" > $"cut0").as("is_new"),
        explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(
        sum(when($"is_new", 1L).otherwise(0L)).as("c_new"),
        sum(when(!$"is_new", 1L).otherwise(0L)).as("c_old"))
      .ckpt()
    val wordMap = words.select($"w", explode(pieceArr).as("p")).distinct()
      .join(broadcast(vocab), Seq("p"))
      .groupBy($"w")
      .agg(map_from_entries(collect_list(struct($"p", $"lp"))).as("m"))
    val wstatsDp = wordMap
      .withColumn("st", expr(uniStFold(uniBaseLookup)))
      .withColumn("ps", expr(uniPsFold))
      .select($"w",
        size($"ps").cast("long").as("np"),
        expr("""size(filter(transform(sequence(1, length(w)), i ->
          |  substring(w, i, 1)), ch -> element_at(m, ch) IS NULL))""".stripMargin)
          .cast("long").as("oovc"))
    // Char-per-piece fallback for piece-less words (see qUnigramApply).
    val wstats = words.select($"w", $"c_new", $"c_old")
      .join(wstatsDp, Seq("w"), "left")
      .select($"w", $"c_new", $"c_old",
        coalesce($"np", length($"w").cast("long")).as("np"),
        coalesce($"oovc", length($"w").cast("long")).as("oovc"),
        length($"w").cast("long").as("nc"))
    wstats
      .agg(
        sum($"c_old").as("nwt"), sum($"c_old" * $"np").as("npt"),
        sum($"c_new").as("nws"), sum($"c_new" * $"np").as("nps"),
        sum($"c_new" * $"oovc").as("oovs"), sum($"c_new" * $"nc").as("ncs"))
      .select(
        $"nwt".as("n_words_train"), $"nws".as("n_words_shard"),
        round($"npt" / $"nwt", 4).as("fertility_train"),
        round($"nps" / $"nws", 4).as("fertility_shard"),
        round($"oovs" / $"ncs", 6).as("oov_char_rate_shard"),
        round(($"nps" / $"nws") / ($"npt" / $"nwt"), 4).as("fertility_ratio"),
        ((($"nps" / $"nws") / ($"npt" / $"nwt") > 1.1) ||
          ($"oovs" / $"ncs" > 0.01)).as("retrain"))
  }

  val qUnigramStaleSql: String =
    """WITH RECURSIVE sc AS MATERIALIZED (SELECT p, lp FROM read_parquet('{UNIVOCAB}/*.parquet')),
      |cut AS (SELECT max(doc_id) - (count(*) // 10) AS cut0 FROM documents),
      |tok AS (SELECT (doc_id > cut0) AS is_new,
      |    unnest(string_split(text, ' ')) AS w
      |  FROM documents, cut),
      |words AS MATERIALIZED (SELECT w,
      |    CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS c_new,
      |    CAST(sum(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT) AS c_old
      |  FROM tok WHERE len(w) > 0 GROUP BY w),
      |pos AS (SELECT w, unnest(range(1, len(w) + 1)) AS i FROM words),
      |pieces AS (SELECT w, substr(w, i, L) AS p
      |  FROM pos CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS L) ls
      |  WHERE i + L - 1 <= len(w)),
      |wm AS MATERIALIZED (SELECT wp.w, map(list(wp.p ORDER BY wp.p), list(sc.lp ORDER BY wp.p)) AS m
      |  FROM (SELECT DISTINCT w, p FROM pieces) wp JOIN sc ON sc.p = wp.p
      |  GROUP BY wp.w),
      |walk(w, i, dp, bp) AS (
      |  SELECT w, 0::BIGINT, [0.0]::DOUBLE[], [0]::BIGINT[] FROM wm
      |  UNION ALL
      |  SELECT r.w, r.i + 1,
      |    list_append(r.dp, (SELECT max(t.dpv + coalesce(map_extract(wm.m, substr(r.w, t.s, r.i + 2 - t.s))[1], -1e18))
      |       FROM (SELECT unnest(r.dp) AS dpv, generate_subscripts(r.dp, 1) AS s) t
      |       WHERE t.s >= greatest(1, r.i - 2))),
      |    list_append(r.bp, (SELECT first(t.s - 1 ORDER BY t.dpv + coalesce(map_extract(wm.m, substr(r.w, t.s, r.i + 2 - t.s))[1], -1e18) DESC, t.s)
      |       FROM (SELECT unnest(r.dp) AS dpv, generate_subscripts(r.dp, 1) AS s) t
      |       WHERE t.s >= greatest(1, r.i - 2)))
      |  FROM walk r JOIN wm ON wm.w = r.w
      |  WHERE r.i < len(r.w)),
      |done AS MATERIALIZED (SELECT w, dp, bp FROM walk WHERE i = len(w)),
      |bt(w, cur, piece) AS (
      |  SELECT w, len(w)::BIGINT, NULL::VARCHAR FROM done
      |  UNION ALL
      |  SELECT b.w, d.bp[b.cur + 1],
      |    substr(b.w, d.bp[b.cur + 1] + 1, b.cur - d.bp[b.cur + 1])
      |  FROM bt b JOIN done d ON d.w = b.w
      |  WHERE b.cur > 0),
      |wstat AS MATERIALIZED (SELECT w, count(piece)::BIGINT AS np
      |  FROM bt WHERE piece IS NOT NULL GROUP BY w),
      |oov AS (SELECT c.w, sum(CASE WHEN sc1.p IS NULL THEN 1 ELSE 0 END)::BIGINT AS oovc
      |  FROM (SELECT w, substr(w, i, 1) AS ch FROM pos) c
      |  LEFT JOIN (SELECT p FROM sc WHERE len(p) = 1) sc1 ON sc1.p = c.ch
      |  GROUP BY c.w),
      |agg AS (SELECT
      |    CAST(sum(c_old) AS BIGINT) AS nwt,
      |    CAST(sum(c_old * coalesce(np, len(words.w))) AS BIGINT) AS npt,
      |    CAST(sum(c_new) AS BIGINT) AS nws,
      |    CAST(sum(c_new * coalesce(np, len(words.w))) AS BIGINT) AS nps,
      |    CAST(sum(c_new * oovc) AS BIGINT) AS oovs,
      |    CAST(sum(c_new * len(words.w)) AS BIGINT) AS ncs
      |  FROM words LEFT JOIN wstat ON wstat.w = words.w JOIN oov ON oov.w = words.w)
      |SELECT nwt AS n_words_train, nws AS n_words_shard,
      |  round(npt::DOUBLE / nwt, 4) AS fertility_train,
      |  round(nps::DOUBLE / nws, 4) AS fertility_shard,
      |  round(oovs::DOUBLE / ncs, 6) AS oov_char_rate_shard,
      |  round((nps::DOUBLE / nws) / (npt::DOUBLE / nwt), 4) AS fertility_ratio,
      |  (((nps::DOUBLE / nws) / (npt::DOUBLE / nwt) > 1.1)
      |    OR (oovs::DOUBLE / ncs > 0.01)) AS retrain
      |FROM agg""".stripMargin

  val qUnigramApplySql: String =
    """WITH RECURSIVE sc AS MATERIALIZED (SELECT p, lp FROM read_parquet('{UNIVOCAB}/*.parquet')),
      |tok AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
      |srcw AS MATERIALIZED (SELECT source, w, count(*)::BIGINT AS c
      |  FROM tok WHERE len(w) > 0 GROUP BY 1, 2),
      |words AS MATERIALIZED (SELECT DISTINCT w FROM srcw),
      |pos AS (SELECT w, unnest(range(1, len(w) + 1)) AS i FROM words),
      |pieces AS (SELECT w, substr(w, i, L) AS p
      |  FROM pos CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS L) ls
      |  WHERE i + L - 1 <= len(w)),
      |wm AS MATERIALIZED (SELECT wp.w, map(list(wp.p ORDER BY wp.p), list(sc.lp ORDER BY wp.p)) AS m
      |  FROM (SELECT DISTINCT w, p FROM pieces) wp JOIN sc ON sc.p = wp.p
      |  GROUP BY wp.w),
      |walk(w, i, dp, bp) AS (
      |  SELECT w, 0::BIGINT, [0.0]::DOUBLE[], [0]::BIGINT[] FROM wm
      |  UNION ALL
      |  SELECT r.w, r.i + 1,
      |    list_append(r.dp, (SELECT max(t.dpv + coalesce(map_extract(wm.m, substr(r.w, t.s, r.i + 2 - t.s))[1], -1e18))
      |       FROM (SELECT unnest(r.dp) AS dpv, generate_subscripts(r.dp, 1) AS s) t
      |       WHERE t.s >= greatest(1, r.i - 2))),
      |    list_append(r.bp, (SELECT first(t.s - 1 ORDER BY t.dpv + coalesce(map_extract(wm.m, substr(r.w, t.s, r.i + 2 - t.s))[1], -1e18) DESC, t.s)
      |       FROM (SELECT unnest(r.dp) AS dpv, generate_subscripts(r.dp, 1) AS s) t
      |       WHERE t.s >= greatest(1, r.i - 2)))
      |  FROM walk r JOIN wm ON wm.w = r.w
      |  WHERE r.i < len(r.w)),
      |done AS MATERIALIZED (SELECT w, dp, bp FROM walk WHERE i = len(w)),
      |bt(w, cur, piece) AS (
      |  SELECT w, len(w)::BIGINT, NULL::VARCHAR FROM done
      |  UNION ALL
      |  SELECT b.w, d.bp[b.cur + 1],
      |    substr(b.w, d.bp[b.cur + 1] + 1, b.cur - d.bp[b.cur + 1])
      |  FROM bt b JOIN done d ON d.w = b.w
      |  WHERE b.cur > 0),
      |wstat AS MATERIALIZED (SELECT w,
      |    count(piece)::BIGINT AS np,
      |    sum(CASE WHEN len(piece) = 1 THEN 1 ELSE 0 END)::BIGINT AS l1,
      |    sum(CASE WHEN len(piece) = 2 THEN 1 ELSE 0 END)::BIGINT AS l2,
      |    sum(CASE WHEN len(piece) = 3 THEN 1 ELSE 0 END)::BIGINT AS l3,
      |    sum(CASE WHEN len(piece) = 4 THEN 1 ELSE 0 END)::BIGINT AS l4
      |  FROM bt WHERE piece IS NOT NULL GROUP BY w),
      |oov AS (SELECT c.w, sum(CASE WHEN sc1.p IS NULL THEN 1 ELSE 0 END)::BIGINT AS oovc
      |  FROM (SELECT w, substr(w, i, 1) AS ch FROM pos) c
      |  LEFT JOIN (SELECT p FROM sc WHERE len(p) = 1) sc1 ON sc1.p = c.ch
      |  GROUP BY c.w),
      |agg AS (SELECT srcw.source,
      |    CAST(sum(srcw.c) AS BIGINT) AS n_words,
      |    CAST(sum(srcw.c * coalesce(wstat.np, len(srcw.w))) AS BIGINT) AS n_pieces,
      |    CAST(sum(srcw.c * coalesce(wstat.l1, len(srcw.w))) AS BIGINT) AS pieces_len1,
      |    CAST(sum(srcw.c * coalesce(wstat.l2, 0)) AS BIGINT) AS pieces_len2,
      |    CAST(sum(srcw.c * coalesce(wstat.l3, 0)) AS BIGINT) AS pieces_len3,
      |    CAST(sum(srcw.c * coalesce(wstat.l4, 0)) AS BIGINT) AS pieces_len4,
      |    CAST(sum(srcw.c * oov.oovc) AS BIGINT) AS oov_chars,
      |    CAST(sum(srcw.c * len(srcw.w)) AS BIGINT) AS n_chars
      |  FROM srcw LEFT JOIN wstat ON wstat.w = srcw.w JOIN oov ON oov.w = srcw.w
      |  GROUP BY 1),
      |bpe AS (SELECT source,
      |    sum(len(list_filter(
      |      regexp_extract_all(text, ' ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'),
      |      x -> NOT regexp_matches(x, '^\s+$'))))::BIGINT AS n_bpe,
      |    sum(len(string_split(text, ' ')))::BIGINT AS n_ws
      |  FROM documents GROUP BY 1)
      |SELECT agg.source, n_words, n_pieces,
      |  round(n_pieces::DOUBLE / n_words, 4) AS fertility,
      |  round(oov_chars::DOUBLE / n_chars, 6) AS oov_char_rate,
      |  pieces_len1, pieces_len2, pieces_len3, pieces_len4,
      |  round(bpe.n_bpe::DOUBLE / bpe.n_ws, 4) AS bpe_tokens_per_word
      |FROM agg JOIN bpe ON bpe.source = agg.source
      |ORDER BY agg.source""".stripMargin

  val qUnigramLmSql: String =
    """WITH RECURSIVE tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |words AS MATERIALIZED (SELECT w, count(*)::BIGINT AS c FROM tok WHERE len(w) > 0 GROUP BY w),
      |pos AS (SELECT w, c, unnest(range(1, len(w) + 1)) AS i FROM words),
      |pieces AS (SELECT w, c, substr(w, i, L) AS p
      |  FROM pos CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS L) ls
      |  WHERE i + L - 1 <= len(w)),
      |freq AS (SELECT p, CAST(sum(c) AS BIGINT) AS f FROM pieces GROUP BY p),
      |vocab AS (SELECT p, f FROM freq WHERE len(p) = 1
      |  UNION ALL
      |  SELECT p, f FROM (SELECT p, f FROM freq WHERE len(p) > 1 ORDER BY f DESC, p LIMIT 200)),
      |sc AS MATERIALIZED (SELECT p, ln(f::DOUBLE / (SELECT sum(f) FROM vocab)) AS lp FROM vocab),
      |wm AS MATERIALIZED (SELECT wp.w, map(list(wp.p ORDER BY wp.p), list(sc.lp ORDER BY wp.p)) AS m
      |  FROM (SELECT DISTINCT w, p FROM pieces) wp JOIN sc ON sc.p = wp.p
      |  GROUP BY wp.w),
      |walk(w, i, dp, bp) AS (
      |  SELECT w, 0::BIGINT, [0.0]::DOUBLE[], [0]::BIGINT[] FROM wm
      |  UNION ALL
      |  SELECT r.w, r.i + 1,
      |    list_append(r.dp, (SELECT max(t.dpv + coalesce(map_extract(wm.m, substr(r.w, t.s, r.i + 2 - t.s))[1], -1e18))
      |       FROM (SELECT unnest(r.dp) AS dpv, generate_subscripts(r.dp, 1) AS s) t
      |       WHERE t.s >= greatest(1, r.i - 2))),
      |    list_append(r.bp, (SELECT first(t.s - 1 ORDER BY t.dpv + coalesce(map_extract(wm.m, substr(r.w, t.s, r.i + 2 - t.s))[1], -1e18) DESC, t.s)
      |       FROM (SELECT unnest(r.dp) AS dpv, generate_subscripts(r.dp, 1) AS s) t
      |       WHERE t.s >= greatest(1, r.i - 2)))
      |  FROM walk r JOIN wm ON wm.w = r.w
      |  WHERE r.i < len(r.w)),
      |done AS MATERIALIZED (SELECT w, dp, bp FROM walk WHERE i = len(w)),
      |bt(w, cur, piece) AS (
      |  SELECT w, len(w)::BIGINT, NULL::VARCHAR FROM done
      |  UNION ALL
      |  SELECT b.w, d.bp[b.cur + 1],
      |    substr(b.w, d.bp[b.cur + 1] + 1, b.cur - d.bp[b.cur + 1])
      |  FROM bt b JOIN done d ON d.w = b.w
      |  WHERE b.cur > 0),
      |usage AS (SELECT piece AS p, CAST(sum(c) AS BIGINT) AS usage
      |  FROM bt JOIN words ON words.w = bt.w
      |  WHERE piece IS NOT NULL GROUP BY piece)
      |SELECT row_number() OVER (ORDER BY usage DESC, u.p) AS rank, u.p AS piece,
      |  u.usage, round(sc.lp, 4) AS logp
      |FROM usage u JOIN sc ON sc.p = u.p
      |ORDER BY usage DESC, u.p LIMIT 20""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_unigram_lm", qUnigramLm, Some(qUnigramLmSql)),
    QueryDef("q_unigram_prune", qUnigramPrune, Some(qUnigramPruneSql)),
    // the M-step + second Viterbi pass: the training loop composes
    QueryDef("q_unigram_em2", qUnigramEm2, Some(qUnigramEm2Sql)),
    // tokenizer SERVE: corpus encode under the STORED trained vocab
    QueryDef("q_unigram_apply", qUnigramApply, Some(qUnigramApplySql)),
    // tokenizer MAINTAIN: shard-vs-train fertility/OOV retrain trigger
    QueryDef("q_unigram_stale", qUnigramStale, Some(qUnigramStaleSql)),
    QueryDef("q_good_turing", qGoodTuring, Some(qGoodTuringSql)),
    QueryDef("q_heaps_law", qHeapsLaw, Some(qHeapsLawSql)),
    QueryDef("q_source_jaccard", qSourceJaccard, Some(qSourceJaccardSql)),
    QueryDef("q_hhi_concentration", qHhiConcentration, Some(qHhiConcentrationSql)),
    QueryDef("q_tokenizer_fertility", qTokenizerFertility, Some(qTokenizerFertilitySql)),
    QueryDef("q_vocab_coverage", qVocabCoverage, Some(qVocabCoverageSql)),
    QueryDef("q_calibration", qCalibration, Some(qCalibrationSql)),
    QueryDef("q_rrf_fusion", qRrfFusion, Some(qRrfFusionSql)),
    QueryDef("q_readability", qReadability, Some(qReadabilitySql)),
    QueryDef("q_feature_hash_audit", qFeatureHashAudit, Some(qFeatureHashAuditSql)),
    QueryDef("q_log_odds_terms", qLogOddsTerms, Some(qLogOddsTermsSql)),
    QueryDef("q_chunk_overlap", qChunkOverlap, Some(qChunkOverlapSql)),
    QueryDef("q_cooccur_window", qCooccurWindow, Some(qCooccurWindowSql)),
    QueryDef("q_logreg_steps", qLogregSteps, Some(qLogregStepsSql)),
    QueryDef("q_auc_quality", qAucQuality, Some(qAucQualitySql)),
    QueryDef("q_pr_auc", qPrAuc, Some(qPrAucSql)),
    QueryDef("q_textrank", qTextrank, Some(qTextrankSql)),
    QueryDef("q_chao1", qChao1, Some(qChao1Sql)),
    QueryDef("q_ks_classifier", qKsClassifier, Some(qKsClassifierSql)),
    QueryDef("q_brier_score", qBrierScore, Some(qBrierScoreSql)),
    QueryDef("q_jsd_matrix", qJsdMatrix, Some(qJsdMatrixSql)),
    QueryDef("q_self_bleu", qSelfBleu, Some(qSelfBleuSql)),
    QueryDef("q_mutual_info", qMutualInfo, Some(qMutualInfoSql)),
    QueryDef("q_kneser_ney", qKneserNey, Some(qKneserNeySql)),
    QueryDef("q_tail_index", qTailIndex, Some(qTailIndexSql)),
    QueryDef("q_bpe_merges", qBpeMerges, Some(qBpeMergesSql)),
    // BPE training composed to depth 8 with the fertility trajectory
    QueryDef("q_bpe_train8", qBpeTrain8, Some(qBpeTrain8Sql)),
    QueryDef("q_bpe_apply", qBpeApply, Some(qBpeApplySql)),
    QueryDef("q_bpe_stale", qBpeStale, Some(qBpeStaleSql)),
    QueryDef("q_token_bpe", qTokenBpe, Some(qTokenBpeSql)),
    QueryDef("q_source_divergence", qSourceDivergence, Some(qSourceDivergenceSql)),
    QueryDef("q_bm25", qBm25, Some(qBm25Sql)),
    QueryDef("q_zipf_fit", qZipfFit, Some(qZipfFitSql)),
    QueryDef("q_perplexity", qPerplexity, Some(qPerplexitySql)),
    QueryDef("q_tfidf_sim", qTfidfSim, Some(qTfidfSimSql)),
    QueryDef("q_sample_hash", qSampleHash, Some(qSampleHashSql)),
    QueryDef("q_tfidf", qTfidf, Some(qTfidfSql)),
    QueryDef("q_token_entropy", qTokenEntropy, Some(qTokenEntropySql)),
    QueryDef("q_sample_stratified", qSampleStratified, Some(qSampleStratifiedSql)),
    QueryDef("q_token_stats", qTokenStats, Some(qTokenStatsSql)),
    QueryDef("q_token_freq", qTokenFreq, Some(qTokenFreqSql)),
    QueryDef("q_bigram_top", qBigramTop, Some(qBigramTopSql)),
    QueryDef("q_lang_stats", qLangStats, Some(qLangStatsSql)),
    QueryDef("q_quality_score", qQualityScore, Some(qQualityScoreSql)),
    QueryDef("q_lang_id", qLangId, Some(qLangIdSql)),
    QueryDef("q_lang_id_confusion", qLangIdConfusion, Some(qLangIdConfusionSql)),
    QueryDef("q_fingerprint", qFingerprint, Some(qFingerprintSql)),
  )
}
