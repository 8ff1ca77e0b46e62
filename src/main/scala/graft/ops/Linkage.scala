package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity-resolution / record-linkage operator family (north-star
  * scope: the "same real-world entity, different byte strings" pass a
  * curation pipeline runs before joining sources — the fuzzy sibling
  * of the exact/MinHash dedup family in [[Dedup]]).
  *
  * Two canonical candidate-generation strategies, each with a bounded
  * candidate set by construction (never the record cross product):
  *
  *  - '''Sorted-neighborhood''' (`q_record_linkage`): sort records by a
  *    blocking signature, score only the w nearest neighbors in sort
  *    order — candidates are `w·N`, linear in the corpus. The global
  *    sort rank comes from [[Skew.globalRowNumber]] (range-partitioned,
  *    no single-task window) and the w-neighborhood is materialized as
  *    w shifted equi-joins on the rank (the "shifted zips" shape), so
  *    every stage is an equi-key shuffle at any scale.
  *  - '''Prefix-filter set-similarity join''' (`q_set_sim_join`): the
  *    AllPairs/PPJoin bound — order each record's token set by global
  *    rarity; two sets with Jaccard >= t must share a token in their
  *    first `l - ceil(t·l) + 1` rarest tokens, so the candidate join
  *    only touches those prefixes. Rare-first ordering keeps the
  *    prefix join keyed on low-frequency tokens (hot tokens fall out
  *    of prefixes), which is what bounds bucket sizes at 100 TB.
  *
  * Scoring kernels are engine-portable: [[graft.functions.JaroWinkler]]
  * (native codegen, bit-identical to the oracle's
  * `jaro_winkler_similarity`) and exact integer Jaccard
  * (`2·common >= union` — integer arithmetic, no rounding boundary).
  */
object Linkage extends QueryFamily {

  /** Sorted-neighborhood record linkage over the document corpus:
    * records are blocked by their 40-char lowercase prefix signature,
    * globally rank-ordered by (signature, doc_id), and each record is
    * scored against its 4 successors with Jaro-Winkler; pairs at
    * >= 0.92 link. Candidates are 4·N regardless of block skew — the
    * property that makes SNM the scale-safe alternative to key-equality
    * blocking when blocks can be pathologically hot. */
  def qRecordLinkage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val recs = T.documents(spark, dir)
      .select($"doc_id".as("pk"), substring(lower($"text"), 1, 40).as("nm"))
    // unique composite order => ranks are boundary-independent
    val ranked = Skew.globalRowNumber(recs, Seq($"nm", $"pk"), rankName = "rn")
      .cache() // consumed by 4 shifted joins; one materialization
    val left = ranked.select($"pk".as("a_id"), $"nm".as("a_nm"), $"rn")
    val pairs = (1 to 4).map { k =>
      val right = ranked
        .select($"pk".as("b_id"), $"nm".as("b_nm"), ($"rn" - k).as("rn"))
      left.join(right, "rn")
    }.reduce(_ union _)
    pairs
      .withColumn("jw", graft.functions.F.jaroWinkler($"a_nm", $"b_nm"))
      .filter($"jw" >= 0.92)
      .select($"a_id", $"b_id", round($"jw", 4).as("jw"))
      .orderBy($"a_id", $"b_id")
  }

  val qRecordLinkageSql: String =
    """WITH r AS (SELECT doc_id, substr(lower(text), 1, 40) AS nm,
      |    row_number() OVER (ORDER BY substr(lower(text), 1, 40), doc_id) AS rn
      |  FROM documents),
      |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |    jaro_winkler_similarity(a.nm, b.nm) AS jw
      |  FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 4)
      |SELECT a_id, b_id, round(jw, 4) AS jw FROM p
      |WHERE jw >= 0.92 ORDER BY a_id, b_id""".stripMargin

  /** Exact set-similarity self-join (Jaccard >= 0.5) over 4-token
    * shingle sets of the document corpus, with AllPairs prefix
    * filtering for candidate generation. Each doc's distinct shingles
    * are ordered rarest-first (global document frequency, token
    * tiebreak); only the first `l - ceil(0.5·l) + 1` of each doc enter
    * the candidate join (lemma: J(A,B) >= t implies the prefixes share
    * a token — the prefix is a superset of the (|x|-α+1)-prefix for
    * the pairwise overlap bound α = ceil(t·max(|A|,|B|))). Survivors
    * are verified with the exact integer test
    * `2·common >= |A|+|B|-common`, so the threshold has no
    * floating-point boundary. The per-doc ordering window is
    * doc-keyed (bounded by tokens-per-doc), and the verify join
    * touches candidate pairs only.
    *
    * The SHINGLE WIDTH is the selectivity knob that makes the prefix
    * lemma useful in practice: on this corpus's small vocabulary,
    * word BIGRAMS collide so heavily (~2.6k types over 5k docs at
    * sf0.1) that prefix buckets produced 16.5M candidate pairs — the
    * prefix filter was vacuous and the query ran 46 s. 4-token
    * shingles lift the type space to ~210k and candidates drop to
    * ~6.3k (measured), the regime AllPairs is designed for. Rule:
    * widen the shingle until signatures are selective, THEN prefix-
    * filter. */
  def qSetSimJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (docsArr, cand) = setSimParts(spark, dir)
    cand
      .join(docsArr.select($"doc_id".as("da"), $"arr".as("aa"), $"l".as("la")), Seq("da"))
      .join(docsArr.select($"doc_id".as("db"), $"arr".as("ab"), $"l".as("lb")), Seq("db"))
      .withColumn("common", size(array_intersect($"aa", $"ab")).cast("long"))
      .withColumn("un", $"la" + $"lb" - $"common")
      .filter($"common" * 2 >= $"un")
      .select($"da", $"db", $"common", $"un",
        round($"common" / $"un", 4).as("jacc"))
      .orderBy($"da", $"db")
  }

  /** The prefix-filter machinery split from [[qSetSimJoin]] so the
    * dedup serving-cost table ([[Dedup.qDedupServingCost]]) can
    * measure this family's candidate generation without re-verifying:
    * returns (docsArr = per-doc sorted shingle arrays with sizes,
    * cand = the AllPairs candidate pairs (da, db)). */
  private[graft] def setSimParts(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    // raw loader: measured 1.57 -> 1.81 s under the spread — the
    // distinct's own (doc_id, t) exchange already spreads the heavy
    // downstream passes, so the extra pre-explode exchange is net loss
    val toks = T.documents(spark, dir)
      .select($"doc_id", split(lower($"text"), " ").as("ws"))
      .select($"doc_id", explode(expr(
        """CASE WHEN size(ws) >= 4 THEN
          |  transform(sequence(0, size(ws) - 4), i ->
          |    concat(ws[i], ' ', ws[i + 1], ' ', ws[i + 2], ' ', ws[i + 3]))
          |ELSE array() END""".stripMargin)).as("t"))
      .distinct()
      .cache() // consumed by freq, prefix build, and the verify join
    // one row per doc: its sorted distinct 4-token-shingle ARRAY
    // (bounded by doc length, ~130 entries — never an unbounded value
    // buffer).
    // Verification is then a per-candidate array_intersect instead of
    // re-joining every candidate pair against every token of both
    // docs — the join that made the first cut of this query 46 s at
    // sf0.1 (|cand|·|doc| intermediate rows + two token shuffles).
    val docsArr = toks.groupBy($"doc_id")
      .agg(sort_array(collect_list($"t")).as("arr"),
        count(lit(1)).as("l"))
      .cache()
    val freq = toks.groupBy($"t").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy($"doc_id").orderBy($"df", $"t")
    val pref = toks.join(freq, "t")
      .withColumn("pos", row_number().over(wDoc))
      .join(docsArr.select($"doc_id", $"l"), "doc_id")
      .filter($"pos" <= $"l" - ceil($"l" * 0.5) + 1)
      .select($"doc_id", $"t")
    val cand = pref.as("x").join(pref.as("y"), Seq("t"))
      .filter($"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("da"), $"y.doc_id".as("db"))
      .distinct()
    (docsArr, cand)
  }

  val qSetSimJoinSql: String =
    """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      |tok AS (SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(1, len(ws) - 2), i ->
      |      ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3])) AS t
      |  FROM w WHERE len(ws) >= 4),
      |sz AS (SELECT doc_id, count(*) AS l FROM tok GROUP BY doc_id),
      |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS common
      |  FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT da, db, common, sa.l + sb.l - common AS un,
      |  round(common::DOUBLE / (sa.l + sb.l - common), 4) AS jacc
      |FROM pairs JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
      |WHERE 2 * common >= sa.l + sb.l - common
      |ORDER BY da, db""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_record_linkage", qRecordLinkage, Some(qRecordLinkageSql)),
    QueryDef("q_set_sim_join", qSetSimJoin, Some(qSetSimJoinSql)))
}
