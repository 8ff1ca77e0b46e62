package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  import SparkTestSession._

  test("repetition signals are valid ratios and the keep flag matches them") {
    val rows = ops.Curation.qRepetition(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dup = r.getAs[Double]("dup_token_ratio")
      val top = r.getAs[Double]("top_bigram_frac")
      assert(dup >= 0.0 && dup < 1.0)
      assert(top > 0.0 && top <= 1.0)
      assert(r.getAs[Boolean]("keep") === (top <= 0.1 && dup <= 0.7))
    }
  }

  test("contamination only reports train docs with real eval overlap") {
    val rows = ops.Curation.qContamination(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 20 != 0L, "eval docs must not self-report")
      assert(r.getAs[Long]("n_hits") >= 1L)
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_grams"))
      val rate = r.getAs[Double]("hit_rate")
      assert(rate > 0.0 && rate <= 1.0)
    }
  }

  test("bloom decontamination reproduces the exact overlap (zero false positives)") {
    val exact = ops.Curation.qContamination(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"), r.getAs[Long]("n_hits")))
    val bloom = ops.Curation.qContaminationBloom(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"), r.getAs[Long]("n_hits")))
    assert(bloom.nonEmpty)
    assert(bloom.toSeq === exact.toSeq)
  }

  test("bloom sketch + mightContain: inserted values hit, absent values miss") {
    import spark.implicits._
    val inserted = spark.range(0, 1000).select(xxhash64(concat(lit("v"), $"id")).as("h"))
    val sketch = inserted
      .agg(functions.Aggregators.bloomSketch(1 << 16, 5)($"h").as("bloom"))
    val probes = spark.range(0, 2000)
      .select($"id", xxhash64(concat(lit("v"), $"id")).as("h"))
      .crossJoin(broadcast(sketch))
      .select($"id", functions.F.bloomMightContain($"bloom", $"h", 5).as("hit"))
      .collect()
    probes.foreach { r =>
      val id = r.getAs[Long]("id")
      if (id < 1000) assert(r.getAs[Boolean]("hit"), s"inserted $id must hit")
    }
    // absent values may false-positive in principle; at n=1000, m=2^16,
    // k=5 the expected FP count over 1000 probes is << 1
    val fps = probes.count(r => r.getAs[Long]("id") >= 1000 && r.getAs[Boolean]("hit"))
    assert(fps === 0, s"unexpected false positives: $fps")
  }

  test("split assignment partitions all docs near the 90/5/5 carve") {
    val rows = ops.Curation.qSplitAssign(spark, sf).collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    val total = rows.values.sum
    assert(total === ops.T.documents(spark, sf).count())
    assert(rows.keySet === Set("train", "val", "test"))
    val trainFrac = rows("train").toDouble / total
    assert(trainFrac > 0.8 && trainFrac < 0.98, s"train frac $trainFrac")
  }

  test("similarity recall metrics stay within [0, 1]") {
    Seq(ops.Similarity.qSimLshRecall(spark, sf),
        ops.Similarity.qSimIvfRecall(spark, sf)).foreach { df =>
      val rows = df.collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val rec = r.getAs[Double]("recall")
        assert(rec >= 0.0 && rec <= 1.0)
      }
    }
  }

  test("domain mix shares and temperature weights each sum to 1") {
    val rows = ops.Curation.qDomainMix(spark, sf).collect()
    assert(rows.length > 1)
    val shares = rows.map(_.getAs[Double]("share"))
    val weights = rows.map(_.getAs[Double]("weight_t07"))
    assert(math.abs(shares.sum - 1.0) < 0.01)
    assert(math.abs(weights.sum - 1.0) < 0.01)
    // tau < 1 flattens the distribution: the weight spread is no wider
    // than the raw share spread
    assert(weights.max - weights.min <= shares.max - shares.min + 1e-9)
  }

  test("two-level packing prefix sum equals the naive global scan") {
    val rows = ops.Curation.qSeqPacking(spark, sf)
      .orderBy("doc_id").collect()
    assert(rows.nonEmpty)
    var cum = 0L
    rows.foreach { r =>
      val n = r.getAs[Int]("n_tokens").toLong
      assert(r.getAs[Long]("window_start") === cum / 512)
      assert(r.getAs[Long]("n_windows") === (cum + n - 1) / 512 - cum / 512 + 1)
      cum += n
    }
  }

  test("packing windows cover each document at least once and stay contiguous") {
    val rows = ops.Curation.qSeqPacking(spark, sf).orderBy("doc_id").collect()
    assert(rows.head.getAs[Long]("window_start") === 0L)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("window_start") >= a.getAs[Long]("window_start"))
      case _ =>
    }
    assert(rows.forall(_.getAs[Long]("n_windows") >= 1L))
  }

  test("cached hot paths keep their shared relations in memory") {
    // the rework promises single-computation plans: the shared exploded
    // token / shingle relations must appear as InMemoryRelation scans
    for (q <- Seq(
        ops.Text.qTfidf(spark, sf),
        ops.Text.qTokenEntropy(spark, sf),
        ops.Dedup.qDedupContainment(spark, sf),
        ops.Curation.qNgramNovelty(spark, sf))) {
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("InMemoryRelation"), s"expected cache in:\n$plan")
    }
  }

  test("epoch plan conserves the token budget and flags exactly the upsampled sources") {
    val rows = ops.Curation.qEpochMix(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalTokens = rows.map(_.getAs[Long]("n_tokens")).sum
    val targetSum = rows.map(_.getAs[Long]("target_tokens")).sum
    // targets are per-source rounded shares of a 2x-corpus budget
    assert(math.abs(targetSum - 2L * totalTokens) <= rows.length,
      s"targets $targetSum vs budget ${2L * totalTokens}")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("upsampled") ===
        (r.getAs[Long]("target_tokens") > r.getAs[Long]("n_tokens")))
      assert(r.getAs[Double]("epochs") > 0.0)
    }
  }

  test("domain resample keeps the floor source whole and never exceeds a source's tokens") {
    val session = spark
    import session.implicits._
    val bySource = ops.T.documents(spark, sf)
      .groupBy($"source")
      .agg(sum(size(split($"text", " "))).as("n_tokens"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val floor = bySource.values.min
    val rows = ops.Curation.qDomainResample(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("kept_tokens") <= bySource(src))
      assert(r.getAs[Long]("kept_docs") >= 1L)
    }
    val floorRow = rows.find(r => bySource(r.getAs[String]("source")) == floor).get
    // rate 1.0 accepts every doc of the smallest source (u < 1.0 always)
    assert(floorRow.getAs[Double]("rate") === 1.0)
    assert(floorRow.getAs[Long]("kept_tokens") === floor)
  }

  test("neyman allocation spends ~the budget and weights high-variance strata") {
    val rows = ops.Curation.qSampleNeyman(spark, sf).collect()
    assert(rows.nonEmpty)
    val alloc = rows.map(_.getAs[Long]("alloc")).sum
    assert(math.abs(alloc - 1000L) <= rows.length, s"allocated $alloc of 1000")
    rows.foreach { r =>
      assert(r.getAs[Double]("rate") >= 0.0)
      assert(r.getAs[Double]("sigma") >= 0.0)
    }
  }

  test("ngram novelty is a valid fraction and respects the dup complement") {
    val rows = ops.Curation.qNgramNovelty(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nov = r.getAs[Double]("novelty")
      assert(nov >= 0.0 && nov <= 1.0)
      assert(r.getAs[Long]("n_grams") >= 1L)
    }
  }

  test("weighted sample takes exactly k per language, deterministically") {
    val rows = ops.Curation.qSampleWeighted(spark, sf).collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (_, rs) =>
      // rk is 1..k contiguous, k <= 5, doc_ids distinct (no replacement)
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq === (1L to rs.length).toSeq)
      assert(rs.length <= 5)
      assert(rs.map(_.getAs[Long]("doc_id")).distinct.length === rs.length)
    }
    // content-hash keys: a re-run is bit-identical
    val again = ops.Curation.qSampleWeighted(spark, sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("bloom fpr audit: measured rate within an order of magnitude of theory") {
    val r = ops.Curation.qBloomFprAudit(spark, sf).collect().head
    val (meas, theory) = (r.getAs[Double]("fpr_measured"), r.getAs[Double]("fpr_theory"))
    assert(meas >= 0.0 && meas <= 1.0)
    assert(theory > 0.0 && theory < 1.0)
    // m = 4n, k = 5 -> theory ~ 0.19 at any SF; the exact-set simulation
    // should land near it (binomial noise on |non-members| trials)
    assert(meas <= theory * 3 + 0.05 && meas >= theory / 3 - 0.05,
      s"measured FPR $meas too far from theory $theory")
    assert(r.getAs[Long]("n_fp") <= r.getAs[Long]("n_nonmember"))
  }

  test("dsir selection: exactly k docs, counts bounded, steers toward the target lang") {
    val rows = ops.Curation.qDsirSelect(spark, sf).collect()
    assert(rows.map(_.getAs[String]("lang")).distinct.length === rows.length)
    val total = rows.map(_.getAs[Long]("n_corpus")).sum
    val selected = rows.map(_.getAs[Long]("n_selected")).sum
    assert(selected === 50L, "Gumbel-top-k must select exactly k docs")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_selected") <= r.getAs[Long]("n_corpus"))
    }
    // the point of DSIR: the selected sample's target-lang share must
    // exceed the corpus share (importance weights steer toward `en`)
    val en = rows.find(_.getAs[String]("lang") == "en").get
    val selShare = en.getAs[Long]("n_selected").toDouble / selected
    val corpShare = en.getAs[Long]("n_corpus").toDouble / total
    assert(selShare > corpShare,
      s"en selected share $selShare must beat corpus share $corpShare")
  }

  test("pack waste: window accounting exact, waste shrinks with context length, lower bound holds") {
    val rows = ops.Curation.qPackWaste(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("ctx_len")).toSeq === Seq(128L, 256L, 512L))
    val totalTok = ops.T.documents(spark, sf)
      .selectExpr("sum(size(split(text, ' ')))").head().getLong(0)
    rows.foreach { r =>
      val l = r.getAs[Long]("ctx_len")
      val wins = r.getAs[Long]("n_windows")
      val pad = r.getAs[Long]("pad_tokens")
      // exact conservation: windows hold exactly tokens + padding
      assert(wins * l === totalTok + pad,
        s"L=$l: $wins windows x $l != $totalTok tokens + $pad pad")
      assert(wins >= r.getAs[Long]("lb_windows"),
        s"L=$l: next-fit cannot beat the concat-and-chunk lower bound")
      assert(r.getAs[Double]("pad_frac") > 0.0 && r.getAs[Double]("pad_frac") < 0.5)
    }
    // larger windows amortize per-doc fragmentation on this corpus
    // (docs <= 100 tokens): waste fraction must not grow with L
    val fracs = rows.map(_.getAs[Double]("pad_frac"))
    assert(fracs(0) >= fracs(2) * 0.5,
      s"pad_frac sequence ${fracs.toSeq} looks inconsistent")
  }

  test("FFD packing: dominates next-fit per ctx_len, exact conservation with truncation explicit") {
    val nf = ops.Curation.qPackWaste(spark, sf).collect()
      .map(r => r.getAs[Long]("ctx_len") -> r.getAs[Long]("pad_tokens")).toMap
    val rows = ops.Curation.qPackWasteFfd(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("ctx_len")).toSeq === Seq(128L, 256L, 512L))
    val totalTok = ops.T.documents(spark, sf)
      .selectExpr("sum(size(split(text, ' ')))").head().getLong(0)
    rows.foreach { r =>
      val l = r.getAs[Long]("ctx_len")
      val wins = r.getAs[Long]("n_windows")
      val pad = r.getAs[Long]("pad_tokens")
      val trunc = r.getAs[Long]("trunc_tokens")
      // first-fit-decreasing can never waste more than next-fit: every
      // next-fit placement is available to first-fit, and the desc
      // sort only improves the fit profile within the same buckets
      assert(pad <= nf(l),
        s"L=$l: FFD pad $pad exceeds next-fit ${nf(l)} — not a first-fit fold")
      // exact conservation over the TRUNCATED token mass (round-12
      // advice: overflow tokens accounted, not vanished)
      assert(wins * l === (totalTok - trunc) + pad,
        s"L=$l: $wins x $l != ($totalTok - $trunc) + $pad")
      assert(trunc >= 0L && trunc < totalTok)
      assert(wins >= r.getAs[Long]("lb_windows"))
      assert(r.getAs[Double]("pad_frac") >= 0.0 && r.getAs[Double]("pad_frac") < 0.5)
    }
  }

  test("chunk-then-pack: zero token loss, driver replay matches, recovers what truncation drops") {
    val rows = ops.Curation.qPackChunked(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("ctx_len")).toSeq === Seq(128L, 256L, 512L))
    // the seeded input (natural docs + the 8 deterministic long docs)
    val seeds = Seq(-8L -> 640L, -7L -> 256L, -6L -> 95L, -5L -> 1024L,
      -4L -> 777L, -3L -> 517L, -2L -> 300L, -1L -> 150L)
    val natural = ops.T.documents(spark, sf)
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS LONG) AS n_tok")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val all = (natural ++ seeds).sortBy(_._1)
    val totalTok = all.map(_._2).sum
    // the chunk path must actually be exercised at every L
    assert(seeds.map(_._2).max > 512L)
    // full driver replay: per bucket (truncating integer division,
    // matching both engines), chunk each doc, next-fit the chunk stream
    def replay(l: Long): (Long, Long) = {
      val byBucket = all.groupBy { case (id, _) => id / 100 }
      var wins = 0L; var pad = 0L
      byBucket.toSeq.foreach { case (_, ds) =>
        val chunks = ds.sortBy(_._1).flatMap { case (_, t) =>
          Seq.fill((t / l).toInt)(l) ++ (if (t % l > 0) Seq(t % l) else Nil)
        }
        var fill = 0L
        chunks.foreach { c =>
          if (fill + c <= l) fill += c
          else { wins += 1; pad += l - fill; fill = c }
        }
        if (fill > 0) { wins += 1; pad += l - fill }
      }
      (wins, pad)
    }
    rows.foreach { r =>
      val l = r.getAs[Long]("ctx_len")
      val wins = r.getAs[Long]("n_windows")
      val pad = r.getAs[Long]("pad_tokens")
      val (rWins, rPad) = replay(l)
      assert((wins, pad) === ((rWins, rPad)),
        s"L=$l: query ($wins, $pad) != driver replay ($rWins, $rPad)")
      // the lossless twin's whole point: NOTHING dropped, so the
      // window identity closes over the RAW corpus token mass
      assert(r.getAs[Long]("token_loss") === 0L,
        s"L=$l: chunk-then-pack lost ${r.getAs[Long]("token_loss")} tokens")
      assert(r.getAs[Long]("total_tokens") === totalTok)
      assert(wins * l === totalTok + pad,
        s"L=$l: $wins x $l != $totalTok raw tokens + $pad pad")
      assert(wins >= r.getAs[Long]("lb_windows"))
      assert(r.getAs[Double]("pad_frac") >= 0.0 && r.getAs[Double]("pad_frac") < 0.5)
      // waste comparison vs the truncating next-fit over the SAME
      // seeded input: truncation discards trunc > 0 tokens here (the
      // seeds exceed every L), the chunked pack discards none and its
      // packed mass strictly exceeds the truncating pack's
      val trunc = all.map { case (_, t) => math.max(t - l, 0L) }.sum
      assert(trunc > 0L, s"L=$l: seeds failed to exceed the context length")
      assert(wins * l - pad > (totalTok - trunc) - 1,
        s"L=$l: chunked packed mass not above the truncating pack's")
    }
  }

  test("epoch expand: fills each source's target within doc granularity, upsamples past 1 epoch") {
    val rows = ops.Curation.qEpochExpand(spark, sf).collect()
    val nSources = ops.T.documents(spark, sf).select("source").distinct().count()
    assert(rows.length.toLong === nSources, "every source must survive expansion")
    rows.foreach { r =>
      val fill = r.getAs[Double]("fill")
      assert(fill > 0.85 && fill < 1.15,
        s"${r.getAs[String]("source")}: achieved/target fill $fill outside doc-granularity band")
      assert(r.getAs[Long]("max_copies") >= 1L)
      assert(r.getAs[Long]("achieved_tokens") > 0L)
    }
    // the 2x-budget mix must genuinely upsample at least one source
    // (more expanded rows than the source has docs)
    val docsBySource = ops.T.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.exists(r => r.getAs[Long]("n_rows") > docsBySource(r.getAs[String]("source"))),
      "expected at least one upsampled source under the 2x token budget")
  }

  test("split leakage: cross-split subset of the near-dup pairs, never same-split") {
    val splits = Set("train", "val", "test")
    val leaks = ops.Curation.qSplitLeakage(spark, sf).collect()
    leaks.foreach { r =>
      assert(splits.contains(r.getAs[String]("split_a")))
      assert(splits.contains(r.getAs[String]("split_b")))
      assert(r.getAs[String]("split_a") !== r.getAs[String]("split_b"))
      assert(r.getAs[Double]("jaccard") >= 0.8)
    }
    // leaks are exactly the near-dup pairs minus the same-split ones
    val pairs = ops.Dedup.qDedupMinhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val leakKeys = leaks.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(leakKeys.subsetOf(pairs))
    // exact-dup leakage is impossible by construction: identical text
    // hashes to the same split cell, so every leaked pair is j < 1 OR
    // a true near-dup with different text; structurally, a doc never
    // pairs with itself
    leaks.foreach(r => assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id")))
  }

  test("data card: one row per source, masses add up, entropy bounded by the lang space") {
    import org.apache.spark.sql.functions._
    val rows = ops.Curation.qDataCard(spark, sf).collect()
    val docs = ops.T.documents(spark, sf)
    assert(rows.length === docs.select("source").distinct().count().toInt)
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs === docs.count())
    val totalTok = rows.map(_.getAs[Long]("tokens")).sum
    val expectTok = docs.select(sum(size(split(col("text"), " ")).cast("long")))
      .collect().head.getLong(0)
    assert(totalTok === expectTok)
    val nLangs = docs.select("lang").distinct().count()
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_quality") > 0.0 &&
        r.getAs[Double]("avg_quality") <= 1.0)
      val ds = r.getAs[Double]("dup_share")
      assert(ds >= 0.0 && ds <= 1.0)
      val h = r.getAs[Double]("lang_entropy")
      assert(h >= -1e-9 && h <= math.log(nLangs.toDouble) + 1e-9,
        s"entropy $h outside [0, ln($nLangs)]")
    }
  }

  test("semantic decontamination: every train vector reported once, flags are the 3-sigma tail") {
    val rows = ops.Curation.qContaminationSemantic(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("vec_id") % 20 != 0L, "eval vectors must not self-report")
      assert(r.getAs[Long]("near_eval") % 20 === 0L, "nearest neighbor must be an eval vector")
      val c = r.getAs[Double]("max_cos")
      assert(c >= -1.0001 && c <= 1.0001)
    }
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length === rows.length)
    // the flag is the mean + 3 sd tail of max_cos: flagged rows, if any,
    // must all sit strictly above every unflagged row's score minus the
    // 4dp rounding grain
    val flagged = rows.filter(_.getAs[Boolean]("flagged")).map(_.getAs[Double]("max_cos"))
    val unflagged = rows.filterNot(_.getAs[Boolean]("flagged")).map(_.getAs[Double]("max_cos"))
    if (flagged.nonEmpty && unflagged.nonEmpty)
      assert(flagged.min >= unflagged.max - 1e-4)
  }

  test("shard mix audit: hash shards mix near the global blend, sorted shards are pure") {
    val rows = ops.Curation.qShardMixAudit(spark, sf).collect()
    val hash = rows.filter(_.getAs[String]("regime") == "hash")
    val sorted = rows.filter(_.getAs[String]("regime") == "sorted")
    assert(hash.nonEmpty && sorted.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") > 0L)
      val ts = r.getAs[Double]("top_share")
      assert(ts > 0.0 && ts <= 1.0)
      assert(r.getAs[Double]("kl") >= -1e-9, "KL divergence is non-negative")
    }
    // source-partitioned shards hold exactly one source each
    sorted.foreach(r => assert(r.getAs[Double]("top_share") === 1.0))
    // the shuffle buys mixing: hash-sharded KL sits strictly below the
    // source-partitioned regime on average
    def avgKl(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Double]("kl")).sum / rs.length
    assert(avgKl(hash) < avgKl(sorted))
    // every shard's mix shares sum to ~1 is implied by top_share <= 1;
    // shard counts: both regimes cover the whole corpus
    val n = ops.T.documents(spark, sf).count()
    assert(hash.map(_.getAs[Long]("n_docs")).sum === n)
    assert(sorted.map(_.getAs[Long]("n_docs")).sum === n)
  }
}
