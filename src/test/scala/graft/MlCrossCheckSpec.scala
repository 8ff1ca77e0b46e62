package graft

import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-validation of the hand-rolled MinHash+LSH dedup against Spark
  * ML's MinHashLSH approxSimilarityJoin: two independent
  * implementations agreeing on the planted near-dup pairs is strong
  * evidence neither is fooling the oracle. */
class MlCrossCheckSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ml MinHashLSH finds (at least) the pairs our LSH pipeline finds") {
    import spark.implicits._
    val ours = ops.Dedup.qDedupMinhash(spark, sf)
      .select($"a_id", $"b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val docs = ops.T.documents(spark, sf)
      .withColumn("w", split($"text", " "))
      .withColumn("shs", expr(
        "array_distinct(transform(slice(w, 1, size(w) - 2), (x, i) -> concat(x, ' ', element_at(w, i + 2), ' ', element_at(w, i + 3))))"))
      .select($"doc_id", $"shs")
    val cv = new CountVectorizer().setInputCol("shs").setOutputCol("features")
      .setBinary(true).fit(docs)
    val feats = cv.transform(docs)
    val mh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L).fit(feats)
    // jaccard distance 0.2 == jaccard similarity 0.8, our threshold
    val ml = mh.approxSimilarityJoin(feats, feats, 0.2, "dist")
      .select($"datasetA.doc_id".as("a"), $"datasetB.doc_id".as("b"))
      .filter($"a" < $"b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(ours.nonEmpty)
    val missed = ours -- ml
    // ml's LSH is approximate: allow at most one banding miss
    assert(missed.size <= 1,
      s"ml MinHashLSH missed ${missed.size} of ${ours.size} pairs: $missed")
    // and every pair ml found at <=0.2 distance should satisfy our exact
    // jaccard threshold too (ml verifies exactly inside the join)
    assert((ml -- ours).isEmpty,
      s"ml found pairs our pipeline missed: ${ml -- ours}")
  }
}
