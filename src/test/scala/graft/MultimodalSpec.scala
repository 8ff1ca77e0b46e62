package graft

import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("feature pipeline has the declared schema") {
    val df = ops.Multimodal.qMultimodalFeatures(spark, sf)
    val fields = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(fields("doc_id") === "bigint")
    assert(fields("format") === "string")
    assert(fields("width") === "int")
    assert(fields("height") === "int")
    assert(fields("features") === "array<double>")
  }

  test("stub decode is deterministic and covers every row") {
    val a = ops.Multimodal.qMultimodalFeatures(spark, sf).collect()
    val b = ops.Multimodal.qMultimodalFeatures(spark, sf).collect()
    assert(a.length === ops.T.documents(spark, sf).count())
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
  }

  test("features are 8-bin normalized histograms") {
    val rows = ops.Multimodal.qMultimodalFeatures(spark, sf).collect()
    rows.foreach { r =>
      val f = r.getAs[scala.collection.Seq[Double]]("features")
      assert(f.length === 8)
      val s = f.sum
      assert(s > 0.99 && s < 1.01, s"histogram sums to $s")
    }
  }

  test("metadata format tag agrees between meta query and feature pipeline") {
    import org.apache.spark.sql.functions._
    val meta = ops.Multimodal.qMultimodalMeta(spark, sf).select("doc_id", "format")
    val feat = ops.Multimodal.qMultimodalFeatures(spark, sf).select(
      col("doc_id"), col("format").as("f2"))
    val joined = meta.join(feat, "doc_id")
    assert(joined.filter(col("format") =!= col("f2")).count() === 0)
  }
}
