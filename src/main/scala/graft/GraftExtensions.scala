package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BloomMightContain, CosineSimilarity, EditWithin1, HammingDistance, JaroWinkler}

/** SparkSessionExtensions entry point: registers the native expressions
  * as SQL functions, so `spark.sql("SELECT graft_cosine(a, b) ...")`
  * works on sessions built with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  *
  * [[GraftExtensions.register]] does the same for an already-running
  * session (the harness sessions are built by the driver, so the
  * queries use this form).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private type Builder = Seq[Expression] => Expression

  val definitions: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("graft_cosine",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    ("graft_hamming",
      new ExpressionInfo(classOf[HammingDistance].getName, "graft_hamming"),
      (es: Seq[Expression]) => HammingDistance(es(0), es(1))),
    ("graft_edit_within1",
      new ExpressionInfo(classOf[EditWithin1].getName, "graft_edit_within1"),
      (es: Seq[Expression]) => EditWithin1(es(0), es(1))),
    ("graft_jaro_winkler",
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (es: Seq[Expression]) => JaroWinkler(es(0), es(1))),
    // third arg k is a foldable int literal; default 5 when omitted
    ("graft_bloom_contains",
      new ExpressionInfo(classOf[BloomMightContain].getName, "graft_bloom_contains"),
      (es: Seq[Expression]) => BloomMightContain(es(0), es(1),
        if (es.length > 2) es(2).eval().asInstanceOf[Int] else 5)))

  /** Register the functions on an existing session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, _, builder) =>
      org.apache.spark.sql.GraftShims.registerFunction(spark, name, builder)
    }
}
