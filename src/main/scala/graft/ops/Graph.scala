package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph operators over the event-transition graph (north-star
  * scope: link-style analysis a curation pipeline uses to weight or
  * canonicalize interlinked sources).
  *
  * The graph is the Markov transition graph of `q_transitions`: nodes
  * are event types, edge weight = count of consecutive (from, to) pairs
  * across user timelines. The shapes here are the generic Pregel-style
  * iteration expressed in DataFrame joins — per iteration one edge-join
  * shuffle keyed on the source node, one aggregation keyed on the
  * destination, and a 1-row broadcast for global mass — which is the
  * plan that scales to web-graph node counts. Iteration count is fixed
  * (power iteration, k=3), so lineage stays bounded without
  * checkpointing; an open-ended convergence loop would add the eager
  * `localCheckpoint` per round that `q_dedup_clusters` uses.
  */
object Graph extends QueryFamily {

  private val D = 0.85

  /** Weighted PageRank, 3 power iterations, damping 0.85, dangling mass
    * redistributed uniformly. Rank contributions flow along edges
    * normalized by out-weight; everything is hash-keyed on node id —
    * no per-iteration driver actions, no collect. */
  def qPagerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = Relational.qTransitions(spark, dir)
      .select($"from_type".as("u"), $"to_type".as("v"), $"n")
      .cache()
    val nodes = edges.select($"u".as("t"))
      .union(edges.select($"v".as("t"))).distinct().cache()
    val nDf = nodes.agg(count(lit(1)).cast("double").as("n_nodes"))
    val outw = edges.groupBy($"u").agg(sum($"n").cast("double").as("w"))
    val p = edges.join(outw, "u")
      .select($"u", $"v", ($"n".cast("double") / $"w").as("p"))
      .cache()
    // dangling membership is iteration-invariant: compute it once and
    // carry the flag inside the rank relation, so each iteration's
    // dangling mass is a filter+agg, not another anti-join shuffle
    val sources = edges.select($"u").distinct()
    val nodeMeta = nodes
      .join(sources.select($"u".as("t"), lit(true).as("has_out")), Seq("t"), "left_outer")
      .select($"t", coalesce($"has_out", lit(false)).as("has_out"))
      .cache()

    var ranks = nodeMeta.crossJoin(broadcast(nDf))
      .select($"t", $"has_out", (lit(1.0) / $"n_nodes").as("r"))
    for (_ <- 1 to 3) {
      val dangling = ranks.filter(!$"has_out")
        .agg(coalesce(sum($"r"), lit(0.0)).as("dang"))
      val contrib = p.join(ranks, p("u") === ranks("t"))
        .groupBy($"v").agg(sum($"r" * $"p").as("c"))
      ranks = nodeMeta
        .join(contrib, nodeMeta("t") === contrib("v"), "left_outer")
        .crossJoin(broadcast(dangling))
        .crossJoin(broadcast(nDf))
        .select($"t", $"has_out",
          (lit(1.0 - D) / $"n_nodes"
            + lit(D) * (coalesce($"c", lit(0.0)) + $"dang" / $"n_nodes")).as("r"))
    }
    ranks.select($"t", round($"r", 6).as("rank")).orderBy($"t")
  }

  /** DuckDB twin: identical 3 unrolled iterations. */
  val qPagerankSql: String = {
    // one iteration: prev ranks CTE name -> next ranks SELECT
    def iter(prev: String): String =
      s"""SELECT n.t,
         |  (1 - 0.85) / (SELECT nn FROM nn)
         |    + 0.85 * (coalesce(c.s, 0) + d.dang / (SELECT nn FROM nn)) AS r
         |FROM nodes n
         |LEFT JOIN (SELECT p.v, sum($prev.r * p.p) AS s
         |           FROM p JOIN $prev ON $prev.t = p.u GROUP BY p.v) c ON c.v = n.t
         |CROSS JOIN (SELECT coalesce(sum(r), 0) AS dang FROM $prev
         |            WHERE t NOT IN (SELECT u FROM p)) d""".stripMargin
    s"""WITH ev AS (SELECT user_id, event_id, event_type, epoch_ns(ts)//1000 AS us FROM events),
       |seq AS (SELECT event_type,
       |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS next_type
       |  FROM ev),
       |e AS (SELECT event_type AS u, next_type AS v, count(*) AS n
       |      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
       |nodes AS (SELECT DISTINCT t FROM (SELECT u AS t FROM e UNION SELECT v FROM e)),
       |nn AS (SELECT count(*)::DOUBLE AS nn FROM nodes),
       |outw AS (SELECT u, sum(n)::DOUBLE AS w FROM e GROUP BY u),
       |p AS (SELECT e.u, e.v, e.n::DOUBLE / outw.w AS p FROM e JOIN outw ON outw.u = e.u),
       |r0 AS (SELECT t, 1.0 / (SELECT nn FROM nn) AS r FROM nodes),
       |r1 AS (${iter("r0")}),
       |r2 AS (${iter("r1")}),
       |r3 AS (${iter("r2")})
       |SELECT t, round(r, 6) AS rank FROM r3 ORDER BY t""".stripMargin
  }

  /** Degree / strength profile per node: in/out edge counts and
    * weighted in/out strength — one pass over the edge list, two
    * aggregations, full-outer merged so sinks and sources both
    * survive. The audit a graph build runs before any iteration. */
  def qGraphDegrees(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = Relational.qTransitions(spark, dir)
      .select($"from_type".as("u"), $"to_type".as("v"), $"n")
    val out = edges.groupBy($"u".as("t"))
      .agg(count(lit(1)).as("out_deg"), sum($"n").as("out_w"))
    val in = edges.groupBy($"v".as("t"))
      .agg(count(lit(1)).as("in_deg"), sum($"n").as("in_w"))
    out.join(in, Seq("t"), "full_outer")
      .select($"t",
        coalesce($"out_deg", lit(0L)).as("out_deg"),
        coalesce($"out_w", lit(0L)).as("out_w"),
        coalesce($"in_deg", lit(0L)).as("in_deg"),
        coalesce($"in_w", lit(0L)).as("in_w"))
      .orderBy($"t")
  }

  val qGraphDegreesSql: String =
    """WITH ev AS (SELECT user_id, event_id, event_type, epoch_ns(ts)//1000 AS us FROM events),
      |seq AS (SELECT event_type,
      |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS next_type
      |  FROM ev),
      |e AS (SELECT event_type AS u, next_type AS v, count(*) AS n
      |      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |o AS (SELECT u AS t, count(*) AS out_deg, sum(n) AS out_w FROM e GROUP BY u),
      |i AS (SELECT v AS t, count(*) AS in_deg, sum(n) AS in_w FROM e GROUP BY v)
      |SELECT coalesce(o.t, i.t) AS t,
      |  coalesce(out_deg, 0) AS out_deg, CAST(coalesce(out_w, 0) AS BIGINT) AS out_w,
      |  coalesce(in_deg, 0) AS in_deg, CAST(coalesce(in_w, 0) AS BIGINT) AS in_w
      |FROM o FULL OUTER JOIN i ON i.t = o.t
      |ORDER BY t""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_pagerank", qPagerank, Some(qPagerankSql)),
    QueryDef("q_graph_degrees", qGraphDegrees, Some(qGraphDegreesSql)))
}
