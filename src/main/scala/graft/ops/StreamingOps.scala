package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming operator family over `events` (SURVEY.md §2 Tier B).
  *
  * The window/sessionization logic lives in transform functions that
  * accept ANY DataFrame — batch or streaming. The t2-checked queries
  * run them in batch (Spark guarantees identical semantics for
  * time-window aggregation in both modes); `StreamingSpec` runs the
  * same transforms on a `MemoryStream` with watermarks through
  * `writeStream`, covering the genuinely streaming-only behaviors
  * (incremental triggers, late-data drop, state cleanup).
  *
  * Scale notes: event-time windows aggregate with partial combine
  * before the shuffle keyed on (window, group); session windows key
  * state by user_id — at 100 TB the shuffle is bounded by the distinct
  * key count per trigger, and the watermark bounds state size.
  */
object StreamingOps extends QueryFamily {

  /** Tumbling 1-hour windows per event type. Works on batch or stream. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_micros(col("win.start")).as("win_start_us"), col("event_type"),
        col("n"), col("sum_value"))

  def qStreamTumbling(spark: SparkSession, dir: String): DataFrame =
    tumbling(T.events(spark, dir)).orderBy(col("win_start_us"), col("event_type"))

  val qStreamTumblingSql: String =
    """WITH e AS (SELECT event_type, value, make_timestamp(epoch_ns(ts)//1000) AS ts FROM events)
      |SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us, event_type,
      | count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM e GROUP BY 1, 2 ORDER BY win_start_us, event_type""".stripMargin

  /** Sliding 1-hour windows every 30 minutes: each event lands in two
    * overlapping windows. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("win.start")).as("win_start_us"), col("event_type"), col("n"))

  def qStreamSliding(spark: SparkSession, dir: String): DataFrame =
    sliding(T.events(spark, dir)).orderBy(col("win_start_us"), col("event_type"))

  val qStreamSlidingSql: String =
    """WITH e AS (SELECT event_type, epoch_ns(ts)//1000 AS us FROM events),
      |x AS (SELECT event_type, (us // 1800000000) * 1800000000 - i * 1800000000 AS win_start_us
      |      FROM e, range(0, 2) t(i))
      |SELECT win_start_us, event_type, count(*) AS n
      |FROM x GROUP BY 1, 2 ORDER BY win_start_us, event_type""".stripMargin

  /** Session windows with a 30-minute inactivity gap, per user. */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), unix_micros(col("win.start")).as("session_start_us"),
        col("n_events"), col("sum_value"))

  def qStreamSessions(spark: SparkSession, dir: String): DataFrame =
    sessions(T.events(spark, dir)).orderBy(col("user_id"), col("session_start_us"))

  /** Gaps-and-islands replication of Spark's session semantics: a new
    * session starts when the gap since the previous event is >= 30min
    * (a session's end is last-event + gap, exclusive). */
  val qStreamSessionsSql: String =
    """WITH e AS (SELECT user_id, value, epoch_ns(ts)//1000 AS us FROM events),
      |flagged AS (SELECT user_id, value, us,
      |  CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
      |         OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 1800000000
      |       THEN 1 ELSE 0 END AS new_session
      |  FROM e),
      |sess AS (SELECT user_id, value, us,
      |  sum(new_session) OVER (PARTITION BY user_id ORDER BY us
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged)
      |SELECT user_id, min(us) AS session_start_us, count(*) AS n_events,
      | round(sum(value), 2) AS sum_value
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin

  /** Stream-stream interval join: every purchase paired with the same
    * user's clicks from the preceding hour. Column names are disjoint
    * across the two sides (`p_*` vs `c_*`/`c_user`) so the transform
    * runs unchanged on two live streams, where Spark tracks both sides
    * in the state store and the event-time bound + watermarks let it
    * evict state (batch mode plans the same condition as an ordinary
    * equi-join on user with a residual time filter). The join shuffle
    * is keyed on user_id — high cardinality, so it shards evenly at
    * any scale; per-user pair counts are bounded by the 1-hour window.
    * `StreamingSpec` drives it with two MemoryStreams + watermarks. */
  def intervalJoin(purchases: DataFrame, clicks: DataFrame): DataFrame =
    purchases.join(
      clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))

  /** Left-outer variant of [[intervalJoin]]: purchases with NO click
    * in the trailing hour still emit, with null click columns. In
    * streaming mode the time bounds + both-side watermarks let the
    * engine know when a purchase can no longer match (watermark past
    * p_ts), so the outer row emits exactly once at state eviction —
    * the append-mode outer-join contract. Same user-keyed shuffle and
    * bounded state as the inner form. */
  def intervalJoinOuter(purchases: DataFrame, clicks: DataFrame): DataFrame =
    purchases.join(
      clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"),
      "left_outer")

  /** Batch replay of the outer join over the fixture events — the
    * attribution question "which purchases had NO prior-hour click"
    * answered by the same transform the stream runs. */
  def qStreamOuter(spark: SparkSession, dir: String): DataFrame = {
    val ev = T.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    intervalJoinOuter(p, c)
      .select(col("p_id"), col("c_id"),
        unix_micros(col("p_ts")).as("p_us"), unix_micros(col("c_ts")).as("c_us"))
      .orderBy(col("p_id"), col("c_id"))
  }

  val qStreamOuterSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |             make_timestamp(epoch_ns(ts)//1000) AS ts FROM events),
      | p AS (SELECT event_id AS p_id, user_id, ts AS p_ts FROM e WHERE event_type = 'purchase'),
      | c AS (SELECT event_id AS c_id, user_id AS c_user, ts AS c_ts FROM e WHERE event_type = 'click')
      |SELECT p_id, c_id, epoch_us(p_ts) AS p_us, epoch_us(c_ts) AS c_us
      |FROM p LEFT JOIN c ON user_id = c_user
      | AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts
      |ORDER BY p_id, c_id""".stripMargin

  def qStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = T.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    intervalJoin(p, c)
      .select(col("p_id"), col("c_id"),
        unix_micros(col("p_ts")).as("p_us"), unix_micros(col("c_ts")).as("c_us"))
      .orderBy(col("p_id"), col("c_id"))
  }

  val qStreamJoinSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |             make_timestamp(epoch_ns(ts)//1000) AS ts FROM events),
      | p AS (SELECT event_id AS p_id, user_id, ts AS p_ts FROM e WHERE event_type = 'purchase'),
      | c AS (SELECT event_id AS c_id, user_id AS c_user, ts AS c_ts FROM e WHERE event_type = 'click')
      |SELECT p_id, c_id, epoch_us(p_ts) AS p_us, epoch_us(c_ts) AS c_us
      |FROM p JOIN c ON user_id = c_user
      | AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts
      |ORDER BY p_id, c_id""".stripMargin

  /** Rows a 10-minute watermark would drop, replayed in batch.
    *
    * The fixture events are perfectly time-ordered, so genuine arrival
    * disorder is modeled the way it arises in production: per-source
    * ingestion lag. Each user shard trails by a deterministic offset
    * (`(user_id % 7) * 5min`), so arrival time = ts + shard lag, and
    * punctual shards advance the watermark past the laggards' event
    * times. With one event per trigger in arrival order, Spark's
    * watermark before a row is `max(event time of strictly earlier
    * arrivals) - delay`, and a stateful operator keyed on the event
    * time (e.g. `dropDuplicates` after `withWatermark`) discards the
    * row when `ts < watermark`. This transform computes exactly that
    * predicate; `StreamingSpec` asserts the engine's own
    * `numRowsDroppedByWatermark` equals it on the same feed.
    *
    * Scale shape: the strict-prefix running max over arrival order is
    * two-level — a per-chunk window (arrival time bucketed by hour)
    * plus a chunk-summary window over the tiny chunk relation
    * broadcast back — the same distributed prefix-scan as sequence
    * packing (ops/Curation.scala), never a single global-ORDER-BY
    * partition over the full stream history. */
  def lateDropped(events: DataFrame, delayUs: Long = 600000000L): DataFrame = {
    val e = events.select(col("event_id"), unix_micros(col("ts")).as("us"),
        (unix_micros(col("ts")) + (col("user_id") % 7) * lit(300000000L))
          .as("arr_us"))
      .withColumn("chunk", expr("arr_us div 3600000000"))
    val wLocal = Window.partitionBy(col("chunk"))
      .orderBy(col("arr_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wChunks = Window.orderBy(col("chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunkHw = e.groupBy(col("chunk")).agg(max(col("us")).as("cmax"))
      .withColumn("prev_hw", max(col("cmax")).over(wChunks))
      .select(col("chunk"), col("prev_hw"))
    e.withColumn("local_hw", max(col("us")).over(wLocal))
      .join(broadcast(chunkHw), Seq("chunk"))
      .withColumn("hw", greatest(
        coalesce(col("local_hw"), lit(Long.MinValue)),
        coalesce(col("prev_hw"), lit(Long.MinValue))))
      .filter(col("local_hw").isNotNull || col("prev_hw").isNotNull)
      .filter(col("us") < col("hw") - lit(delayUs))
      .select(col("event_id"), col("us"),
        (col("hw") - lit(delayUs)).as("wm_us"),
        (col("hw") - lit(delayUs) - col("us")).as("late_by_us"))
  }

  def qStreamLate(spark: SparkSession, dir: String): DataFrame =
    lateDropped(T.events(spark, dir)).orderBy(col("event_id"))

  val qStreamLateSql: String =
    """WITH e AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS us FROM events),
      |a AS (SELECT event_id, us, us + (user_id % 7) * 300000000 AS arr_us FROM e),
      |w AS (SELECT event_id, us,
      |  max(us) OVER (ORDER BY arr_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hw
      |  FROM a)
      |SELECT event_id, us, hw - 600000000 AS wm_us,
      |  hw - 600000000 - us AS late_by_us
      |FROM w WHERE us < hw - 600000000 ORDER BY event_id""".stripMargin

  /** Streaming dedup replayed in batch: what `dropDuplicates(user_id,
    * event_type)` emits on the arrival-ordered feed — the FIRST ARRIVAL
    * per key (at-least-once delivery collapses to exactly-once), under
    * the same per-source ingestion-lag arrival model as
    * [[lateDropped]]. The batch twin is a keyed window (min arrival per
    * key), distributed across keys; StreamingSpec replays the identical
    * feed through the real streaming operator and asserts the same
    * survivor set. */
  def dedupFirstArrival(events: DataFrame): DataFrame = {
    val e = events.select(col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"),
      (unix_micros(col("ts")) + (col("user_id") % 7) * lit(300000000L))
        .as("arr_us"))
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("arr_us"), col("event_id"))
    e.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("us"))
  }

  def qStreamDedup(spark: SparkSession, dir: String): DataFrame =
    dedupFirstArrival(T.events(spark, dir))
      .orderBy(col("user_id"), col("event_type"))

  val qStreamDedupSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts)//1000 AS us FROM events),
      |a AS (SELECT *, us + (user_id % 7) * 300000000 AS arr_us FROM e),
      |r AS (SELECT user_id, event_type, event_id, us,
      |  row_number() OVER (PARTITION BY user_id, event_type
      |                     ORDER BY arr_us, event_id) AS rn
      |  FROM a)
      |SELECT user_id, event_type, event_id, us FROM r WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  /** Stream-static enrichment: the event stream joined to a broadcast
    * dimension (customer segment), then window-aggregated per segment.
    * In streaming mode the static side is planned as a broadcast hash
    * join rebuilt per trigger — no stream-side state, no shuffle of
    * the stream beyond the windowed aggregation itself. Works on batch
    * or stream input (StreamingSpec runs the stream side). */
  def staticEnrich(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .join(broadcast(dim), events("user_id") === dim("c_custkey"))
      .groupBy(window(col("ts"), "1 hour").as("win"), col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_micros(col("win.start")).as("win_start_us"),
        col("segment"), col("n"), col("sum_value"))

  def qStreamStatic(spark: SparkSession, dir: String): DataFrame =
    staticEnrich(T.events(spark, dir),
      T.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment")))
      .orderBy(col("win_start_us"), col("segment"))

  val qStreamStaticSql: String =
    """WITH e AS (SELECT user_id, value,
      |             make_timestamp(epoch_ns(ts)//1000) AS ts FROM events),
      |j AS (SELECT c_mktsegment AS segment, date_trunc('hour', ts) AS win, value
      |      FROM e JOIN customer ON user_id = c_custkey)
      |SELECT epoch_us(win) AS win_start_us, segment, count(*) AS n,
      |  round(sum(value), 2) AS sum_value
      |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Hourly per-type revenue — the streamable aggregation under the
    * windowed top-k. */
  def hourlyRevenue(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(round(sum(col("value")), 2).as("rev"))
      .select(unix_micros(col("win.start")).as("win_start_us"),
        col("event_type"), col("rev"))

  /** Rank stage of the windowed top-k, applied DOWNSTREAM of the
    * streaming aggregate: Spark (correctly) refuses rank windows on a
    * streaming relation, so production ranks each trigger's
    * complete-mode state in foreachBatch / on the sink table — which
    * is exactly how the StreamingSpec parity test runs it. Batch and
    * stream share this function, so the ranking semantics cannot
    * drift between the two paths. */
  def topkOf(hourly: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("win_start_us"))
      .orderBy(desc("rev"), asc("event_type"))
    hourly.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
  }

  /** Top-3 event types per tumbling hour by revenue — the windowed
    * leaderboard (trending topics / top sellers per window), the
    * canonical two-stage streaming top-k: incremental time-window
    * aggregation feeding a bounded rank over |types| rows per
    * window. */
  def qStreamTopk(spark: SparkSession, dir: String): DataFrame =
    topkOf(hourlyRevenue(T.events(spark, dir)))
      .orderBy(col("win_start_us"), col("rank"))

  val qStreamTopkSql: String =
    """WITH e AS (SELECT event_type, value,
      |             make_timestamp(epoch_ns(ts)//1000) AS ts FROM events),
      |h AS (SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us, event_type,
      |        round(sum(value), 2) AS rev
      |      FROM e GROUP BY 1, 2),
      |r AS (SELECT win_start_us, event_type, rev,
      |        row_number() OVER (PARTITION BY win_start_us
      |          ORDER BY rev DESC, event_type) AS rank
      |      FROM h)
      |SELECT win_start_us, event_type, rev, rank FROM r
      |WHERE rank <= 3 ORDER BY win_start_us, rank""".stripMargin

  /** Online near-dup ADMISSION — the ingest-time twin of the LSH dedup
    * family: a document is admitted iff NONE of its 4 production band
    * signatures ([[Dedup.docBands]]) was seen on any earlier document
    * (arrival order = doc_id). The state an online system keeps is
    * every seen bandsig (kept or dropped), which makes the decision
    * BOUNDARY-INVARIANT: replaying the corpus in any micro-batch
    * split against a running band-state table admits exactly this set
    * (StreamingSpec proves it over a 3-batch replay) — so the oracle
    * is one batch query: per band bucket take the min doc_id, a doc
    * collides iff any of its buckets has an earlier arrival. Banding-
    * only (no exact-Jaccard verify): at ingest the earlier doc's
    * shingles are gone, signatures are all the state there is — this
    * admits fewer docs than verified dedup (FP collisions drop
    * borderline docs), the standard ingest trade. Scale: state is
    * 4 signatures per admitted doc keyed by bandsig — one hash lookup
    * shuffle per ingest batch. */
  def nearDupAdmit(bands: DataFrame): DataFrame = {
    val first = bands.groupBy(col("b"), col("bandsig"))
      .agg(min(col("doc_id")).as("first_id"))
    bands.join(first, Seq("b", "bandsig"))
      .groupBy(col("doc_id"))
      .agg(max((col("first_id") < col("doc_id")).cast("int")).as("collided"))
      .filter(col("collided") === 0)
      .select(col("doc_id"))
  }

  /** The operator's universe is EVERY document: docs too short to
    * shingle (< 3 tokens) produce no band rows, carry no signature
    * state to collide on, and are therefore ADMITTED — the round-11
    * advice fix for an admission operator that silently dropped
    * unshingleable docs from its universe (both engines apply the
    * identical rule: a doc is rejected iff one of its band signatures
    * has an earlier arrival). */
  def qStreamNeardup(spark: SparkSession, dir: String): DataFrame = {
    val bands = Dedup.docBands(spark, dir)
    val unshingleable = T.documents(spark, dir).select(col("doc_id"))
      .join(bands.select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti")
    nearDupAdmit(bands).unionByName(unshingleable).orderBy(col("doc_id"))
  }

  val qStreamNeardupSql: String =
    s"""${Dedup.minhashCteShared},
       |first AS (SELECT b, bandsig, min(doc_id) AS first_id
       |  FROM bands GROUP BY 1, 2),
       |collided AS (SELECT ba.doc_id,
       |    max(CASE WHEN f.first_id < ba.doc_id THEN 1 ELSE 0 END) AS collided
       |  FROM bands ba JOIN first f ON f.b = ba.b AND f.bandsig = ba.bandsig
       |  GROUP BY ba.doc_id)
       |SELECT d.doc_id FROM documents d
       |LEFT JOIN collided c ON c.doc_id = d.doc_id
       |WHERE coalesce(c.collided, 0) = 0 ORDER BY d.doc_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_stream_neardup", qStreamNeardup, Some(qStreamNeardupSql)),
    QueryDef("q_stream_topk", qStreamTopk, Some(qStreamTopkSql)),
    QueryDef("q_stream_static", qStreamStatic, Some(qStreamStaticSql)),
    QueryDef("q_stream_tumbling", qStreamTumbling, Some(qStreamTumblingSql)),
    QueryDef("q_stream_sliding", qStreamSliding, Some(qStreamSlidingSql)),
    QueryDef("q_stream_sessions", qStreamSessions, Some(qStreamSessionsSql)),
    QueryDef("q_stream_join", qStreamJoin, Some(qStreamJoinSql)),
    QueryDef("q_stream_outer", qStreamOuter, Some(qStreamOuterSql)),
    QueryDef("q_stream_late", qStreamLate, Some(qStreamLateSql)),
    QueryDef("q_stream_dedup", qStreamDedup, Some(qStreamDedupSql)),
  )
}
