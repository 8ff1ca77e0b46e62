package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated quantiles WITHOUT a value buffer.
  *
  * Spark's exact `percentile` aggregate materializes every value of a
  * group inside one ObjectHashAggregate buffer, so its memory is
  * O(group size) — the one aggregation shape that cannot survive an
  * SF-scaled group at 100 TB. This primitive computes the identical
  * `quantile_cont` interpolation by BUCKETED RANK LOCATION (the plan
  * shape proven by [[Analytics.qMad]]):
  *
  *  1. per-key min/max/count — one hash aggregate, broadcast back;
  *  2. a 4096-bucket histogram — one map-side-combined hash aggregate
  *     of bounded size (≤ 4096 × |keys| rows);
  *  3. a cumulative-count pass over the tiny histogram locates, for
  *     each target rank, its bucket and within-bucket rank;
  *  4. `row_number` sorts ONLY the located buckets (~n/4096 rows
  *     each) and pulls the two values surrounding each continuous
  *     position pos = p·(n−1); `(1−frac)·lo + frac·hi` reproduces
  *     `percentile` / `quantile_cont` interpolation exactly (both
  *     `1.0 − frac` and `ceil(pos) − pos` are the correctly rounded
  *     double of the same exact value, so the weights are
  *     bit-identical to the built-in's).
  *
  * No per-group value buffer, no full-group sort: deeper groups only
  * widen the one located bucket. With empty `keyCols` the
  * histogram-sized cumulative window is partitionless but bounded at
  * 4096 rows — callers carry the PlanAuditSpec window-whitelist entry
  * documenting that bound.
  */
object Quantiles {

  /** Exact quantiles of `src0(valCol)` per `keyCols` group at the
    * positions `ps` (quantile_cont semantics, nulls ignored like the
    * built-in). Returns keyCols ++ (`p` double, `q` double, `n` long):
    * one row per key × position; `n` is the per-key non-null count so
    * callers needing it don't re-aggregate. `p`/`q`/`n` are the only
    * reserved caller-visible names — internals carry a `__q_` prefix
    * so arbitrary key-column names (incl. `k`, `v`, `b`) are safe. */
  def exact(src0: DataFrame, keyCols: Seq[String], valCol: String,
            ps: Seq[Double]): DataFrame = {
    val buckets = 4096L
    val keys = keyCols.map(col)
    val src = src0
      .filter(col(valCol).isNotNull)
      .select(keys :+ col(valCol).cast("double").as("__q_v"): _*)
      .cache()
    val grouped = if (keyCols.isEmpty) src.groupBy() else src.groupBy(keys: _*)
    val stats = grouped.agg(
        min(col("__q_v")).as("__q_vmin"), max(col("__q_v")).as("__q_vmax"),
        count(lit(1)).as("n"))
      .withColumn("__q_width",
        greatest((col("__q_vmax") - col("__q_vmin")) / buckets, lit(1e-12)))
    def withStats(df: DataFrame, s: DataFrame): DataFrame =
      if (keyCols.isEmpty) df.crossJoin(broadcast(s))
      else df.join(broadcast(s), keyCols)
    val bucketed = withStats(src, stats)
      .withColumn("__q_b",
        least(floor((col("__q_v") - col("__q_vmin")) / col("__q_width")),
          lit(buckets - 1)))
      .select(keys ++ Seq(col("__q_b"), col("__q_v")): _*)
    val hist = bucketed.groupBy(keys :+ col("__q_b"): _*)
      .agg(count(lit(1)).as("__q_c"))
    val wCum = (if (keyCols.isEmpty) Window.orderBy(col("__q_b"))
                else Window.partitionBy(keys: _*).orderBy(col("__q_b")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("__q_cum_end", sum(col("__q_c")).over(wCum))
      .withColumn("__q_cum_start", col("__q_cum_end") - col("__q_c"))
    // 0-indexed continuous position pos = p·(n−1); the two surrounding
    // 1-indexed ranks and the fractional interpolation weight. When
    // pos is integral the two ranks coincide and frac is 0.
    val ranks = stats
      .select(keys ++ Seq(col("n"),
        explode(array(ps.map(lit(_)): _*)).as("p")): _*)
      .withColumn("__q_pos", col("p") * (col("n") - 1).cast("double"))
      .withColumn("__q_frac", col("__q_pos") - floor(col("__q_pos")))
      .select(keys ++ Seq(col("n"), col("p"), col("__q_frac"),
        explode(array(
          struct((floor(col("__q_pos")) + 1).cast("long").as("__q_r"),
            lit("lo").as("__q_role")),
          struct(least(ceil(col("__q_pos")) + 1, col("n")).cast("long").as("__q_r"),
            lit("hi").as("__q_role")))).as("t")): _*)
      .select(keys ++ Seq(col("n"), col("p"), col("__q_frac"),
        col("t.__q_r").as("__q_r"), col("t.__q_role").as("__q_role")): _*)
    val joined =
      if (keyCols.isEmpty) cum.crossJoin(broadcast(ranks))
      else cum.join(broadcast(ranks), keyCols)
    val located = joined
      .filter(col("__q_r") > col("__q_cum_start") && col("__q_r") <= col("__q_cum_end"))
      .select(keys ++ Seq(col("__q_b"), (col("__q_r") - col("__q_cum_start")).as("__q_k"),
        col("n"), col("p"), col("__q_frac"), col("__q_role")): _*)
    val wanted = located.select(keys :+ col("__q_b"): _*).distinct()
    val wv = Window.partitionBy(keys :+ col("__q_b"): _*).orderBy(col("__q_v"))
    bucketed.join(broadcast(wanted), keyCols :+ "__q_b", "left_semi")
      .withColumn("__q_rn", row_number().over(wv))
      .join(broadcast(located), keyCols :+ "__q_b")
      .filter(col("__q_rn") === col("__q_k"))
      .groupBy(keys ++ Seq(col("n"), col("p"), col("__q_frac")): _*)
      .agg(max(when(col("__q_role") === "lo", col("__q_v"))).as("__q_vlo"),
        max(when(col("__q_role") === "hi", col("__q_v"))).as("__q_vhi"))
      .select(keys ++ Seq(col("p"),
        ((lit(1.0) - col("__q_frac")) * col("__q_vlo")
          + col("__q_frac") * col("__q_vhi")).as("q"),
        col("n")): _*)
  }
}
