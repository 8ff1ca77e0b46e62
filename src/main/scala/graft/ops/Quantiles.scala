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
    * callers needing it don't re-aggregate. */
  def exact(src0: DataFrame, keyCols: Seq[String], valCol: String,
            ps: Seq[Double]): DataFrame = {
    val buckets = 4096L
    val keys = keyCols.map(col)
    val src = src0
      .filter(col(valCol).isNotNull)
      .select(keys :+ col(valCol).cast("double").as("v"): _*)
      .cache()
    val grouped = if (keyCols.isEmpty) src.groupBy() else src.groupBy(keys: _*)
    val stats = grouped.agg(
        min(col("v")).as("vmin"), max(col("v")).as("vmax"),
        count(lit(1)).as("n"))
      .withColumn("width",
        greatest((col("vmax") - col("vmin")) / buckets, lit(1e-12)))
    def withStats(df: DataFrame, s: DataFrame): DataFrame =
      if (keyCols.isEmpty) df.crossJoin(broadcast(s))
      else df.join(broadcast(s), keyCols)
    val bucketed = withStats(src, stats)
      .withColumn("b",
        least(floor((col("v") - col("vmin")) / col("width")),
          lit(buckets - 1)))
      .select(keys ++ Seq(col("b"), col("v")): _*)
    val hist = bucketed.groupBy(keys :+ col("b"): _*)
      .agg(count(lit(1)).as("c"))
    val wCum = (if (keyCols.isEmpty) Window.orderBy(col("b"))
                else Window.partitionBy(keys: _*).orderBy(col("b")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum_end", sum(col("c")).over(wCum))
      .withColumn("cum_start", col("cum_end") - col("c"))
    // 0-indexed continuous position pos = p·(n−1); the two surrounding
    // 1-indexed ranks and the fractional interpolation weight. When
    // pos is integral the two ranks coincide and frac is 0.
    val ranks = stats
      .select(keys ++ Seq(col("n"),
        explode(array(ps.map(lit(_)): _*)).as("p")): _*)
      .withColumn("pos", col("p") * (col("n") - 1).cast("double"))
      .withColumn("frac", col("pos") - floor(col("pos")))
      .select(keys ++ Seq(col("n"), col("p"), col("frac"),
        explode(array(
          struct((floor(col("pos")) + 1).cast("long").as("r"),
            lit("lo").as("role")),
          struct(least(ceil(col("pos")) + 1, col("n")).cast("long").as("r"),
            lit("hi").as("role")))).as("t")): _*)
      .select(keys ++ Seq(col("n"), col("p"), col("frac"),
        col("t.r").as("r"), col("t.role").as("role")): _*)
    val joined =
      if (keyCols.isEmpty) cum.crossJoin(broadcast(ranks))
      else cum.join(broadcast(ranks), keyCols)
    val located = joined
      .filter(col("r") > col("cum_start") && col("r") <= col("cum_end"))
      .select(keys ++ Seq(col("b"), (col("r") - col("cum_start")).as("k"),
        col("n"), col("p"), col("frac"), col("role")): _*)
    val wanted = located.select(keys :+ col("b"): _*).distinct()
    val wv = Window.partitionBy(keys :+ col("b"): _*).orderBy(col("v"))
    bucketed.join(broadcast(wanted), keyCols :+ "b", "left_semi")
      .withColumn("rn", row_number().over(wv))
      .join(broadcast(located), keyCols :+ "b")
      .filter(col("rn") === col("k"))
      .groupBy(keys ++ Seq(col("n"), col("p"), col("frac")): _*)
      .agg(max(when(col("role") === "lo", col("v"))).as("vlo"),
        max(when(col("role") === "hi", col("v"))).as("vhi"))
      .select(keys ++ Seq(col("p"),
        ((lit(1.0) - col("frac")) * col("vlo")
          + col("frac") * col("vhi")).as("q"),
        col("n")): _*)
  }
}
