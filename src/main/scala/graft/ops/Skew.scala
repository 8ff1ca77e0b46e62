package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §2 / builder scale mandate): salted join for
  * keys whose frequency makes a single reducer the straggler.
  *
  * The skewed (large) side gets a deterministic salt derived from
  * row-identity hashing; the small side is replicated across all salt
  * values. The join key becomes (key, salt), spreading one hot key over
  * `salts` reducers. AQE's skew-join split handles moderate skew
  * automatically; explicit salting is for the pathological keys known
  * in advance (null-heavy foreign keys, celebrity users, empty-string
  * documents).
  */
object Skew {

  /** Inner equi-join of `big` (skewed) with `small`, salted `salts`
    * ways. Result equals `big.join(small, bigKey === smallKey)` with
    * `small`'s join column dropped. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, salts: Int = 8): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(expr(s"sequence(0, ${salts - 1})")))
    salted
      .join(replicated, salted("__salt") === replicated("__salt") &&
        salted(bigKey) === replicated(smallKey))
      .drop("__salt").drop(smallKey)
  }

  /** Two-phase per-group top-k: a ranking window partitioned by a
    * low-cardinality key funnels the whole input into |groups| tasks —
    * correct at any size, a straggler at 100 TB. Phase 1 salts the
    * partition key with the input partition id and takes a *local*
    * top-k (the global top-k of a group is contained in the union of
    * its per-salt top-k's, for any salt assignment), so the big shuffle
    * spreads over groups x input-splits reducers. Phase 2 runs the
    * original window over the <= k x splits survivors per group —
    * by then a trivially small relation. Same rows, same ordering,
    * same oracle as the single-window form. */
  def twoPhaseTopK(df: DataFrame, groupCols: Seq[Column],
      order: Seq[Column], k: Int, rankName: String): DataFrame = {
    val wLocal = Window.partitionBy(groupCols :+ col("__tpk_salt"): _*)
      .orderBy(order: _*)
    val survivors = df
      .withColumn("__tpk_salt", spark_partition_id())
      .withColumn("__tpk_rn", row_number().over(wLocal))
      .filter(col("__tpk_rn") <= k)
      .drop("__tpk_salt", "__tpk_rn")
    val wGlobal = Window.partitionBy(groupCols: _*).orderBy(order: _*)
    survivors.withColumn(rankName, row_number().over(wGlobal))
      .filter(col(rankName) <= k)
  }

  /** Distributed global row numbering — the scalable replacement for
    * `row_number() OVER (ORDER BY ...)`, whose single-partition window
    * funnels the entire input through one task. Three phases, all
    * distributed: (1) range-repartition on the sort key, so partition i
    * holds keys strictly below partition i+1 (boundaries come from
    * Spark's range sampler; with a unique composite key the final ranks
    * are identical for ANY boundary choice); (2) rank locally inside
    * each range partition; (3) add each partition's global offset — the
    * prefix sum of per-partition counts, a |parts|-row relation
    * broadcast back. The input is computed twice (counts + join); at
    * scale that second scan is the price of never materializing N rows
    * in one task, and it reuses the same range exchange.
    *
    * `order` must be a total order (include a unique tiebreaker) or
    * ranks of tied rows become boundary-dependent. */
  def globalRowNumber(df: DataFrame, order: Seq[Column], parts: Int = 32,
      rankName: String = "rn"): DataFrame = {
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn("__grp", spark_partition_id())
    val wLocal = Window.partitionBy(col("__grp")).orderBy(order: _*)
    val local = ranged.withColumn("__lrn", row_number().over(wLocal))
    val counts = ranged.groupBy(col("__grp")).agg(count(lit(1)).as("__n"))
    val wOff = Window.orderBy(col("__grp"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col("__grp"), col("__off"))
    local.join(broadcast(offsets), Seq("__grp"))
      .withColumn(rankName, col("__off") + col("__lrn"))
      .drop("__grp", "__lrn", "__off")
  }

  /** Distributed global running sum — the scalable replacement for
    * `sum(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`, which
    * funnels the entire input through one task exactly like a
    * partitionless row_number. Same three phases as
    * [[globalRowNumber]]: range-repartition on the sort key, local
    * running sum inside each range partition, then add the broadcast
    * prefix sum of per-partition TOTALS (a |parts|-row relation).
    * `order` must be a total order or tied rows' cumulative values
    * become boundary-dependent. */
  def globalCumSum(df: DataFrame, order: Seq[Column], value: Column,
      parts: Int = 32, cumName: String = "cum"): DataFrame = {
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn("__grp", spark_partition_id())
      .withColumn("__v", value)
    val wLocal = Window.partitionBy(col("__grp")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__lcum", sum(col("__v")).over(wLocal))
    val totals = ranged.groupBy(col("__grp")).agg(sum(col("__v")).as("__t"))
    val wOff = Window.orderBy(col("__grp"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", coalesce(sum(col("__t")).over(wOff), lit(0L)))
      .select(col("__grp"), col("__off"))
    local.join(broadcast(offsets), Seq("__grp"))
      .withColumn(cumName, col("__off") + col("__lcum"))
      .drop("__grp", "__v", "__lcum", "__off")
  }

  /** Distributed EXCLUSIVE running max — `max(v) OVER (ORDER BY ...
    * ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)` without the
    * single-task funnel, for sweep-line operators (skyline/frontier
    * tests) that ask "did any STRICTLY EARLIER row already reach this
    * value?". Same three phases as [[globalCumSum]]: range-repartition
    * on the sort key, exclusive local running max per range partition,
    * then combine with the broadcast running max of EARLIER partitions'
    * totals (a |parts|-row relation). First row overall gets null —
    * `greatest` skips nulls, so the combine stays null exactly when no
    * earlier row exists. `order` must be a total order or tied rows'
    * prev-max becomes boundary-dependent. */
  def globalCumMaxExclusive(df: DataFrame, order: Seq[Column], value: Column,
      parts: Int = 32, maxName: String = "prevmax"): DataFrame = {
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn("__grp", spark_partition_id())
      .withColumn("__v", value)
    val wLocal = Window.partitionBy(col("__grp")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged.withColumn("__lmax", max(col("__v")).over(wLocal))
    val totals = ranged.groupBy(col("__grp")).agg(max(col("__v")).as("__t"))
    val wOff = Window.orderBy(col("__grp"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__off", max(col("__t")).over(wOff))
      .select(col("__grp"), col("__off"))
    local.join(broadcast(offsets), Seq("__grp"))
      .withColumn(maxName, greatest(col("__lmax"), col("__off")))
      .drop("__grp", "__v", "__lmax", "__off")
  }

  /** Top-n heaviest join keys with their frequencies — the diagnostic
    * used to decide which keys need salting / AQE skew hints. */
  def keyHistogram(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("key")).limit(topN)
}
