package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Top-n heaviest join keys with their frequencies — the diagnostic
    * used to decide which keys need salting / AQE skew hints. */
  def keyHistogram(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("key")).limit(topN)
}
