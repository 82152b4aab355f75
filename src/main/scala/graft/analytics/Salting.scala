package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — the manual fallback when AQE's
  * runtime skew handling isn't available (e.g. a skewed aggregation
  * where one key holds 30% of a 100 TB table; AQE splits skewed *join*
  * partitions but a hot aggregation key still lands on one reducer).
  *
  * Two-stage aggregation: stage 1 groups by (key, salt) — the hot key
  * spreads over `saltBuckets` reducers — stage 2 combines the partials
  * by key. Works for any algebraic aggregate (here: count/sum); the
  * combine step runs on |keys| × saltBuckets rows, which is tiny.
  */
object Salting {

  /** Deterministic salt in [0, saltBuckets) derived from a uniqueness
    * column (NOT rand() — retries/replays must produce the same salt
    * for exactly-once semantics under Spark task retry).
    */
  def salt(uniqueCol: Column, saltBuckets: Int): Column =
    pmod(xxhash64(uniqueCol), lit(saltBuckets))

  /** Salted count+sum aggregation equivalent to
    * `df.groupBy(key).agg(count(1), sum(valueCol))`.
    */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: String,
                     uniqueCol: String, saltBuckets: Int = 16): DataFrame =
    df.withColumn("__salt", salt(col(uniqueCol), saltBuckets))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))
}
