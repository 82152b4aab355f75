package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextStats

/** Deterministic stratified sampling — the domain-mixing primitive of a
  * training-data pipeline ("keep 80% of web, 100% of books, 25% of
  * code"). Membership is decided by a PORTABLE hash of the row key, not
  * by `rand()`:
  *
  *  - reproducible across runs, task retries, and engines (the same
  *    md5-derived 60-bit key as the q39 fingerprint oracle — DuckDB can
  *    recompute membership exactly, so the sample itself is
  *    oracle-checkable, and a resumed 100 TB job samples identically);
  *  - a pure projection + filter: no shuffle, no state, full codegen;
  *    the filter pushes below column-pruned scans like any predicate.
  *
  * Per-stratum keep rates are expressed in per-mille (integer 0..1000)
  * and compared against `hash(salt || key) mod 1000` — a uniform bucket
  * for any salt, so independent sampling passes decorrelate by salt.
  */
object Sampling {

  /** Uniform per-mille bucket in [0, 1000) for a row key. */
  def hashBucket(key: Column, salt: String): Column =
    pmod(TextStats.portableHash64(concat(lit(salt + ":"), key.cast("string"))), lit(1000L))

  /** The matching DuckDB SQL fragment (oracle authoring). */
  def hashBucketSql(keyExpr: String, salt: String): String =
    s"${TextStats.portableHash64Sql(s"concat('$salt:', CAST($keyExpr AS VARCHAR))")} % 1000"

  /** Keep each row iff its bucket falls under its stratum's per-mille
    * rate; unlisted strata fall back to `defaultPerMille`.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       ratesPerMille: Map[String, Int], defaultPerMille: Int,
                       salt: String = "sample"): DataFrame = {
    val rate = ratesPerMille.foldLeft(lit(defaultPerMille)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), salt) < rate)
  }
}
