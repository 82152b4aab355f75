package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent keyed-upsert merge (SURVEY.md §2.2 SNK1, §7.4 #1).
  *
  * The reference gets exactly-once-effective semantics from at-least-once
  * delivery + idempotent per-doc upserts into OpenSearch
  * (listener.js:176-184). Plain Parquet has no per-row upsert, so the
  * engine expresses the same thing relationally: union existing state
  * with the incoming batch, keep the latest record per key (window
  * dedup), and overwrite. Applying the same batch twice is a no-op —
  * idempotence is property-tested (MergeSpec).
  *
  * At scale the overwrite is partition-scoped (`replaceWhere`-style:
  * only the (year, month) partitions present in the batch are rewritten)
  * so a micro-batch touching one month never rewrites history.
  */
object Merge {

  /** Latest-record-wins dedup (A3/W1; reference comments.js:118-142).
    * Ties beyond `ordering` are broken by a stable hash of the whole row
    * so the result is deterministic under input-order shuffling.
    */
  def latestWins(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val orderCols = ordering.map(_.desc) :+ xxhash64(struct(df.columns.map(col): _*)).desc
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Merge an incoming batch into existing state, latest record per key
    * winning (SNK1). Columns are aligned by name; either side may carry
    * columns the other lacks (schema evolution — nulls fill the gap).
    */
  def upsert(existing: DataFrame, incoming: DataFrame,
             keys: Seq[String], orderCol: String): DataFrame =
    latestWins(
      existing.unionByName(incoming, allowMissingColumns = true),
      keys, Seq(col(orderCol)))

  /** Partitioned overwrite write (SNK5): dynamic partition overwrite
    * only rewrites the partitions present in `df`, which is what makes
    * the incremental merge cheap at 100 TB — a month of new posts
    * touches one partition, not the table.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String] = Seq("year", "month")): Unit = {
    df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
