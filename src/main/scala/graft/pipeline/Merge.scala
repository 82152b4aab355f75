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
    // the whole-row tiebreak hash must skip MAP-typed columns (Spark
    // forbids hashing maps — element order is unspecified)
    def hashable(t: org.apache.spark.sql.types.DataType): Boolean = t match {
      case org.apache.spark.sql.types.MapType(_, _, _) => false
      case org.apache.spark.sql.types.ArrayType(e, _) => hashable(e)
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    val hashCols = df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    val orderCols = ordering.map(_.desc) ++
      (if (hashCols.nonEmpty) Seq(xxhash64(struct(hashCols.toSeq: _*)).desc) else Nil)
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

  /** Partition-scoped incremental upsert: merge `incoming` into the
    * partitioned state at `path`, touching ONLY the partitions the batch
    * lands in. The existing-state read is filtered to those partitions
    * (partition pruning keeps it a metadata+subset scan) and the write
    * is a dynamic partition overwrite of the same subset — so a
    * micro-batch covering one month costs O(month), not O(history),
    * regardless of table size. The partition values of a batch are tiny
    * (its distinct months), so collecting them to build the pruning
    * predicate is driver-cheap.
    */
  def upsertPartitioned(incoming: DataFrame, path: String,
                        keys: Seq[String], orderCol: String,
                        partitionCols: Seq[String] = Seq("year", "month")): Unit = {
    val spark = incoming.sparkSession
    val exists = new java.io.File(path).exists()
    val merged = if (!exists) {
      latestWins(incoming, keys, Seq(col(orderCol)))
    } else {
      val touched = incoming.select(partitionCols.map(col): _*).distinct().collect()
      val pruning = touched.map { r =>
        partitionCols.zipWithIndex
          .map { case (c, i) => col(c) === lit(r.get(i)) }
          .reduce(_ && _)
      }.reduceOption(_ || _).getOrElse(lit(false))
      val existingTouched = spark.read.parquet(path).filter(pruning)
      latestWins(
        existingTouched.unionByName(incoming, allowMissingColumns = true),
        keys, Seq(col(orderCol)))
    }
    // materialize before overwriting the partitions we just read
    writePartitioned(merged.localCheckpoint(true), path, partitionCols)
  }
}
