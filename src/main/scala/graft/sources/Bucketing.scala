package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: pre-shuffle both sides of a recurring join on
  * the join key at write time, so the join itself needs NO exchange —
  * the co-located join pattern that matters most at 100 TB, where a
  * repeated fact-fact shuffle is the dominant cost.
  *
  * Spark buckets via the catalog (`saveAsTable`); the harness session
  * uses the default in-memory catalog with a local warehouse dir, and a
  * real deployment points `spark.sql.warehouse.dir` at shared storage.
  * BucketingSpec asserts the joined plan contains no Exchange.
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted) table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Join two tables bucketed on the same key with the same bucket
    * count: Catalyst recognizes the matching output partitioning and
    * plans a shuffle-free sort-merge join.
    */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
