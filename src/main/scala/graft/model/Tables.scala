package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lazy loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Every query in the engine receives a scale-factor directory and reads
  * through here, so schema knowledge and read options live in one place.
  * Reads are plain columnar parquet scans: Catalyst pushes filters and
  * prunes columns into the scan (verify via `.explain` → `PushedFilters`
  * / `ReadSchema`), which is the property that matters at 100 TB.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def rd(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to read
    * as a timestamp. Read it as raw nanos (legacy conf) and convert to a
    * microsecond TimestampType; the fixture has no sub-microsecond
    * components, so no information is lost vs the DuckDB oracle.
    */
  private def events0: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    rd("events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }

  def region: DataFrame     = rd("region")
  def nation: DataFrame     = rd("nation")
  def customer: DataFrame   = rd("customer")
  def supplier: DataFrame   = rd("supplier")
  def part: DataFrame       = rd("part")
  def orders: DataFrame     = rd("orders")
  def lineitem: DataFrame   = rd("lineitem")
  def events: DataFrame     = events0
  def documents: DataFrame  = rd("documents")
  def embeddings: DataFrame = rd("embeddings")
}
