package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lazy loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Every query in the engine receives a scale-factor directory and reads
  * through here, so schema knowledge and read options live in one place.
  * Reads are plain columnar parquet scans: Catalyst pushes filters and
  * prunes columns into the scan (verify via `.explain` → `PushedFilters`
  * / `ReadSchema`), which is the property that matters at 100 TB.
  *
  * The resolved DataFrames are memoized per (session, dir, table) in the
  * companion: `spark.read.parquet` re-reads parquet footers for schema
  * inference on every call, and with ~70 declared queries each opening
  * 1–3 tables that footer I/O plus relation resolution became a
  * measurable slice of the per-query planning floor (VERDICT r5 #7).
  * DataFrames are immutable logical plans, so sharing one instance
  * across queries only shares the analysis work, never execution state.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def rd(name: String): DataFrame = Tables.cached(spark, dir, name)

  def region: DataFrame     = rd("region")
  def nation: DataFrame     = rd("nation")
  def customer: DataFrame   = rd("customer")
  def supplier: DataFrame   = rd("supplier")
  def part: DataFrame       = rd("part")
  def orders: DataFrame     = rd("orders")
  def lineitem: DataFrame   = rd("lineitem")
  def events: DataFrame     = rd("events")
  def documents: DataFrame  = rd("documents")
  def embeddings: DataFrame = rd("embeddings")
}

object Tables {
  // WEAK session keys: a strong (session, …) key would pin every
  // stopped session's analyzed plans for the JVM lifetime (test suites
  // and long-lived services create/stop many sessions — review finding
  // r6b). The inner key carries a cheap file-stat token so a rewritten
  // fixture dir invalidates its entry (the ivfCacheKey discipline)
  // instead of serving a stale file listing; superseded-token entries
  // linger only until their session is collected.
  private val memo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  private def statToken(dir: String, name: String): String = {
    val f = new java.io.File(dir, s"$name.parquet")
    val files = if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty) else Array(f)
    files.map(x => s"${x.getName}:${x.lastModified}:${x.length}")
      .sorted.mkString(",").hashCode.toString
  }

  private def cached(spark: SparkSession, dir: String, name: String): DataFrame = {
    val inner = memo.computeIfAbsent(spark,
      _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
    inner.computeIfAbsent(s"$dir/$name|${statToken(dir, name)}",
      _ => load(spark, dir, name))
  }

  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" =>
        // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to
        // read as a timestamp. Read it as raw nanos (legacy conf) and
        // convert to a microsecond TimestampType; the fixture has no
        // sub-microsecond components, so no information is lost vs the
        // DuckDB oracle.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$dir/events.parquet").withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case _ =>
        spark.read.parquet(s"$dir/$name.parquet")
    }
}
