package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration: AQE with
  * partition coalescing and skew-join handling, shuffle partitions sized
  * to the core count (not the 200 default), dynamic partition overwrite
  * (the upsert sink's contract), UTC, and the native SQL functions
  * injected via GraftExtensions.
  */
object GraftSession {

  def builder(master: String = "local[*]", cores: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("chainsyncspark")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new catalyst.GraftExtensions)

  /** Attach the native functions + recommended runtime confs to an
    * existing session (for environments that own session construction).
    */
  def attach(spark: SparkSession): SparkSession = {
    catalyst.GraftFunctions.registerAll(spark)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    spark
  }
}
