package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format-generic batch IO: the engine is parquet-at-rest, but ingest
  * and export interoperate with csv/json/orc through one schema'd
  * entry point (schema always explicit — inference is a full extra
  * pass at 100 TB and non-deterministic under sampling).
  */
object IO {

  val formats = Seq("parquet", "orc", "json", "csv")

  def read(spark: SparkSession, format: String, path: String,
           schema: StructType): DataFrame = {
    val r = spark.read.format(format).schema(schema)
    (format match {
      case "csv" => r.option("header", "true")
      case _     => r
    }).load(path)
  }

  def write(df: DataFrame, format: String, path: String): Unit = {
    val w = df.write.format(format).mode(SaveMode.Overwrite)
    (format match {
      case "csv" => w.option("header", "true")
      case _     => w
    }).save(path)
  }
}
