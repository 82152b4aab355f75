package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Op-type router (SURVEY.md §2.3 P1/P2; reference listener.js:148-164).
  *
  * One scan of the op-envelope table fans out into four typed branches.
  * Each branch is `filter(op_type) → from_json(payload, schema) →
  * flatten`; Catalyst collapses the four filters into one pass over the
  * scan and prunes `payload` parsing per branch, so the "router" costs a
  * single read even with all four consumers attached — the declarative
  * equivalent of the reference's single `for` loop with a switch.
  */
object Router {

  /** Parse one typed branch out of the envelope stream. */
  private def branch(ops: DataFrame, opType: String,
                     schema: org.apache.spark.sql.types.StructType): DataFrame =
    ops.filter(col("op_type") === opType)
      .withColumn("p", from_json(col("payload"), schema))
      // timestamp injection (P2, reference listener.js:164): the envelope
      // timestamp rides along into every payload row.
      .select(col("p.*"), col("timestamp"), col("block_num"))

  def comments(ops: DataFrame): DataFrame       = branch(ops, "comment", Schemas.comment)
  def votes(ops: DataFrame): DataFrame          = branch(ops, "vote", Schemas.vote)
  def accountUpdates(ops: DataFrame): DataFrame = branch(ops, "account_update", Schemas.accountUpdate)
  /** custom_json ops are routed but unprocessed
    * (reference handlers/custom_jsons.js:2-3). Kept as a branch so a
    * future handler slot exists, mirroring the reference's stub.
    */
  def customJsons(ops: DataFrame): DataFrame    = ops.filter(col("op_type") === "custom_json")

  /** Read an op-envelope JSON-lines file with the declared schema
    * (batch analog of SRC1, reference listener.js:58-120).
    */
  def readOps(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.opEnvelope).json(path)
}
