package graft.model

import org.apache.spark.sql.types._

/** Explicit StructTypes for the chain-sync entities (SURVEY.md §1.1).
  *
  * The reference declares no schemas anywhere (OpenSearch infers mappings
  * on first insert); the engine makes them explicit so Catalyst can prune
  * and push down. Field sets mirror what the reference actually reads
  * (reference: FIXTURES.md §2; handlers/comments.js:100-182,
  * handlers/votes.js:11, handlers/account_updates.js:2).
  */
object Schemas {

  /** Operation envelope, flattened from `{op: [type, payload], ...}`
    * (reference listener.js:148-164). The payload stays a JSON string at
    * the envelope level — per-type schemas are applied after routing,
    * exactly like the reference's type dispatch.
    */
  val opEnvelope: StructType = StructType(Seq(
    StructField("block_num", LongType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("op_type", StringType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** comment payload (reference handlers/comments.js:100-182). */
  val comment: StructType = StructType(Seq(
    StructField("author", StringType),
    StructField("permlink", StringType),
    StructField("parent_author", StringType),
    StructField("parent_permlink", StringType),
    StructField("title", StringType),
    StructField("body", StringType),
    StructField("json_metadata", StringType)))

  /** vote payload (reference handlers/votes.js:11). */
  val vote: StructType = StructType(Seq(
    StructField("voter", StringType),
    StructField("author", StringType),
    StructField("permlink", StringType),
    StructField("weight", IntegerType)))

  /** account_update payload (reference handlers/account_updates.js:2). */
  val accountUpdate: StructType = StructType(Seq(
    StructField("account", StringType),
    StructField("json_metadata", StringType)))

  /** parsed json_metadata of a post (reference handlers/comments.js:24-35:
    * only tags/image are read, with []-defaults on any malformed shape).
    */
  val postMetadata: StructType = StructType(Seq(
    StructField("tags", ArrayType(StringType)),
    StructField("image", ArrayType(StringType)),
    StructField("app", StringType),
    StructField("format", StringType)))

  /** account profile inside json_metadata
    * (reference handlers/account_updates.js:5).
    */
  val accountMetadata: StructType = StructType(Seq(
    StructField("profile", StructType(Seq(
      StructField("name", StringType),
      StructField("about", StringType),
      StructField("location", StringType),
      StructField("website", StringType),
      StructField("profile_image", StringType))))))

  /** community role row (reference handle_mutings.js:37). */
  val communityRole: StructType = StructType(Seq(
    StructField("account", StringType),
    StructField("role", StringType),
    StructField("title", StringType)))
}
