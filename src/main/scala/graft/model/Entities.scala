package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed API boundary (SURVEY.md §1.3): the engine's core is untyped
  * DataFrames (Catalyst-optimizable), but consumers get case-class
  * `Dataset[T]` views — compile-time field checks where type safety
  * helps, with zero plan impact (`as[T]` is a metadata-only cast).
  */
final case class Post(
    post_id: Long,
    author: String,
    permlink: String,
    text_title: String,
    text_body: String,
    parent_permlink: String,
    tags: Seq[String],
    image: Seq[String],
    stockimage_tags: Option[String],
    jobs: Map[String, String],
    timestamp: Timestamp,
    year: Int,
    month: Int)

final case class Account(name: String, last_active: Timestamp)

final case class VoteSet(post_id: Long, upvotes: Seq[String], downvotes: Seq[String])

object Entities {
  def posts(df: DataFrame): Dataset[Post] = {
    import df.sparkSession.implicits._
    df.as[Post]
  }
  def accounts(df: DataFrame): Dataset[Account] = {
    import df.sparkSession.implicits._
    df.as[Account]
  }
  def voteSets(df: DataFrame): Dataset[VoteSet] = {
    import df.sparkSession.implicits._
    df.as[VoteSet]
  }
}
