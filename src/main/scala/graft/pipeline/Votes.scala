package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vote pipeline (SURVEY.md §2.4 J1, §2.5 A1; reference
  * handlers/votes.js).
  *
  * The reference batch-resolves votes against the posts index with an
  * `ids` existence lookup capped at 10 000 rows, then per-vote appends
  * the voter to the post's upvotes/downvotes set iff absent. Here that
  * is a left-semi join (no cap — the cap was an OpenSearch artifact,
  * SURVEY §2.4) followed by a `collect_set` aggregation whose map-side
  * partial dedup does the "iff absent" guard for free.
  */
object Votes {

  /** Votes with their post key attached (reference votes.js:6-9) —
    * derived through [[graft.ops.Keys.postKey]] so a key-scheme change
    * (seed, separator) can never silently fork the vote path from the
    * post path.
    */
  def keyed(votes: DataFrame): DataFrame =
    votes.withColumn("post_id",
      graft.ops.Keys.postKey(col("author"), col("permlink")))

  /** J1: keep only votes whose post exists (reference votes.js:40-46 —
    * votes for unknown posts are dropped). `posts` needs only its key
    * column — projection pushdown mirrors the reference's
    * `_source: {includes: ["nothing"]}`.
    */
  def existingOnly(votes: DataFrame, posts: DataFrame): DataFrame =
    keyed(votes).join(posts.select(col("post_id")), Seq("post_id"), "left_semi")

  /** A1: per-post distinct voter sets split by weight sign (reference
    * votes.js:17; `weight > 0 ? "upvotes" : "downvotes"` — the else
    * branch is TOTAL: a 0-weight vote AND a vote with no weight at all
    * (undefined > 0 is false in JS) both land in downvotes). The
    * null-coalesced predicate keeps that totality — a bare
    * `when(weight <= 0)` is NULL for null weights and would drop the
    * voter from both sets. Sets are sorted for deterministic output.
    */
  def voterSets(votes: DataFrame): DataFrame = {
    val isUp = coalesce(col("weight") > 0, lit(false))
    votes.groupBy(col("post_id"))
      .agg(
        array_sort(collect_set(when(isUp, col("voter")))).as("upvotes"),
        array_sort(collect_set(when(!isUp, col("voter")))).as("downvotes"))
  }

  /** Incremental merge of new voter sets into existing ones: the
    * relational form of the reference's append-if-absent painless script
    * (votes.js:13-19). `array_union` dedups, `array_sort` keeps the
    * deterministic order.
    */
  def mergeVoterSets(existing: DataFrame, incoming: DataFrame): DataFrame =
    existing.select(col("post_id"), col("upvotes"), col("downvotes"))
      .join(incoming.select(col("post_id"),
              col("upvotes").as("u2"), col("downvotes").as("d2")),
            Seq("post_id"), "full_outer")
      .select(
        col("post_id"),
        array_sort(array_union(
          coalesce(col("upvotes"), array().cast("array<string>")),
          coalesce(col("u2"), array().cast("array<string>")))).as("upvotes"),
        array_sort(array_union(
          coalesce(col("downvotes"), array().cast("array<string>")),
          coalesce(col("d2"), array().cast("array<string>")))).as("downvotes"))

  /** Account-activity projection: every vote bumps the voter's
    * last_active (reference votes.js:26-27).
    */
  def accountActivity(votes: DataFrame): DataFrame =
    votes.select(col("voter").as("name"), col("timestamp"))
}
