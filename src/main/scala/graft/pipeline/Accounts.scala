package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Normalize

/** Account pipeline (SURVEY.md §2.3 P11, §2.5 A2; reference
  * handlers/account_updates.js + the last-active bumps scattered across
  * all three handlers).
  */
object Accounts {

  /** Profile extraction from account_update ops with the reference's
    * {}-fallback (account_updates.js:2-6), latest profile wins per
    * account.
    */
  def profiles(accountUpdates: DataFrame): DataFrame =
    Merge.latestWins(
      accountUpdates.select(
        col("account").as("name"),
        Normalize.profileOf(col("json_metadata")).as("profile"),
        col("timestamp")),
      Seq("name"), Seq(col("timestamp")))

  /** A2: union the activity streams of all handlers and take the max
    * timestamp per account — the batch form of "every op bumps
    * last_active" (comments.js:179-181, votes.js:26-27,
    * account_updates.js:9-10). Partial aggregation makes this one
    * map-side max + one tiny shuffle regardless of stream size.
    */
  def lastActive(activities: DataFrame*): DataFrame =
    activities.reduce(_ unionByName _)
      .groupBy(col("name"))
      .agg(max(col("timestamp")).as("last_active"))
}
