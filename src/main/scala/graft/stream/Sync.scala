package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.Schemas
import graft.pipeline.{Accounts, Comments, Merge, Router, Votes}

/** Structured-Streaming incremental sync (SURVEY.md §2.9; reference
  * listener.js:157-195).
  *
  * The reference's loop — poll a block batch, route ops, transform,
  * bulk-upsert, commit the offset after sink success — is exactly
  * Spark's micro-batch model:
  *
  *   - micro-batch trigger        ← the intended 3 s poll cadence (S1;
  *     `maxFilesPerTrigger` is the MAX_BLOCKS_TO_FETCH analog)
  *   - checkpointed offsets       ← the `settings` block-number doc (S2;
  *     committed after sink success, same ordering)
  *   - idempotent foreachBatch    ← the keyed bulk upsert (SNK1/S8):
  *     crash ⇒ batch replays ⇒ latest-wins merge absorbs duplicates
  *   - Trigger.AvailableNow       ← bounded backfill / --stop_block (S3)
  *
  * State (posts, voter sets, account activity) lives in the sink tables
  * and is merged per batch — mirroring the reference, where state lives
  * in OpenSearch, not the process (S5). No flatMapGroupsWithState needed.
  */
object Sync {

  /** One micro-batch of the sync: route the ops, run the three handler
    * pipelines, merge each into its state table (the `Promise.all` + one
    * bulk barrier, S7 — here simply three merges inside one foreachBatch
    * invocation, which Spark runs as one unit before committing the
    * offset).
    */
  def applyBatch(ops: DataFrame, stateDir: String): Unit = {
    val spark = ops.sparkSession

    val comments = Router.comments(ops)
    val votes    = Router.votes(ops)
    val accounts = Router.accountUpdates(ops)

    // posts: partition-scoped latest-wins upsert — only the (year,
    // month) partitions this batch touches are read and rewritten, so a
    // micro-batch costs O(batch months), not O(table) (Merge scaladoc).
    // Posts merge lands BEFORE the vote join: votes on same-batch posts
    // are kept (the reference races its handlers and drops them —
    // engine applies the intended ordering).
    val newPosts = Comments.toPostDocs(comments)
    Merge.upsertPartitioned(newPosts, s"$stateDir/posts", Seq("post_id"), "timestamp")
    val posts = spark.read.parquet(s"$stateDir/posts")

    // votes: semi-join against the *current* post state (J1), then
    // merge the new voter sets into the existing ones (A1 incremental)
    val keptVotes = Votes.existingOnly(votes, posts.select(col("post_id")))
    val newSets = Votes.voterSets(keptVotes)
    val voteSets = readState(spark, s"$stateDir/vote_sets") match {
      case Some(existing) => Votes.mergeVoterSets(existing, newSets)
      case None           => newSets
    }

    // accounts: max(last_active) across all three activity streams (A2)
    val activity = Accounts.lastActive(
      Comments.accountActivity(comments),
      Votes.accountActivity(votes),
      accounts.select(col("account").as("name"), col("timestamp")))
    val lastActive = readState(spark, s"$stateDir/accounts") match {
      case Some(existing) =>
        existing.unionByName(activity)
          .groupBy(col("name")).agg(max(col("last_active")).as("last_active"))
      case None => activity
    }

    // vote_sets/accounts are hash-keyed (no time partitioning): full
    // merge-overwrite here; the 100 TB twin buckets them by key so the
    // merge is a bucket-local co-located join. Materialize before
    // overwriting the paths just read (production twin: a mergeable
    // table format's transactional commit).
    val setsM = voteSets.transform(graft.Stage.mat)
    val actM  = lastActive.transform(graft.Stage.mat)
    setsM.write.mode("overwrite").parquet(s"$stateDir/vote_sets")
    actM.write.mode("overwrite").parquet(s"$stateDir/accounts")
  }

  private def readState(spark: SparkSession, path: String): Option[DataFrame] =
    // filesystem-agnostic probe (java.io.File is always false on
    // hdfs://s3://, which would silently drop all accumulated state)
    if (graft.pipeline.Merge.pathExists(spark, path)) Some(spark.read.parquet(path)) else None

  /** Start the streaming sync over a directory of op-envelope JSON files
    * (the file source stands in for the RPC poll, SURVEY SRC1).
    */
  def start(spark: SparkSession, opsDir: String, checkpointDir: String,
            stateDir: String, trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Int = 30): StreamingQuery = {
    val ops = spark.readStream
      .schema(Schemas.opEnvelope)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(opsDir)
    ops.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, stateDir)
      }
      .start()
  }

  // ---- S4 capability rows: watermarked event-time windows -------------

  /** Tumbling/sliding window counts with a watermark (S4; built-in
    * `window()` — late data beyond the watermark is dropped).
    */
  def windowedCounts(events: DataFrame, windowDur: String, slideDur: String,
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slideDur), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Session windows per user with an inactivity gap (S4; built-in
    * `session_window()` — the streaming twin of q51_sessionize).
    */
  def sessionCounts(events: DataFrame, gap: String,
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
}
