package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.pipeline.Votes

/** Vote semantics (SURVEY.md §2.4 J1, §2.5 A1; reference
  * handlers/votes.js).
  */
class VotesSpec extends SparkSpec {
  import spark.implicits._

  private val ts = Timestamp.valueOf("2024-01-01 00:00:00")

  private def votesDf(rows: (String, String, String, Int)*) =
    rows.toDF("voter", "author", "permlink", "weight")
      .withColumn("timestamp", lit(ts))

  test("duplicate voter is idempotent in the set (votes.js:14)") {
    val v = votesDf(
      ("alice", "bob", "post1", 100),
      ("alice", "bob", "post1", 100),
      ("carol", "bob", "post1", 100))
    val sets = Votes.voterSets(Votes.keyed(v)).select("upvotes").as[Seq[String]].head()
    assert(sets === Seq("alice", "carol"))
  }

  test("weight sign splits up/down; zero goes down (votes.js:17)") {
    val v = votesDf(
      ("up1", "bob", "p", 100),
      ("down1", "bob", "p", -100),
      ("zero", "bob", "p", 0))
    val row = Votes.voterSets(Votes.keyed(v))
      .select(col("upvotes"), col("downvotes")).as[(Seq[String], Seq[String])].head()
    assert(row._1 === Seq("up1"))
    assert(row._2 === Seq("down1", "zero"))
  }

  test("votes for nonexistent posts are dropped (votes.js:40-46)") {
    val v = votesDf(
      ("alice", "bob", "exists", 1),
      ("alice", "bob", "ghost", 1))
    val posts = Seq(("bob", "exists")).toDF("author", "permlink")
      .select(xxhash64(concat_ws("/", col("author"), col("permlink"))).as("post_id"))
    val kept = Votes.existingOnly(v, posts)
    assert(kept.count() === 1)
    assert(kept.select("permlink").as[String].head() === "exists")
  }

  test("incremental set merge is append-if-absent (votes.js:13-19)") {
    val existing = Seq((1L, Seq("a"), Seq("d"))).toDF("post_id", "upvotes", "downvotes")
    val incoming = Seq((1L, Seq("a", "b"), Seq.empty[String]),
                       (2L, Seq("z"), Seq.empty[String]))
      .toDF("post_id", "upvotes", "downvotes")
    val merged = Votes.mergeVoterSets(existing, incoming)
      .orderBy("post_id").as[(Long, Seq[String], Seq[String])].collect()
    assert(merged === Array((1L, Seq("a", "b"), Seq("d")), (2L, Seq("z"), Seq.empty)))
  }
}
