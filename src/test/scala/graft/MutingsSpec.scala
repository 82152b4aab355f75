package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Mutings

/** Muting side-job semantics (reference handle_mutings.js, intended
  * behavior — the reference disables it at :29).
  */
class MutingsSpec extends SparkSpec {
  import spark.implicits._

  private val roles = Seq(
    ("alice", "muted", ""),
    ("bob", "member", ""),
    ("carol", "muted", "")).toDF("account", "role", "title")

  private val posts = Seq(
    (1L, "alice", "hive-118554"),   // muted + in community -> flagged
    (2L, "alice", "other"),         // muted, outside community -> not flagged
    (3L, "bob", "hive-118554"),     // not muted -> not flagged
    (4L, "dave", "hive-118554")     // unknown author -> not flagged
  ).toDF("post_id", "author", "parent_permlink")

  test("only muted roles survive the role filter (handle_mutings.js:37-39)") {
    assert(Mutings.mutedAccounts(roles).as[String].collect().sorted === Array("alice", "carol"))
  }

  test("flag set iff author muted AND post in community (handle_mutings.js:42-56)") {
    val flagged = Mutings.flagMuted(posts, roles)
      .select("post_id", "muted_in_community").as[(Long, Boolean)].collect().toMap
    assert(flagged === Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
    // row count unchanged: it's an update-join, not a filter
    assert(flagged.size === 4)
  }
}
