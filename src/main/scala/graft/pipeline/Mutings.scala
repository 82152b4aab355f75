package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community-muting side-job (SURVEY.md §3 EP3; reference
  * handle_mutings.js — disabled in the reference by an early return at
  * `:29`, implemented here with the *intended* semantics per SURVEY
  * §7.4 #5).
  *
  * The reference pages community roles 100 at a time (SRC5/W2 keyset
  * cursor — a connector artifact; here the roles table is a plain scan),
  * keeps `role == "muted"` (P8), and flags every post of a muted author
  * within the community (J3 update-join, SNK2 scripted update → a
  * relational left join + flag column).
  */
object Mutings {

  val communityId = "hive-118554"

  /** P8: the muted-role filter (handle_mutings.js:37-39). */
  def mutedAccounts(roles: DataFrame): DataFrame =
    roles.filter(col("role") === "muted").select(col("account"))

  /** J3+SNK2: posts left-joined against muted accounts on author; the
    * flag is true iff the author is muted AND the post is in the
    * community (handle_mutings.js:42-56's bool.must terms). The muted
    * set is a broadcast dimension — the posts side never shuffles.
    */
  def flagMuted(posts: DataFrame, roles: DataFrame): DataFrame = {
    val muted = mutedAccounts(roles).withColumnRenamed("account", "muted_author")
    posts
      .join(broadcast(muted), posts("author") === col("muted_author"), "left")
      .withColumn("muted_in_community",
        col("muted_author").isNotNull && (col("parent_permlink") === communityId))
      .drop("muted_author")
  }
}
