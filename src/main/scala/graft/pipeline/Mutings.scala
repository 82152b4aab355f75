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

  /** P8: the muted-role filter (handle_mutings.js:37-39). Distinct —
    * duplicate role rows for one account (re-ingested snapshots, title
    * variants) must not multiply the posts they left-join against.
    */
  def mutedAccounts(roles: DataFrame): DataFrame =
    roles.filter(col("role") === "muted").select(col("account")).distinct()

  /** J3+SNK2: posts left-joined against muted accounts on author; the
    * flag is true iff the author is muted AND the post is in the
    * community (handle_mutings.js:42-56's bool.must terms). The muted
    * set is a broadcast dimension — the posts side never shuffles.
    */
  def flagMuted(posts: DataFrame, roles: DataFrame): DataFrame = {
    val muted = mutedAccounts(roles).withColumnRenamed("account", "muted_author")
    posts
      .join(broadcast(muted), posts("author") === col("muted_author"), "left")
      // coalesce: a muted author's post with a NULL parent_permlink
      // must flag FALSE, not null (three-valued logic would leak a null
      // through the AND and make `!flag` filters drop the row)
      .withColumn("muted_in_community",
        coalesce(col("muted_author").isNotNull &&
          (col("parent_permlink") === communityId), lit(false)))
      .drop("muted_author")
  }
}
