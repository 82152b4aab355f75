package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Pure-Column normalization expressions (SURVEY.md §2.3 P2-P4, §2.8
  * F5-F13). Everything here is built-in Catalyst expressions — no UDFs —
  * so the whole comment pipeline stays inside whole-stage codegen.
  */
object Normalize {

  /** JSON-metadata repair (reference handlers/comments.js:22-40).
    *
    * The reference parses `json_metadata`, RE-parses if the result is
    * still a string (double-encoded JSON), and falls back to `{}` on any
    * failure. A double-encoded document is a top-level JSON *string
    * literal*, so: if the trimmed payload starts with a quote, decode
    * that string first (`get_json_object(_, "$")` yields its content),
    * then parse once. `from_json` is null-on-error, matching the
    * reference's catch-all.
    */
  private def decodeIfDoubleEncoded(json: Column): Column =
    // trim the full JSON whitespace class, not ltrim's space-only: a
    // tab/newline/CR before the quoted payload is legal JSON whitespace
    // the reference's JSON.parse accepts, and space-only trimming would
    // misroute such documents to the single-parse branch (→ null → {})
    when(ltrim(json, " \t\n\r\f").startsWith("\""),
      get_json_object(json, "$")).otherwise(json)

  def parsedMetadata(jsonMetadata: Column): Column =
    from_json(decodeIfDoubleEncoded(jsonMetadata), Schemas.postMetadata)

  /** tags with the reference's []-default on missing/malformed/non-array
    * (reference handlers/comments.js:32-35).
    */
  def tagsOf(meta: Column): Column =
    coalesce(meta.getField("tags"), array().cast("array<string>"))

  /** image list with []-default (reference handlers/comments.js:32-35). */
  def imagesOf(meta: Column): Column =
    coalesce(meta.getField("image"), array().cast("array<string>"))

  /** Hashtag extraction (reference handlers/comments.js:93-96): split on
    * single spaces, keep tokens starting '#', strip the '#', join with
    * ' '. A bare "#" yields an empty token, matching the reference's
    * `substring(1)` on "#".
    */
  def hashtags(body: Column): Column =
    array_join(
      transform(
        filter(split(body, " "), t => t.startsWith("#")),
        t => t.substr(lit(2), length(t))),
      " ")

  /** Stock-image post predicate (reference handlers/comments.js:84-91):
    * tags contain either community id, OR parent_permlink is one of them.
    */
  def isStockImagePost(tags: Column, parentPermlink: Column): Column =
    array_contains(tags, "hivestockimages") ||
      array_contains(tags, "hive-118554") ||
      parentPermlink.isin("hivestockimages", "hive-118554")

  /** Reply predicate (reference handlers/comments.js:113-116): a comment
    * with a parent author is a reply and leaves the post pipeline.
    */
  def isReply(parentAuthor: Column): Column =
    parentAuthor.isNotNull && parentAuthor =!= ""

  /** Newline spacing (reference handlers/comments.js:56): pad newlines
    * with spaces so token-based downstream ops see them as boundaries.
    */
  def spaceNewlines(text: Column): Column =
    regexp_replace(text, "\n", " \n ")

  /** P7: the reply-command author allowlist (reference
    * handlers/comments.js:61-82 — dead code there, semantics preserved;
    * note the reference's check is vacuous because the list includes the
    * comment's own author, documented in SURVEY §2.3).
    */
  val replyCommandAuthors: Seq[String] =
    Seq("hive-118554", "minismallholding", "crosheille", "kattycrochet")

  def isAllowlistedAuthor(author: Column): Column =
    author.isin(replyCommandAuthors: _*)

  /** F8: first-newline-only replace (reference handlers/comments.js:70 —
    * JS `replace("\n", " ")` touches only the first occurrence; the
    * reluctant-prefix regex reproduces that single-replace quirk).
    */
  def firstNewlineToSpace(text: Column): Column =
    regexp_replace(text, "(?s)^(.*?)\n", "$1 ")

  /** Account profile extraction with {}-fallback
    * (reference handlers/account_updates.js:2-6).
    */
  def profileOf(jsonMetadata: Column): Column =
    from_json(decodeIfDoubleEncoded(jsonMetadata), Schemas.accountMetadata)
      .getField("profile")

  /** Partition-routing date parts (reference handlers/comments.js:169-170).
    * The engine uses 1-based months — documented delta from JS
    * `getMonth()` (SURVEY §2.8 F9).
    */
  def partitionYear(ts: Column): Column = year(ts)
  def partitionMonth(ts: Column): Column = month(ts)
}
