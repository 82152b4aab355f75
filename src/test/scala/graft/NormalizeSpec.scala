package graft

import org.apache.spark.sql.functions._
import graft.ops.Normalize

/** Edge cases from SURVEY.md §5.2 / FIXTURES.md §2 — each pins a behavior
  * of the reference's JSON-repair / tag pipeline
  * (reference handlers/comments.js:22-40, 84-96).
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def tagsFor(jsonMetadata: String): Seq[String] = {
    val meta = Normalize.parsedMetadata(col("jm"))
    Seq(jsonMetadata).toDF("jm")
      .select(Normalize.tagsOf(meta).as("tags"))
      .as[Seq[String]].head()
  }

  test("well-formed metadata parses tags") {
    assert(tagsFor("""{"tags":["a","b"],"image":["u"]}""") === Seq("a", "b"))
  }

  test("double-encoded metadata is re-parsed (comments.js:28-29)") {
    // the JSON document is a *string* containing JSON
    val doubled = "\"{\\\"tags\\\":[\\\"x\\\",\\\"y\\\"]}\""
    assert(tagsFor(doubled) === Seq("x", "y"))
  }

  test("double-encoded metadata prefixed by tab/newline still re-parses") {
    // JSON.parse accepts any JSON whitespace before the payload; the
    // double-encode detector must trim the same class, not just spaces
    val doubled = "{\\\"tags\\\":[\\\"x\\\"]}"
    for (ws <- Seq("\t", "\n", "\r\n", " \t ")) {
      assert(tagsFor(ws + "\"" + doubled + "\"") === Seq("x"), s"prefix ${ws.map(_.toInt)}")
    }
  }

  test("invalid JSON falls back to empty tags (comments.js:37-40)") {
    assert(tagsFor("{not json") === Seq.empty)
    assert(tagsFor("") === Seq.empty)
  }

  test("non-array tags coerce to empty (comments.js:32-35)") {
    assert(tagsFor("""{"tags":"just-a-string"}""") === Seq.empty)
  }

  test("hashtag extraction strips # and joins (comments.js:93-96)") {
    val out = Seq("intro #tag1 mid #tag2 end", "#solo", "none here", "#")
      .toDF("body")
      .select(Normalize.hashtags(col("body")).as("h"))
      .as[String].collect()
    assert(out === Array("tag1 tag2", "solo", "", ""))
  }

  test("stock-image predicate: tags OR parent_permlink route (comments.js:84-91)") {
    val df = Seq(
      (Seq("hivestockimages"), "other", true),
      (Seq("x"), "hive-118554", true),
      (Seq("x"), "other", false),
      (Seq.empty[String], "hivestockimages", true)
    ).toDF("tags", "parent_permlink", "expected")
    val got = df.select(
      Normalize.isStockImagePost(col("tags"), col("parent_permlink")) === col("expected"))
      .as[Boolean].collect()
    assert(got.forall(identity))
  }

  test("reply predicate (comments.js:113-116)") {
    val got = Seq(("", false), ("someone", true))
      .toDF("parent_author", "expected")
      .select(Normalize.isReply(col("parent_author")) === col("expected"))
      .as[Boolean].collect()
    assert(got.forall(identity))
  }

  test("author allowlist predicate (comments.js:61-82, dead-code semantics)") {
    val got = Seq(("minismallholding", true), ("someone-else", false))
      .toDF("author", "expected")
      .select(Normalize.isAllowlistedAuthor(col("author")) === col("expected"))
      .as[Boolean].collect()
    assert(got.forall(identity))
  }

  test("first-newline-only replace matches JS single-replace quirk (comments.js:70)") {
    val out = Seq("a\nb\nc", "no newline").toDF("t")
      .select(Normalize.firstNewlineToSpace(col("t"))).as[String].collect()
    assert(out === Array("a b\nc", "no newline"))
  }

  test("profile extraction with {} fallback (account_updates.js:2-6)") {
    val df = Seq(
      """{"profile":{"name":"alice","about":"hi"}}""",
      """{"other":1}""",
      "not json").toDF("jm")
      .select(Normalize.profileOf(col("jm")).as("p"))
    val rows = df.select(col("p.name")).as[Option[String]].collect()
    assert(rows === Array(Some("alice"), None, None))
  }
}
