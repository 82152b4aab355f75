package graft

import org.apache.spark.sql.functions._
import graft.ops.TextFns

/** Golden contract for the markdown→text UDF and image harvest
  * (SURVEY.md §2.8 F2-F5; reference handlers/comments.js:43-59).
  */
class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("markdown strips to plain text") {
    assert(TextFns.mdToPlainText("# Title\n**bold** and *it* and `code`")
      === "Title\nbold and it and code")
    assert(TextFns.mdToPlainText("[link text](http://x.com) stays")
      === "link text stays")
    assert(TextFns.mdToPlainText("![alt words](http://img.png) here")
      === "alt words here")
    assert(TextFns.mdToPlainText("<div>html <b>inner</b></div>")
      === "html inner")
    assert(TextFns.mdToPlainText("a &amp; b &lt;c&gt;") === "a & b <c>")
    assert(TextFns.mdToPlainText(null) === null)
  }

  test("newline spacing applied on the Column path (F5)") {
    val out = Seq("line1\nline2").toDF("body")
      .select(TextFns.mdToText(col("body")).as("t")).as[String].head()
    assert(out === "line1 \n line2")
  }

  test("image harvest merges html img, markdown images, metadata; dedups (comments.js:44-51)") {
    val df = Seq((
      """pre <img src="http://a.png"> mid ![x](http://b.png) <img src='http://a.png'>""",
      Seq("http://meta.png", "http://a.png"))).toDF("body", "meta_images")
    val got = df.select(TextFns.harvestImages(col("body"), col("meta_images")).as("i"))
      .as[Seq[String]].head()
    assert(got === Seq("http://meta.png", "http://a.png", "http://b.png"))
  }

  test("image harvest tolerates null body and null metadata") {
    val df = Seq((Option.empty[String], Option.empty[Seq[String]]))
      .toDF("body", "meta_images")
    val got = df.select(TextFns.harvestImages(col("body"), col("meta_images")).as("i"))
      .as[Seq[String]].head()
    assert(got === Seq.empty)
  }
}
