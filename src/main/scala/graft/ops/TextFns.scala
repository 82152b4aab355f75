package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Markdown/HTML text functions (SURVEY.md §2.8 F2-F5, §2.10).
  *
  * The reference renders markdown to HTML (markdown-it), harvests
  * `<img src>` URLs into the metadata image list, then strips the HTML
  * back to plain text (reference handlers/comments.js:43-59). The engine
  * collapses render+strip into one markdown→plain-text transform — the
  * only output the reference ever uses is the plain text and the image
  * URLs, so the HTML intermediate is an implementation detail we skip.
  *
  * `mdToText` is the single genuine UDF in the engine (SURVEY §7.3); the
  * image harvest is pure built-in regexp so it stays codegen'd.
  */
object TextFns {

  /** Minimal CommonMark-subset markdown → plain text. Handles the
    * constructs that appear in Hive post bodies: headers, emphasis,
    * inline/fenced code, links, images, blockquotes, HTML tags, basic
    * entities. Contract pinned by golden tests (TextFnsSpec).
    */
  private[graft] def mdToPlainText(md: String): String = {
    if (md == null) return null
    var s = md
    // fenced code blocks: keep the code, drop the fences
    s = s.replaceAll("(?m)^```[^\n]*$", "")
    // images: ![alt](url) -> alt
    s = s.replaceAll("""!\[([^\]]*)\]\(([^)]*)\)""", "$1")
    // links: [text](url) -> text
    s = s.replaceAll("""\[([^\]]*)\]\(([^)]*)\)""", "$1")
    // headers / blockquotes / list markers at line start
    s = s.replaceAll("(?m)^\\s{0,3}#{1,6}\\s*", "")
    s = s.replaceAll("(?m)^\\s{0,3}>\\s?", "")
    s = s.replaceAll("(?m)^\\s{0,3}[-*+]\\s+", "")
    // emphasis / inline code markers
    s = s.replaceAll("""(\*\*|__)(.*?)\1""", "$2")
    s = s.replaceAll("""(\*|_)(.*?)\1""", "$2")
    s = s.replaceAll("`([^`]*)`", "$1")
    // raw HTML tags (double-parse strip, reference comments.js:53-55)
    s = s.replaceAll("<[^>]+>", "")
    // basic entities
    s = s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")
    s
  }

  private val mdToTextUdf = udf(mdToPlainText _)

  /** body markdown → plain text, with the reference's newline spacing
    * applied (F5: `replace(/\n/g, " \n ")`).
    */
  def mdToText(body: Column): Column =
    Normalize.spaceNewlines(mdToTextUdf(body))

  /** Harvest image URLs from a post body: `<img src="...">` attributes
    * plus markdown `![...](url)` targets, merged with the metadata image
    * list and deduped (reference handlers/comments.js:44-51 collects
    * img@src with an `includes` dedup guard).
    */
  def harvestImages(body: Column, metaImages: Column): Column =
    array_distinct(concat(
      coalesce(metaImages, array().cast("array<string>")),
      coalesce(regexp_extract_all(body, lit("<img[^>]*src=[\"']([^\"']+)[\"']"), lit(1)),
               array().cast("array<string>")),
      coalesce(regexp_extract_all(body, lit("!\\[[^\\]]*\\]\\(([^)\\s]+)[^)]*\\)"), lit(1)),
               array().cast("array<string>"))))
}
