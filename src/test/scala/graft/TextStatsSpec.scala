package graft

import org.apache.spark.sql.functions._
import graft.text.TextStats

/** Text-analysis heuristics pinned by construction (the language-ID and
  * quality paths the oracle can't express).
  */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("langId picks the profile with most hits") {
    val rows = Seq(
      (0L, "the cat and the dog is in the house with it"),   // en
      (1L, "der hund und die katze ist von dem haus mit zu"), // de
      (2L, "el perro y la casa de que los es por con"),       // es
      (3L, "le chien est en le jardin et la maison pour un")) // fr
      .toDF("id", "text")
    val got = rows.select(col("id"), TextStats.langIdPredicted(col("text")).as("p"))
      .orderBy("id").as[(Long, String)].collect().map(_._2)
    assert(got === Array("en", "de", "es", "fr"))
  }

  test("bpeish tokens split words, numbers, punctuation") {
    val toks = Seq("hello, world42!").toDF("t")
      .select(TextStats.bpeishTokens(col("t"))).as[Seq[String]].head()
    assert(toks === Seq("hello", ",", "world", "42", "!"))
  }

  test("quality signals on a degenerate repeated document") {
    val (uniq, stop) = Seq("the the the the").toDF("t")
      .select(TextStats.uniqueWordRatio(col("t")), TextStats.stopwordRatio(col("t")))
      .as[(Double, Double)].head()
    assert(uniq === 0.25 && stop === 1.0)
  }

  test("char entropy: single-char text -> 0, uniform alphabet -> ln(k)") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "aaaaaaaa"),                 // one symbol: entropy 0
      (2L, "abcdabcdabcdabcd"),         // 4 symbols uniform: ln(4)
      (3L, "the quick brown fox")       // prose: somewhere in between
    ).toDF("doc_id", "text")
    val e = df.select(col("doc_id"), TextStats.charEntropy(col("text")))
      .as[(Long, Double)].collect().toMap
    assert(e(1L) === 0.0)
    assert(math.abs(e(2L) - math.log(4.0)) < 1e-6)
    assert(e(3L) > 0.0 && e(3L) < math.log(19.0))
  }

  test("mean word length") {
    val m = Seq("ab abcd").toDF("t")
      .select(TextStats.meanWordLength(col("t"))).as[Double].head()
    assert(m === 3.0)
  }

  test("vertical tab (0x0B) is whitespace to the tokenizer — the contract " +
       "the oracle-side explicit class mirrors (ADVICE r3)") {
    // Java regex \s matches VT; DuckDB RE2 \s does not, so every oracle
    // spells the class out via TextStats.wsClassSql. This pins the Spark
    // half: if tokens() ever stops splitting on VT, the class constant
    // and this test must change together.
    val toks = Seq("a\u000Bb c").toDF("t")
      .select(TextStats.tokens(col("t"))).as[Seq[String]].head()
    assert(toks === Seq("a", "b", "c"))
    val bpeish = Seq("x\u000B!").toDF("t")
      .select(TextStats.bpeishTokens(col("t"))).as[Seq[String]].head()
    assert(bpeish === Seq("x", "!"))  // VT itself is not a bpeish token
    assert(TextStats.wsClassSql.contains("""\x0B"""))
  }
}
