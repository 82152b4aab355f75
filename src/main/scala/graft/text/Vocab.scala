package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenizer-training preparation operators: the corpus-statistics
  * passes that precede BPE/vocab construction for an LLM data pipeline.
  *
  * Scale design: everything here is generator → map-side-combined
  * aggregate. The pair/word count tables are the only shuffles and they
  * carry (token, count) pairs — partial aggregation collapses the
  * corpus volume before the exchange, which is the property that makes
  * tokenizer statistics cheap even at 100 TB (the reduced table is
  * vocabulary-sized, millions of rows at most, not corpus-sized).
  */
object Vocab {

  private def words(text: Column): Column =
    filter(TextStats.tokens(lower(text)), w => w =!= lit(""))

  /** Corpus-wide adjacent-pair frequency table over the BPE-ish
    * pre-tokenization ([[TextStats.bpeishTokens]]) — exactly the
    * statistic the first BPE merge selection maximizes. One generator
    * pass (pairs never materialize per document beyond the projection)
    * into one map-side-combined count keyed by the pair.
    */
  def bpePairCounts(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // tokenize in a standalone projection BEFORE the generator: Generate
    // does no common-subexpression elimination, so referencing the
    // tokenizer expression from inside the explode would re-run the
    // regex once per reference (measured 4× the whole query's cost)
    val t = col("toks")
    docs
      .select(TextStats.bpeishTokens(lower(col(textCol))).as("toks"))
      .select(explode(
        when(size(t) < 2, array().cast("array<struct<a:string,b:string>>"))
          .otherwise(transform(sequence(lit(1), size(t) - 1),
            i => struct(element_at(t, i).as("a"), element_at(t, i + 1).as("b"))))).as("p"))
      .groupBy(col("p.a").as("tok_a"), col("p.b").as("tok_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Top-`n` whitespace-token vocabulary by corpus frequency, with a
    * deterministic total order (count desc, then token) so the cut at
    * rank n is engine-portable.
    */
  def topVocab(docs: DataFrame, n: Int, textCol: String = "text"): DataFrame =
    docs.select(explode(words(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("word"))
      .limit(n)

  /** Per-document out-of-vocabulary statistics against the corpus'
    * own top-`vocabSize` vocabulary: token count, OOV count, OOV ratio.
    * The vocab is vocabulary-sized by construction, so it broadcasts;
    * the corpus side is one explode → broadcast left-join → per-doc
    * count aggregate (map-side combined on doc_id).
    */
  def oovStats(docs: DataFrame, vocabSize: Int,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val vocab = topVocab(docs, vocabSize, textCol).select(col("word"), lit(1).as("__in_vocab"))
    docs
      .select(col(idCol).as("doc_id"), explode(words(col(textCol))).as("word"))
      .join(broadcast(vocab), Seq("word"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6).as("oov_ratio"))
  }
}
