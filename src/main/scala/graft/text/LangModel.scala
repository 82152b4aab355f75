package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-trained bigram language model → per-document perplexity, the
  * classic quality filter of web-corpus pipelines (score each document
  * under a reference LM; drop the high-perplexity tail). Here the model
  * is add-1-smoothed bigrams trained on the corpus itself, so the whole
  * operator — train AND score — is one relational job with no external
  * model artifact.
  *
  * lp(w1 w2) = ln((c(w1,w2) + 1) / (c(w1) + V));  ppl = exp(−Σlp / n).
  *
  * Parity: counts and V are integers; each bigram's lp is one mirrored
  * IEEE chain snapped round-6; the per-doc sum runs in DECIMAL(25,6)
  * (order-independent), and ppl derives from that exact sum via one
  * division + exp, identical in both engines.
  *
  * Shape at scale: the bigram-instance table is corpus-sized ×1 (same
  * order as a token explode); counts are two map-side-combined
  * aggregations; the score pass joins instances to bigram counts (key
  * (w1,w2), well-spread) and unigram counts (key w1 — Zipf-skewed:
  * stopword keys concentrate, which is exactly what AQE skew-join
  * handles; at extreme scale pre-salt w1 like Salting.saltedAgg). The
  * vocab size rides along as a one-row broadcast.
  */
object LangModel {

  private val D = DecimalType(25, 6)

  def bigramPerplexity(docs: DataFrame,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val t = docs.select(col(idCol).as("doc_id"),
      filter(TextStats.tokens(lower(col(textCol))), t => t =!= lit("")).as("toks"))
    val inst = t.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("z"))
      .select(col("doc_id"), col("z.w1").as("w1"), col("z.w2").as("w2"))
    val uni = t.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bc = inst.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    inst
      .join(bc, Seq("w1", "w2"))
      .join(uni, col("w1") === col("w"))
      .crossJoin(broadcast(vocab))
      .withColumn("lp", round(log(
        (col("c2").cast("double") + 1.0) /
          (col("c1").cast("double") + col("v").cast("double"))), 6))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lp").cast(D)).cast("double").as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("s"), 6).as("logprob"),
        round(exp(col("s") * lit(-1.0) / col("n_bigrams").cast("double")), 6).as("ppl"))
  }
}
