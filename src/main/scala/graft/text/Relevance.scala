package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term relevance — the classic text-analytics weighting used for
  * keyword extraction, near-duplicate triage, and quality filtering.
  *
  * Shape at scale: term frequencies are one explode → groupBy(doc, term);
  * document frequencies are a second groupBy over the per-doc DISTINCT
  * term explode; the df table joins back by term (dictionary-sized — at
  * corpus scale it stays far smaller than the corpus and broadcast-joins
  * after AQE sizes it); the corpus count rides along as a one-row
  * broadcast. Top-k per doc is a bounded window rank.
  *
  * Parity note: scores cross engines through `ln` — both JVM and DuckDB
  * evaluate correctly-rounded libm doubles on the small set of distinct
  * (n_docs/df) inputs, and ordering/output both use the round-6 snapped
  * score, so a 1-ulp disagreement cannot flip row order or hashes (the
  * ADVICE-r3 threshold-snap discipline applied to ranking).
  */
object Relevance {

  def tfIdfTopTerms(docs: DataFrame, k: Int,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val terms = docs.select(col(idCol).as("doc_id"),
      explode(TextStats.tokens(lower(col(textCol)))).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(TextStats.tokens(lower(col(textCol))))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(total))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("rn"), col("term"), col("tf"), col("df"), col("tfidf"))
  }
}
