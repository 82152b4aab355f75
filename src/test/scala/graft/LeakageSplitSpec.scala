package graft

import org.apache.spark.sql.functions._
import graft.text.{Dedup, TextStats}

/** Leakage-safe split: the defining invariant is that every near-dup
  * cluster lands entirely on one side of the split.
  */
class LeakageSplitSpec extends SparkSpec {
  import spark.implicits._

  test("all members of a near-dup cluster receive the same split assignment") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (0L, base), (1L, base + " extra"), (2L, base),            // near-dup cluster
      (3L, "completely different text about spark plans and shuffles"),
      (4L, "another unrelated document mentioning parquet and codegen")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(docs, threshold = 0.6, numHashes = 16, bands = 16)
    val cc = Dedup.connectedComponents(pairs).select(col("doc_id"), col("cluster_id"))
    val split = docs.select(col("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("split",
        when(pmod(TextStats.portableHash64(
          concat(lit("split:"), col("cluster_id").cast("string"))), lit(100L)) < 80,
          lit("train")).otherwise(lit("test")))
    val perCluster = split.groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("nsplits"))
      .as[(Long, Long)].collect()
    assert(perCluster.nonEmpty)
    assert(perCluster.forall(_._2 == 1L), s"cluster straddles the split: ${perCluster.toSeq}")
    // docs 0,1,2 really did cluster together
    val c = split.filter(col("doc_id") < 3).select(col("cluster_id")).distinct().count()
    assert(c === 1L)
  }

  test("hard negatives never share the query's label and rank by cosine") {
    val emb = (0 until 30).map { i =>
      (i.toLong, (0 until 8).map(d => math.sin(i + d * 2 + 1).toFloat), i % 3)
    }.toDF("vec_id", "embedding", "label")
    val queries = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"), col("label").as("qlabel"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    val negs = emb.filter(col("vec_id") > 0).crossJoin(broadcast(queries))
      .filter(col("label") =!= col("qlabel"))
      .withColumn("cos_sim", graft.text.Similarity.cosine(col("embedding"), col("qvec")))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select(col("label"), col("cos_sim"), col("rnk"))
      .collect()
    assert(negs.length === 5)
    assert(negs.forall(_.getInt(0) != 0))
    val ordered = negs.sortBy(_.getInt(2)).map(_.getDouble(1)).toSeq
    assert(ordered === ordered.sorted.reverse)
  }
}
