package graft

import org.apache.spark.sql.functions._
import graft.text.Similarity

/** Similarity-search correctness: brute-force cosine is the ground
  * truth; the LSH-bucketed variant is measured against it for recall.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private def vecs = {
    val rng = new scala.util.Random(1)
    (0 until 200).map(i => (i.toLong, Seq.fill(dim)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("cosine: identical vectors -> 1.0, orthogonal -> 0.0") {
    val df = Seq((Seq(1f, 0f), Seq(1f, 0f), Seq(0f, 1f))).toDF("a", "b", "c")
    val (same, orth) = df.select(
      Similarity.cosine(col("a"), col("b")), Similarity.cosine(col("a"), col("c")))
      .as[(Double, Double)].head()
    assert(math.abs(same - 1.0) < 1e-12 && math.abs(orth) < 1e-12)
  }

  test("brute-force top-k: query vector's own copy ranks first") {
    val query = vecs.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val top = Similarity.bruteForceTopK(vecs, query, 5)
      .select("vec_id").as[Long].collect()
    assert(top.head === 0L)
  }

  test("LSH bucket assignment is deterministic and bounded") {
    val b = vecs.select(Similarity.lshBucket(col("embedding"), 4, dim).as("b"))
      .agg(min("b"), max("b")).as[(Int, Int)].head()
    assert(b._1 >= 0 && b._2 < 16)
  }

  test("LSH top-k achieves nontrivial recall vs brute force") {
    val query = vecs.filter(col("vec_id") === 7).select(col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(vecs, query, 10)
      .select("vec_id").as[Long].collect().toSet
    val approx = Similarity.lshTopK(vecs, query, 10, nPlanes = 2, dim = dim)
      .select("vec_id").as[Long].collect().toSet
    // 2 planes -> 4 buckets -> ~50 of 200 vectors scanned; the query's own
    // bucket must contain the query vector itself and some true neighbors
    assert(approx.contains(7L))
    assert((exact intersect approx).size >= 3)
  }

  test("IVF: assignment covers the corpus; probed top-k achieves recall") {
    val (assigned, centroids) = Similarity.ivfAssign(vecs, nCentroids = 8)
    assert(assigned.count() === 200)
    assert(assigned.select("centroid_id").distinct().count() <= 8)
    val query = vecs.filter(col("vec_id") === 11).select(col("embedding").as("qvec"))
    val exact = Similarity.bruteForceTopK(vecs, query, 10)
      .select("vec_id").as[Long].collect().toSet
    val approx = Similarity.ivfTopK(assigned, centroids, query, 10, nProbe = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(approx.contains(11L), "query's own vector must be found")
    assert((exact intersect approx).size >= 3,
      s"IVF recall too low: ${(exact intersect approx).size}/10")
  }

  test("per-query top-k fans out over a query set") {
    val queries = vecs.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val out = Similarity.topKPerQuery(vecs, queries, 4)
    assert(out.count() === 12)
    val own = out.filter(col("rn") === 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
    assert(own.forall(p => p._1 == p._2))
  }
}
