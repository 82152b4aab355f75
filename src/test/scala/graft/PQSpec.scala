package graft

import org.apache.spark.sql.functions._
import graft.text.PQ

/** Product quantization: codebook determinism, encode invariants,
  * empty-cell/short-corpus robustness, and the scale-critical plan
  * shapes (encode = pure projection; ADC = broadcast-only join).
  */
class PQSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val m = 4 // subspace width 2

  // 20 deterministic unit-ish vectors
  private def fixture = (0 until 20).map { i =>
    (i.toLong, (0 until dim).map(d => math.sin(i * 7 + d * 3 + 1).toFloat))
  }.toDF("vec_id", "embedding")

  test("pqTrain is deterministic and shaped m x k x (dim/m)") {
    val cb1 = PQ.pqTrain(fixture, m = m, k = 4, dim = dim)
    val cb2 = PQ.pqTrain(fixture, m = m, k = 4, dim = dim)
    assert(cb1 === cb2)
    assert(cb1.length === m)
    assert(cb1.forall(_.length === 4))
    assert(cb1.forall(_.forall(_.length === dim / m)))
  }

  test("pqEncode: codes in range, identical vectors encode identically") {
    val cb = PQ.pqTrain(fixture, m = m, k = 4, dim = dim)
    val dup = fixture.union(fixture.filter(col("vec_id") === 3)
      .select(lit(100L).as("vec_id"), col("embedding")))
    val out = PQ.pqEncode(dup, cb).collect().map(r =>
      r.getLong(0) -> (r.getSeq[Int](1).toSeq, r.getDouble(2))).toMap
    assert(out.size === 21)
    out.values.foreach { case (codes, cos) =>
      assert(codes.length === m)
      assert(codes.forall(c => c >= 0 && c < 4))
      assert(cos <= 1.0 + 1e-9 && cos >= -1.0 - 1e-9)
    }
    assert(out(100L) === out(3L))
  }

  test("corpus smaller than k trains a short codebook without crashing") {
    val tiny = fixture.filter(col("vec_id") < 3)
    val cb = PQ.pqTrain(tiny, m = m, k = 16, dim = dim)
    assert(cb.forall(_.length === 3))
    val enc = PQ.pqEncode(tiny, cb).collect()
    assert(enc.length === 3)
  }

  test("pqEncode plans as a pure projection — no exchange, no join") {
    val cb = PQ.pqTrain(fixture, m = m, k = 4, dim = dim)
    val p = PQ.pqEncode(fixture, cb).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"encode must not shuffle:\n$p")
    assert(!p.contains("Join"), s"encode must not join:\n$p")
  }

  test("adcScores: distance table broadcasts; ADC ranking matches exact L2 on a separable fixture") {
    val cb = PQ.pqTrain(fixture, m = m, k = 4, dim = dim)
    val queries = fixture.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"))
    val adc = PQ.adcScores(PQ.pqEncode(fixture, cb), queries, cb)
    val p = adc.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange"), s"distance table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus side must not SMJ:\n$p")
    val rows = adc.orderBy(col("adc_dist"), col("vec_id"))
      .select("vec_id").as[Long].collect()
    // the query vector itself must rank first: its ADC distance is the
    // reconstruction distance, minimal for its own cell by construction
    assert(rows.length === 20)
    assert(rows.head === 0L)
  }

  test("hardNegativesAdc: label anti-filter holds, exact signature, separable fixture recovered") {
    // Two well-separated clusters + labels: cluster A around +1s
    // (label "a"), cluster B around -1s (label "b"), and one query in
    // cluster A. Its hard negatives must be ONLY label-"b" vectors, and
    // with a shortlist covering the whole corpus the ADC path's top-k
    // must equal the exact q120 shape's top-k (the rerank is exact).
    val pts = (0 until 10).map { i =>
      (i.toLong, (0 until dim).map(d => (1.0 + 0.01 * i + 0.001 * d).toFloat), "a")
    } ++ (10 until 20).map { i =>
      (i.toLong, (0 until dim).map(d => (-1.0 - 0.01 * i + 0.002 * d).toFloat), "b")
    }
    val emb = pts.toDF("vec_id", "embedding", "label")
    val cb = PQ.pqTrain(emb, m = m, k = 4, dim = dim)
    val queries = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"),
        col("label").as("qlabel"))
    val corpus = emb.filter(col("vec_id") > 0)
    val mined = PQ.hardNegativesAdc(corpus, queries, cb, k = 3, shortlistK = 19)
      .orderBy(col("rnk"))
      .select("rnk", "neg_id").as[(Int, Long)].collect()
    assert(mined.length === 3)
    assert(mined.map(_._1).toSeq === Seq(1, 2, 3))
    assert(mined.forall(_._2 >= 10L), s"negatives must carry the other label: ${mined.toSeq}")
    // exact reference on the same corpus (full-shortlist => must agree)
    val wx = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    val exact = corpus.crossJoin(broadcast(queries))
      .filter(col("label") =!= col("qlabel"))
      .withColumn("cos_sim", graft.text.Similarity.cosine(col("embedding"), col("qvec")))
      .withColumn("rnk", row_number().over(wx)).filter(col("rnk") <= 3)
      .orderBy(col("rnk")).select("rnk", "vec_id").as[(Int, Long)].collect()
    assert(mined.toSeq === exact.toSeq)
  }

  test("hardNegativesAdc shortlist keeps the NEAREST codes (ordering direction pinned)") {
    // With the shortlist smaller than the corpus, an inverted ADC sort
    // (DESC) would keep the FARTHEST codes and only surface later as a
    // recall-cert hash failure in the full gate (r7 review) — pin it at
    // unit level. Identical vectors encode to identical codes, so ADC
    // distances are exactly equal within each group and the shortlist
    // decision is unambiguous: qvec-copies (ids 10-12) in, -qvec rows
    // (ids 13-19) out.
    val qv = (0 until dim).map(d => math.sin(d + 1).toFloat)
    val pts = Seq((0L, qv, "a")) ++
      (10 until 13).map(i => (i.toLong, qv, "b")) ++
      (13 until 20).map(i => (i.toLong, qv.map(x => -x), "b"))
    val emb = pts.toDF("vec_id", "embedding", "label")
    val cb = PQ.pqTrain(emb, m = m, k = 4, dim = dim)
    val queries = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qvec"),
        col("label").as("qlabel"))
    val corpus = emb.filter(col("vec_id") > 0)
    val mined = PQ.hardNegativesAdc(corpus, queries, cb, k = 3, shortlistK = 3)
      .select("neg_id").as[Long].collect().toSet
    assert(mined === Set(10L, 11L, 12L),
      s"shortlist must keep the nearest codes, got: $mined")
  }
}
