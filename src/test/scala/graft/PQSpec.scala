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
}
