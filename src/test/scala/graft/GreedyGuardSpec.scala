package graft

import org.apache.spark.sql.functions._

import graft.analytics.LLMOps

/** VERDICT r7 ask #8: the greedy shortlist-stage operators hold
  * index-sized driver state BY CONTRACT (an n×n sim matrix for MMR, one
  * collected row per k-center pass); these specs pin the require()
  * guards that make the contract mechanical instead of prose.
  */
class GreedyGuardSpec extends SparkSpec {

  private def cand3 = {
    import spark.implicits._
    Seq((1L, Array(1.0f, 0.0f), 900000L),
        (2L, Array(0.0f, 1.0f), 500000L),
        (3L, Array(1.0f, 1.0f), 400000L))
      .toDF("vec_id", "v", "rel_m")
  }

  test("mmrRerank rejects k beyond the greedy-step ceiling") {
    val e = intercept[IllegalArgumentException](
      LLMOps.mmrRerank(cand3, k = LLMOps.MaxGreedySteps + 1))
    assert(e.getMessage.contains("max-coverage"))
  }

  test("mmrRerank rejects a corpus-sized candidate set with the shortlist pointer") {
    val big = spark.range(0, LLMOps.MaxMmrCandidates + 1)
      .selectExpr("id AS vec_id", "array(CAST(id AS FLOAT)) AS v", "id AS rel_m")
    val e = intercept[IllegalArgumentException](LLMOps.mmrRerank(big, k = 3))
    assert(e.getMessage.contains("shortlist"))
  }

  test("mmrRerank rejects lambda outside the ppm grid") {
    val e = intercept[IllegalArgumentException](
      LLMOps.mmrRerank(cand3, k = 2, lamPpm = 1000001L))
    assert(e.getMessage.contains("lamPpm"))
  }

  test("kCenterCoreset rejects k beyond the pass ceiling") {
    val e = intercept[IllegalArgumentException](
      LLMOps.kCenterCoreset(cand3.select(col("vec_id"), col("v")),
        k = LLMOps.MaxGreedySteps + 1))
    assert(e.getMessage.contains("sequential"))
  }

  test("guards admit the contract sizes and the greedy picks stay deterministic") {
    // pick 1 = max rel (vec 1); pick 2 = MMR-balanced: vec 2 (orthogonal
    // to vec 1, sim 0) beats vec 3 (sim 707107 to both)
    val out = LLMOps.mmrRerank(cand3, k = 2).collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq === Seq(1L, 2L))
    val kc = LLMOps.kCenterCoreset(cand3.select(col("vec_id"), col("v")), k = 2)
      .collect()
    assert(kc.length === 2 && kc.map(_.getAs[Long]("step")).toSeq === Seq(1L, 2L))
  }
}
