package graft

import org.apache.spark.sql.functions._
import graft.analytics.GraphOps

/** Integer-micros PageRank: hand-computed star-graph values, mass
  * accounting, and determinism.
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def star = Seq(
    ("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")
  ).toDF("src", "dst")

  test("one iteration on the 3-node star matches hand-computed micros") {
    // N=3, init=333333, base=15000000/300=50000, outdeg a=2, b=c=1.
    // a receives 333333+333333=666666 -> 50000 + (85*666666) div 100 = 616666
    // b,c each receive 333333 div 2 = 166666 -> 50000 + (85*166666) div 100 = 191666
    val r = GraphOps.pageRankMicros(star, iters = 1).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r === Map("a" -> 616666L, "b" -> 191666L, "c" -> 191666L))
  }

  test("rank mass stays within the floored-division decay envelope") {
    val rs = GraphOps.pageRankMicros(star, iters = 3)
      .select("rank_m").as[Long].collect()
    // total mass starts at ~1e6 and each division floors away <1 micro
    // per edge per iteration (4 edges, damping + base rounding ~tens)
    assert(rs.sum <= 1000000L)
    assert(rs.sum >= 1000000L - 100L)
    assert(rs.forall(_ > 0L))
  }

  test("an empty edge list yields an empty rank table, not a driver division by zero") {
    val empty = star.limit(0)
    val r = GraphOps.pageRankMicros(empty, iters = 3)
    assert(r.columns.toSeq === Seq("node", "rank_m", "rank_r"))
    assert(r.count() === 0L)
  }

  test("hub outranks leaves and the result is deterministic") {
    val r1 = GraphOps.pageRankMicros(star, iters = 3).orderBy("node").collect().toSeq
    val r2 = GraphOps.pageRankMicros(star, iters = 3).orderBy("node").collect().toSeq
    assert(r1 === r2)
    val m = r1.map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(m("a") > m("b") && m("a") > m("c"))
  }
}
