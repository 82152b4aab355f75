package graft

/** Regression pins for the demoted surface (round 13, PERF.md's
  * suite-budget retire clause): each member of [[SparkEntry.demoted]]
  * left the DECLARED bench/correctness surface because its plan
  * duplicates a kept sibling, but the implementation stays exported —
  * this spec pins every member's sf0.001 result to a golden
  * row-count + order-insensitive row-hash captured while the member
  * was still oracle-green at both sf0.01 and sf0.1 (CORRECTNESS_r12 +
  * the round-13 pre-demotion wholesale audit). Regenerate via
  * `runMain graft.GenGoldens` ONLY after re-proving oracle parity
  * (see that main's scaladoc).
  */
class DemotedSurfaceSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private val goldens: Map[String, (Long, String)] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/demoted_goldens.txt"), "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val Array(name, n, h) = line.split(' ')
      name -> ((n.toLong, h))
    }.toMap
    finally src.close()
  }

  test("golden file and demotion list cover exactly the same names") {
    assert(goldens.keySet === SparkEntry.demoted)
  }

  test("every demoted member stays implemented AND oracled in the full surface") {
    assert(SparkEntry.demoted.subsetOf(SparkEntry.allQueries.keySet))
    assert(SparkEntry.demoted.subsetOf(SparkEntry.allOracleSql.keySet))
    // and none of them leaks into the declared surface
    assert(SparkEntry.demoted.intersect(SparkEntry.queries.keySet).isEmpty)
    assert(SparkEntry.demoted.intersect(SparkEntry.oracleSql.keySet).isEmpty)
  }

  SparkEntry.demoted.toSeq.sorted.foreach { name =>
    test(s"$name matches its sf0.001 golden fingerprint") {
      val (n, h) = GenGoldens.fingerprint(
        SparkEntry.allQueries(name)(spark, sfDir))
      assert((n, h) === goldens(name),
        s"$name drifted from its demotion-time fingerprint — if the " +
          "change is intentional, re-prove oracle parity and regenerate " +
          "via runMain graft.GenGoldens")
    }
  }
}
