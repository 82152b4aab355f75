package graft

/** Regression pins for [[SparkEntry.goldenPinned]]: 39 statistical
  * variants whose sf0.001 results are pinned to a golden row-count +
  * order-insensitive row-hash captured while each was oracle-green at
  * both sf0.01 and sf0.1 (CORRECTNESS_r12 + the round-13 wholesale
  * audit). These members are part of the DECLARED surface like every
  * other query (an interrupted round-13 session demoted them; the
  * demotion was reverted the same round — see SparkEntry.goldenPinned's
  * scaladoc); the goldens stay as free extra coverage for the plan
  * families they sample. Regenerate via `runMain graft.GenGoldens`
  * ONLY after re-proving oracle parity (see that main's scaladoc).
  */
class GoldenPinnedSpec extends SparkSpec {
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

  test("golden file and pinned list cover exactly the same names") {
    assert(goldens.keySet === SparkEntry.goldenPinned)
  }

  test("every pinned member is declared AND oracled") {
    assert(SparkEntry.goldenPinned.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.goldenPinned.subsetOf(SparkEntry.oracleSql.keySet))
  }

  SparkEntry.goldenPinned.toSeq.sorted.foreach { name =>
    test(s"$name matches its sf0.001 golden fingerprint") {
      val (n, h) = GenGoldens.fingerprint(
        SparkEntry.queries(name)(spark, sfDir))
      assert((n, h) === goldens(name),
        s"$name drifted from its pin-time fingerprint — if the " +
          "change is intentional, re-prove oracle parity and regenerate " +
          "via runMain graft.GenGoldens")
    }
  }
}
