package graft

import org.scalatest.funsuite.AnyFunSuite

/** Forks a fresh JVM for [[MemoClusterSmoke]] — the suites share one
  * local[4] SparkContext and a JVM allows only one, so the
  * local-cluster session cannot be built in-process. The smoke proves
  * the edge-table memo's spill is readable from executor JVMs that are
  * NOT the driver (VERDICT r13 ask #1's cluster-mode check).
  */
class MemoClusterSpec extends AnyFunSuite {
  test("edgeTableMemo round-trips through separate executor JVMs (local-cluster smoke)") {
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val addOpens = MemoClusterSmoke.jdk17AddOpens
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.MemoClusterSmoke", "/root/testdata/sf0.001")
    val out = new StringBuilder
    import scala.sys.process._
    // the in-process standalone Worker builds the executor launch
    // command from the environment: it needs a real SPARK_HOME (the
    // image ships the matching 4.1.2 distribution at /opt/spark) and
    // the scala version so it skips source-tree build-dir detection
    val rc = Process(cmd, None,
      "SPARK_HOME" -> "/opt/spark",
      "SPARK_SCALA_VERSION" -> "2.13").!(ProcessLogger(
      l => out.synchronized { out.append(l).append('\n') },
      l => out.synchronized { out.append(l).append('\n') }))
    assert(rc === 0, s"smoke JVM failed (rc=$rc):\n${out.toString.takeRight(4000)}")
    assert(out.toString.contains("MEMO_CLUSTER_SMOKE_OK"),
      out.toString.takeRight(4000))
  }
}
