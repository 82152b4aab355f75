package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main (the ProbeTri family, VERDICT r9 ask #4): times the
  * two k-core peel physical forms — full semi-join peel
  * ([[graft.analytics.GraphOps.kCorePeel]]: degree agg + two edge-list
  * semi-joins per round) vs delta peel
  * ([[graft.analytics.GraphOps.kCorePeelDelta]]: static edge list,
  * per-round degree decrements from the newly-dead set only) — on the
  * real bidirected interaction graph in the q138 shape (k=2 AND k=3,
  * 6 rounds each), min of 3 noop-driven runs, interleaved so
  * JIT/contention hits both. PERF.md records the verdict and which
  * form q138 ships with.
  */
object ProbeKCore {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(name: String, f: () => Unit): Double = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val t0 = System.nanoTime()
      f()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"op":"$name","sec":$s%.2f}""")
      s
    }
    import graft.analytics.GraphOps
    def edges() = graft.Stage.mat(GraphOps.interactionGraph(spark, sfDir))
    def drive(peel: (org.apache.spark.sql.DataFrame, Int, Int) =>
        (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)): Unit = {
      val e = edges()
      Seq(2, 3).foreach { k =>
        val (m, c) = peel(e, k, 6)
        m.crossJoin(org.apache.spark.sql.functions.broadcast(c))
          .write.format("noop").mode("overwrite").save()
      }
    }
    val times = (1 to 3).flatMap { _ =>
      Seq("semijoin" -> run("kcore_semijoin", () => drive(GraphOps.kCorePeel)),
        "delta" -> run("kcore_delta", () => drive(GraphOps.kCorePeelDelta)))
    }
    val best = times.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    println(s"""{"min_semijoin":${best("semijoin")},"min_delta":${best("delta")}}""")
    spark.stop()
  }
}
