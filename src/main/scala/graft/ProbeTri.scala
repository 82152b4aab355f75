package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main (the Prof/ScaleSmoke family): times the two
  * triangle-census physical forms — wedge join ([[graft.analytics
  * .GraphOps.triangleCensus]]) vs compact adjacency-array intersection
  * ([[graft.analytics.GraphOps.triangleCensusAdj]], VERDICT r8 ask #6)
  * — on the real part co-purchase graph, min of 3 noop-driven runs
  * each, interleaved so JIT/contention hits both. PERF.md records the
  * verdict and which form q257 ships with.
  */
object ProbeTri {
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
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def run(name: String, f: () => org.apache.spark.sql.DataFrame): Double = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"op":"$name","sec":$s%.2f}""")
      s
    }
    def edges() = graft.Stage.mat(
      graft.analytics.GraphOps.partCoPurchaseEdges(li))
    val times = (1 to 3).flatMap { _ =>
      Seq("wedge" -> run("tri_wedge", () =>
            graft.analytics.GraphOps.triangleCensus(edges())),
        "adj" -> run("tri_adj", () =>
            graft.analytics.GraphOps.triangleCensusAdj(edges())),
        "adj_sz" -> run("tri_adj_sz", () =>
            graft.analytics.GraphOps.triangleCensusAdjSz(edges())))
    }
    val best = times.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    println(s"""{"min_wedge":${best("wedge")},"min_adj":${best("adj")},"min_adj_sz":${best("adj_sz")}}""")
    spark.stop()
  }
}
