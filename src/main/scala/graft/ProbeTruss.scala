package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main (the ProbeTri family, VERDICT r10 ask #1): times the
  * two q335 k-truss physical forms — per-round support RE-ENUMERATION
  * (the r10 shipping plan: three full oriented-wedge passes) vs the
  * DELTA peel ([[graft.analytics.GraphOps.kTrussRounds]]: one wedge
  * pass, then triangle-scale semi-join filters) — on the real 25%
  * order-cohort co-purchase graph, min of 3 noop-driven runs each,
  * interleaved so JIT/contention hits both. PERF.md records the ratio
  * and which form q335 ships with.
  */
object ProbeTruss {
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
    // executor CPU per run via task-end metrics (the Bench listener's
    // discipline) — the r10 verdict's 68 s figure is CPU, not wall
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) cpuNs.addAndGet(m.executorCpuTime)
        }
      })
    def run(name: String, f: () => DataFrame): (Double, Double) = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val c0 = cpuNs.get
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      val c = (cpuNs.get - c0) / 1e9
      println(f"""{"op":"$name","sec":$s%.2f,"cpu_sec":$c%.2f}""")
      (s, c)
    }
    def cohortEdges() = graft.Stage.mat(
      graft.analytics.GraphOps.partCoPurchaseEdges(
        li.filter(pmod(col("l_orderkey"), lit(4)) === 0)))
    // the r10 shipping plan: support re-enumerated from scratch per round
    def reenumerated(): DataFrame = {
      var eCur = cohortEdges()
      val rows = (1 to 3).map { r =>
        val sup = graft.Stage.mat(graft.analytics.GraphOps.edgeSupport(eCur))
        val next = graft.Stage.mat(
          sup.filter(col("sup") >= 2).select(col("pa"), col("pb")))
        val row = eCur.agg(count(lit(1)).as("n_edges_in"))
          .crossJoin(sup.agg(expr("coalesce(sum(sup), 0) DIV 3").as("n_tri")))
          .crossJoin(next.agg(count(lit(1)).as("n_kept")))
          .selectExpr(s"CAST($r AS BIGINT) AS round", "n_edges_in", "n_tri",
            "n_kept")
        eCur = next
        row
      }
      rows.reduce(_ unionByName _).orderBy(col("round"))
    }
    val times = (1 to 3).flatMap { _ =>
      Seq("reenum" -> run("truss_reenum", () => reenumerated()),
        "delta" -> run("truss_delta", () =>
          graft.analytics.GraphOps.kTrussRounds(cohortEdges(), 3, 2,
            graft.analytics.GraphOps.triangleList)),
        "delta_adj" -> run("truss_delta_adj", () =>
          graft.analytics.GraphOps.kTrussRounds(cohortEdges(), 3, 2,
            graft.analytics.GraphOps.triangleListAdj)))
    }
    val wall = times.groupBy(_._1).map { case (k, v) => k -> v.map(_._2._1).min }
    val cpu = times.groupBy(_._1).map { case (k, v) => k -> v.map(_._2._2).min }
    println(f"""{"min_reenum":${wall("reenum")}%.2f,"min_delta":${wall("delta")}%.2f,"min_delta_adj":${wall("delta_adj")}%.2f,"cpu_reenum":${cpu("reenum")}%.2f,"cpu_delta":${cpu("delta")}%.2f,"cpu_delta_adj":${cpu("delta_adj")}%.2f}""")
    spark.stop()
  }
}
