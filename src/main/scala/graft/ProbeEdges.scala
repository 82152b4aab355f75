package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, pmod, lit}

/** Attribution probe (VERDICT r11 ask #1): what fraction of the graph
  * family's CPU is the SHARED co-purchase edge derivation
  * ([[graft.analytics.GraphOps.partCoPurchaseEdges]] — basket
  * collect_set + per-basket pair explode + global distinct) vs the
  * kernel proper? Times, min-of-3 with the Bench CPU listener:
  *   (a) the raw derivation (noop write),
  *   (b) the derivation + localCheckpoint materialization
  *       (`Stage.mat`, what q290/q325/q328/q330/q342 actually pay),
  *   (c) the q335 variant (mod-4-filtered lineitem).
  * Per-query derivation share = (b) / the query's bench_detail min-CPU.
  */
object ProbeEdges {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(100).count()

    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) cpuNs.addAndGet(m.executorCpuTime)
        }
      })

    def li = graft.model.Tables(spark, sfDir).lineitem
    val cases: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      ("derive_raw", () => graft.analytics.GraphOps.partCoPurchaseEdges(li)),
      ("derive_mat", () => graft.Stage.mat(
        graft.analytics.GraphOps.partCoPurchaseEdges(li))),
      ("derive_mod4", () => graft.analytics.GraphOps.partCoPurchaseEdges(
        li.filter(pmod(col("l_orderkey"), lit(4)) === 0))),
      // the OTHER shared graph input: the events-derived interaction
      // graph (q117/q138/q142/q150/q208/q311 re-derive it per query)
      ("derive_interaction", () =>
        graft.analytics.GraphOps.interactionGraph(spark, sfDir)),
      // q358's weighted adjacency (edge memo read + part-size weights +
      // both-direction union + localCheckpoint) — the per-run cost its
      // own memo variant would remove
      ("derive_wadj", () => graft.Stage.mat(
        graft.analytics.GraphOps.ssspWeightedAdj(spark, sfDir))))

    // untimed JIT warm-up, then min-of-3 (the Bench discipline)
    cases.foreach { case (_, fn) =>
      fn().write.format("noop").mode("overwrite").save()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    cases.foreach { case (name, fn) =>
      val runs = (1 to 3).map { _ =>
        val c0 = cpuNs.get
        val t0 = System.nanoTime()
        fn().write.format("noop").mode("overwrite").save()
        val r = ((System.nanoTime() - t0) / 1e9, (cpuNs.get - c0) / 1e9)
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        r
      }
      println(f"[edges] $name%-12s wall_min=${runs.map(_._1).min}%.2f " +
        f"cpu_min=${runs.map(_._2).min}%.2f " +
        f"cpu_runs=${runs.map(r => f"${r._2}%.2f").mkString(",")}")
    }
    val n = graft.analytics.GraphOps.partCoPurchaseEdges(li).count()
    println(s"[edges] n_edges=$n")
    spark.stop()
  }
}
