package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling main (dev only, deleted before round end): times the
  * named declared queries (min-of-3, noop write) and optionally prints
  * their formatted plans. Usage: runMain graft.Prof q12_distinct_count ...
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(100).count()

    val explain = sys.env.contains("PROF_EXPLAIN")
    // executor CPU per run via task-end metrics (the Bench listener's
    // discipline) so plan rewrites can be judged on CPU, not just wall
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) cpuNs.addAndGet(m.executorCpuTime)
        }
      })
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      val times = (1 to 3).map { _ =>
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        val c0 = cpuNs.get
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, (cpuNs.get - c0) / 1e9)
      }
      println(f"$name%-28s min=${times.map(_._1).min}%.2f cpu_min=${times.map(_._2).min}%.2f  runs=${times.map(t => f"${t._1}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
