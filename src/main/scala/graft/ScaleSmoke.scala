package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-behavior smoke harness (diagnostic main, like [[Prof]]): time
  * the similarity/dedup operators on N× replications of the sf0.1
  * documents fixture and print one JSON line per (operator, N) so the
  * growth CURVE is measured, not argued. Each replica rewrites every
  * token with a replica-unique suffix, so replica vocabularies are
  * disjoint: the near-dup structure inside each replica is preserved
  * (same pairs, shifted ids), duplicate DENSITY stays constant, and a
  * scale-correct operator should grow ~linearly in N — a quadratic
  * kernel would blow up by N².
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ScaleSmoke 1 2 5
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ns = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    def corpus(n: Int): DataFrame =
      (0 until n).map { i =>
        base.select((col("doc_id") + i * 1000000L).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", "$1_r" + i).as("text"))
      }.reduce(_ unionByName _)

    def time(name: String, n: Int)(df: => DataFrame): Unit = {
      // min of two runs, noop-driven (the Bench discipline)
      val ts = (1 to 2).map { _ =>
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"op":"$name","n":$n,"sec":${ts.min}%.2f}""")
    }

    ns.foreach { n =>
      val c = corpus(n)
      time("prefix_jaccard_join_t0.4", n)(graft.text.Dedup.jaccardJoinPrefix(c, 0.4))
      time("minhash_neardup_t0.8", n)(graft.text.Dedup.minhashNearDups(c, 0.8, numHashes = 16, bands = 16))
      time("dup_span_coverage", n)(graft.text.Dedup.dupSpanCoverage(c, 8))
    }

    // Graph battery (VERDICT r7 ask #5): the suite's most expensive
    // queries are graph-iterative, so their growth curve must be
    // measured too. N disjoint copies of the declared interaction
    // graph — every node id suffixed per replica — keep per-node degree
    // CONSTANT while nodes and edges grow N×, so a scale-correct
    // join+agg-per-iteration implementation grows ~linearly; any Σdeg²
    // wedge term (the q158 failure mode) or label-skew blowup shows as
    // super-linear immediately.
    val g1 = graft.analytics.GraphOps.interactionGraph(spark, sfDir)
      .select(col("src"), col("dst"))
    def graphN(n: Int): DataFrame =
      (0 until n).map { i =>
        g1.select(concat(col("src"), lit(s"_r$i")).as("src"),
          concat(col("dst"), lit(s"_r$i")).as("dst"))
      }.reduce(_ unionByName _)

    ns.foreach { n =>
      val g = graphN(n)
      time("pagerank_undirected_i3", n)(graft.analytics.GraphOps.pageRankMicros(g))
      time("pagerank_directed_i3", n)(graft.analytics.GraphOps.pageRankDirectedMicros(g))
      time("kcore_k2_r4", n)(graft.analytics.GraphOps.kCorePeel(g, 2, 4)._1)
      time("label_prop_i3", n)(graft.analytics.GraphOps.labelPropagation(g))
      time("modularity_lpa1", n)(graft.analytics.GraphOps.modularityPpm(g,
        graft.analytics.GraphOps.labelPropagation(g, 1)))
    }
    spark.stop()
  }
}
