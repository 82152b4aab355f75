package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.Similarity

/** Ad-hoc profiling main (dev only, deleted before round end). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.count()

    def time(label: String)(f: => DataFrame): Unit = {
      (1 to 3).foreach { i =>
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    // A: current banded LSH (distinct-first)
    time("A banded-distinct") {
      Similarity.cosineNearDups(emb, threshold = 0.3499, bands = 140, planesPerBand = 4, dim = 64)
        .select(col("id_a"), col("id_b"), round(col("cos_sim"), 6).as("r"))
        .filter(col("r") >= 0.35)
        .orderBy(col("id_a"), col("id_b"))
    }

    // B: verify-first — attach vectors to band-duplicated candidates,
    // cosine-filter, distinct at the end
    time("B verify-first") {
      val base = emb
        .select(col("vec_id").as("id"), col("embedding").as("v"),
          graft.catalyst.GraftFunctions.hyperplaneBands(
            col("embedding"), 140, 4, 64, Similarity.DefaultSeed).as("bks"))
        .localCheckpoint(true)
      val keys = base.select(col("id"), posexplode(col("bks")).as(Seq("band", "bits")))
      val cand = keys.select(col("band"), col("bits"), col("id").as("id_a"))
        .join(keys.select(col("band"), col("bits"), col("id").as("id_b")), Seq("band", "bits"))
        .filter(col("id_a") < col("id_b"))
      cand
        .join(base.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
        .join(base.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
        .withColumn("cos_sim", Similarity.cosine(col("v_a"), col("v_b")))
        .filter(col("cos_sim") >= 0.3499)
        .select(col("id_a"), col("id_b"), round(col("cos_sim"), 6).as("r"))
        .filter(col("r") >= 0.35)
        .distinct()
        .orderBy(col("id_a"), col("id_b"))
    }

    // C: exact all-pairs (range self-join + fused cosine)
    time("C exact all-pairs") {
      val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
      val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("cos_sim", Similarity.cosine(col("v_a"), col("v_b")))
        .select(col("id_a"), col("id_b"), round(col("cos_sim"), 6).as("r"))
        .filter(col("r") >= 0.35)
        .orderBy(col("id_a"), col("id_b"))
    }

    // D: broadcast-tile brute force — no pair-row materialization
    time("D broadcast-tile") {
      import spark.implicits._
      val tile = emb.select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect().sortBy(_._1)
      val bc = spark.sparkContext.broadcast(tile)
      val out = emb.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
        .mapPartitions { rows =>
          val t = bc.value
          rows.flatMap { case (ida, va) =>
            val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
            var j = 0
            while (j < t.length) {
              val (idb, vb) = t(j)
              if (idb > ida) {
                var dot = 0.0; var na = 0.0; var nb = 0.0
                var d = 0
                while (d < va.length) {
                  val x = va(d).toDouble; val y = vb(d).toDouble
                  dot += x * y; na += x * x; nb += y * y
                  d += 1
                }
                val cos = dot / (math.sqrt(na) * math.sqrt(nb))
                if (cos >= 0.3499) buf += ((ida, idb, cos))
              }
              j += 1
            }
            buf.iterator
          }
        }.toDF("id_a", "id_b", "cos_sim")
      out
        .select(col("id_a"), col("id_b"), round(col("cos_sim"), 6).as("r"))
        .filter(col("r") >= 0.35)
        .orderBy(col("id_a"), col("id_b"))
    }

    spark.stop()
  }
}
