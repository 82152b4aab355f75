package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.text.Bloom

/** Bloom membership sketch: the no-false-negative contract (the property
  * the q92 oracle certifies per document), the statistical FPR bound
  * (which the oracle cannot pin), and the plan shape of the probe.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom probe has zero false negatives and an fpp-bounded false-positive rate") {
    val members = (0L until 5000L).map(i => i * 2654435761L + 17)
    val bloom = Bloom.buildLongBloom(members.toDF("v"), "v", fpp = 0.01)
    val flagged = members.toDF("v").filter(Bloom.mightContain(bloom, col("v"))).count()
    assert(flagged === members.size.toLong, "a Bloom filter must never miss a member")
    // disjoint probe set: observed FPR within 3x of the 1% budget
    val nonMembers = (1L to 20000L).map(i => -i * 40503L + 7)
    val fp = nonMembers.toDF("v").filter(Bloom.mightContain(bloom, col("v"))).count()
    assert(fp.toDouble / nonMembers.size < 0.03, s"observed FPR ${fp.toDouble / nonMembers.size}")
  }

  test("round-trip: serialized sketch deserializes to the same membership") {
    val members = Seq(1L, 99L, -4096L)
    val bloom = Bloom.buildLongBloom(members.toDF("v"), "v", fpp = 0.001)
    val bf = Bloom.readBloom(bloom)
    assert(members.forall(bf.mightContainLong))
  }

  test("bloomContaminationFlag flags the planted overlap; clean docs stay clean at tiny fpp") {
    // corpus docs 1..20 share a 6-token span with the reference doc 0;
    // docs 100+ are disjoint. The sketch is overprovisioned (sized for
    // 1000 items though the reference has ~10 shingles) so the realized
    // FPR sits on the theory curve — at fpp 1e-6 and ~200 clean probes
    // the chance of any false positive is ~2e-4, and the sketch hash is
    // deterministic for a fixed fixture, so this test is stable.
    val shared = "alpha bravo charlie delta echo foxtrot"
    val reference = Seq((0L, s"$shared golf hotel india juliet kilo lima")).toDF("doc_id", "text")
    val corpus = ((1 to 20).map(i =>
        (i.toLong, s"$shared unique$i filler${i}a filler${i}b filler${i}c")) ++
      (100 to 119).map(i =>
        (i.toLong, (0 until 12).map(j => s"clean${i}_$j").mkString(" ")))).toDF("doc_id", "text")
    val bsh = reference.select(explode(graft.text.Dedup.shingleHashes(col("text"), 3)).as("sh"))
      .distinct()
    val bloom = Bloom.buildLongBloom(bsh, "sh", fpp = 1e-6, expectedItems = Some(1000L))
    val out = Bloom.bloomContaminationFlag(corpus, bloom)
      .select("doc_id", "flagged").as[(Long, Boolean)].collect().toMap
    (1 to 20).foreach(i => assert(out(i.toLong), s"doc $i shares a span and must flag"))
    (100 to 119).foreach(i => assert(!out(i.toLong), s"doc $i is clean and must not flag"))
  }

  test("stateless flag treats null text as NOT flagged — batch-form parity") {
    // shingleHashes null-propagates, so exists() alone would return null
    // for a null-text doc while the batch join+agg form says false; the
    // coalesce pins the two forms equal (r7 review).
    val bloom = Bloom.buildLongBloom(Seq(1L, 2L).toDF("v"), "v")
    val docs = Seq((1L, Some("some perfectly ordinary text here today")),
      (2L, None: Option[String])).toDF("doc_id", "text")
    val stateless = Bloom.contaminationFlagStateless(docs, bloom)
      .orderBy("doc_id").as[(Long, Boolean)].collect().toSeq
    val batch = Bloom.bloomContaminationFlag(docs, bloom)
      .orderBy("doc_id").select("doc_id", "flagged").as[(Long, Boolean)].collect().toSeq
    assert(stateless === batch)
    assert(stateless === Seq((1L, false), (2L, false)))
  }

  test("bloom probe runs unchanged under Structured Streaming (stateless predicate)") {
    // the probe is a pure codegen'd predicate, so the SAME expression
    // must serve the live-ingest path with no modification — incremental
    // dedup against yesterday's corpus sketch, applied to today's stream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val members = (0L until 1000L).map(i => i * 7919L)
    val bloom = Bloom.buildLongBloom(members.toDF("v"), "v", fpp = 1e-6,
      expectedItems = Some(10000L))
    val mem = MemoryStream[Long]
    val q = mem.toDS().toDF("v")
      .filter(Bloom.mightContain(bloom, col("v")))
      .writeStream.outputMode("append").format("memory").queryName("bloom_out").start()
    mem.addData(0L, 7919L, 1L, 2L, 999L * 7919L, 12345L)
    q.processAllAvailable()
    val flagged = spark.table("bloom_out").as[Long].collect().toSet
    q.stop()
    assert(flagged === Set(0L, 7919L, 999L * 7919L))
  }

  test("sketches are shard-mergeable: partials union to the whole (the 100 TB property)") {
    // every sketch the engine exposes must give the SAME answer built
    // shard-by-shard-then-merged as built in one pass — that is what
    // makes them computable as partial aggregates across executors.
    // CMS: counter arrays add, so estimates match exactly.
    import org.apache.spark.util.sketch.CountMinSketch
    val words = (1 to 500).map(i => s"w${i % 37}")
    def cmsOf(xs: Seq[String]): CountMinSketch = {
      val b = xs.toDF("w").agg(expr("count_min_sketch(w, 0.01d, 0.99d, 42)"))
        .head().getAs[Array[Byte]](0)
      CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b))
    }
    val (h1, h2) = words.splitAt(260)
    val merged = cmsOf(h1)
    merged.mergeInPlace(cmsOf(h2))
    val global = cmsOf(words)
    val probes = (0 until 37).map(i => s"w$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(probes.forall(p => merged.estimateCount(p) === global.estimateCount(p)))
    // HLL: registers max-merge, so the unioned estimate equals single-pass.
    val df = (1L to 2000L).toDF("v")
    val unioned = df.withColumn("shard", col("v") % 4)
      .groupBy("shard").agg(expr("hll_sketch_agg(v)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).head().getLong(0)
    val single = df.agg(expr("hll_sketch_estimate(hll_sketch_agg(v))")).head().getLong(0)
    assert(unioned === single)
    // Bloom: bit-OR merge preserves the no-false-negative contract.
    val b1 = Bloom.readBloom(Bloom.buildLongBloom(
      (1L to 1000L).toDF("v"), "v", fpp = 0.01, expectedItems = Some(4096L)))
    val b2 = Bloom.readBloom(Bloom.buildLongBloom(
      (1001L to 2000L).toDF("v"), "v", fpp = 0.01, expectedItems = Some(4096L)))
    b1.mergeInPlace(b2)
    assert((1L to 2000L).forall(b1.mightContainLong))
  }

  test("bloom probe is a pure filter: the sketch never joins, text never shuffles") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bsh = docs.filter(col("doc_id") % 50 === 0)
      .select(explode(graft.text.Dedup.shingleHashes(col("text"), 3)).as("sh")).distinct()
    val bloom = Bloom.buildLongBloom(bsh, "sh", fpp = 0.01)
    val p = Bloom.bloomContaminationFlag(docs.filter(col("doc_id") % 50 =!= 0), bloom)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("might_contain"), s"probe must plan as the native predicate:\n$p")
    // the only join is re-attaching per-doc hit counts to the id list —
    // the reference set itself must never appear as a join side
    assert(!p.contains("SortMergeJoin"), s"no sort-merge join anywhere:\n$p")
    val exchanges = p.linesIterator.filter(_.contains("Arguments: hashpartitioning")).toSeq
    assert(exchanges.forall(!_.contains("text")),
      s"text must be projected away before any shuffle:\n${exchanges.mkString("\n")}")
  }
}
