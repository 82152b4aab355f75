package graft

import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the round-7 temporal operators (the rest
  * of TemporalOps is pinned by the q50/q51/q52/q69 oracles and
  * MiningOpsSpec's interval-overlap case).
  */
class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  test("SCD2 history compresses runs and stitches validity intervals") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // user 7: A A B A  → 3 versions: A[10:00,10:20) B[10:20,10:30) A[10:30,∞)
    val dir = java.nio.file.Files.createTempDirectory("scd2_fix").toString
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "A", 0.0, "{}"),
      (2L, ts("2024-01-01 10:10:00"), 7L, "A", 0.0, "{}"),
      (3L, ts("2024-01-01 10:20:00"), 7L, "B", 0.0, "{}"),
      (4L, ts("2024-01-01 10:30:00"), 7L, "A", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q157_scd2_history")(spark, dir).collect()
    assert(out.length === 3)
    val v = out.map(r => (r.getAs[Long]("version"), r.getAs[String]("state"),
      r.getAs[Timestamp]("valid_from"), Option(r.getAs[Timestamp]("valid_to")),
      r.getAs[Boolean]("is_current")))
    assert(v(0) === ((1L, "A", ts("2024-01-01 10:00:00"),
      Some(ts("2024-01-01 10:20:00")), false)))
    assert(v(1) === ((2L, "B", ts("2024-01-01 10:20:00"),
      Some(ts("2024-01-01 10:30:00")), false)))
    assert(v(2) === ((3L, "A", ts("2024-01-01 10:30:00"), None, true)))
  }

  test("EWMA replays the integer recurrence in event order") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // values 1, 2, 4 with α=0.3: s1=1e6; s2=(0.3·2+0.7·1)e6=1.3e6;
    // s3=(0.3·4+0.7·1.3)e6=2.11e6 — every step floored
    val dir = java.nio.file.Files.createTempDirectory("ewma_fix").toString
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 10:01:00"), 7L, "view", 2.0, "{}"),
      (3L, ts("2024-01-01 10:02:00"), 7L, "view", 4.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q162_ewma")(spark, dir).collect().head
    assert(r.getAs[Long]("n_events") === 3L)
    assert(r.getAs[Long]("ewma_micros") === 2110000L)
  }

  test("gap-fill densifies the per-user span and forward-fills from the last observed day") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // user 7 views Jan 1 (1.5) and Jan 3 (2.0 + 0.5): Jan 2 is absent
    // from the data but must appear filled with Jan 1's sum; the
    // purchase row must not leak into the view resample
    val dir = java.nio.file.Files.createTempDirectory("gapfill_fix").toString
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "view", 1.5, "{}"),
      (2L, ts("2024-01-03 09:00:00"), 7L, "view", 2.0, "{}"),
      (3L, ts("2024-01-03 11:00:00"), 7L, "view", 0.5, "{}"),
      (4L, ts("2024-01-02 10:00:00"), 7L, "purchase", 99.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q166_gapfill")(spark, dir).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("n_obs"), r.getAs[Boolean]("is_filled"),
        r.getAs[Long]("filled_sum_micros")))
    assert(out.toSeq === Seq(
      ("2024-01-01", 1L, false, 1500000L),
      ("2024-01-02", 0L, true, 1500000L),
      ("2024-01-03", 2L, false, 2500000L)))
  }
}
