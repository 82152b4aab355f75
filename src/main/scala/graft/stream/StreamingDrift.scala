package graft.stream

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Streaming twin of the q252 Wasserstein-1 drift matrix
  * (`analytics/StatsOps.wasserstein1Pairs`): per key, maintain the
  * RUNNING bucket histogram of an integer feature and emit, once per
  * micro-batch, the W1 distance (ppm·width) between the running
  * distribution and a fixed reference histogram trained in batch — the
  * fit-in-batch / monitor-in-stream deploy split of [[StreamingCusum]].
  * This is the ingest-time "has the incoming data drifted from the
  * corpus I curated against" alarm, with the SAME closed form and the
  * SAME truncating integer arithmetic as the batch operator, so a
  * drained stream equals the batch W1 bit-for-bit (StreamingSpec
  * parity test). Runs on the [[StatefulTwin]] frame; rows fold in
  * `seq` order so the state's lastSeq is the batch max.
  *
  * State per key = the bucket→count map, bounded by the bucket domain
  * (the batch operator's support argument), NOT by the stream length —
  * the property that makes indefinite monitoring safe. Output rows are
  * (key, last seq, n observed, w1_scaled_ppm).
  *
  * STATE-SCHEMA NOTE (ADVICE r9): [[DriftState]] gained the `n` and
  * `lastSeq` fields in round 9. flatMapGroupsWithState state encoding
  * is positional, so a checkpoint written by the earlier two-field-less
  * shape does NOT restore under this class — upgrading a long-lived
  * monitor across that boundary requires a FRESH checkpoint directory
  * (re-seed the reference histogram; the running histogram rebuilds
  * from the replayed source). Any future field change to DriftState
  * carries the same break and must update this note.
  */
object StreamingDrift {

  final case class DriftState(counts: Map[Long, Long], n: Long, lastSeq: Long)

  /** W1 between a histogram and the reference, in the q252 arithmetic:
    * union support, cumulative counts, cdf_ppm = (1e6·cum) DIV n,
    * w1 = width · Σ |cdf_a − cdf_b|. Truncating Long division mirrors
    * SQL DIV on the nonnegative inputs here. */
  private[stream] def w1(run: Map[Long, Long], ref: Map[Long, Long],
                         width: Long): Long = {
    val nRun = run.values.sum
    val nRef = ref.values.sum
    if (nRun == 0L || nRef == 0L) return 0L
    val support = (run.keySet ++ ref.keySet).toArray.sorted
    var cumRun = 0L
    var cumRef = 0L
    var sd = 0L
    support.foreach { bk =>
      cumRun += run.getOrElse(bk, 0L)
      cumRef += ref.getOrElse(bk, 0L)
      sd += math.abs((1000000L * cumRun) / nRun - (1000000L * cumRef) / nRef)
    }
    width * sd
  }

  /** Rows are (key, seq, bucket). One output row per key per
    * micro-batch carrying the post-batch running-vs-reference W1. */
  def monitor(ds: Dataset[(Long, Long, Long)], ref: Map[Long, Long],
              width: Long): Dataset[(Long, Long, Long, Long)] = {
    implicit val stEnc: Encoder[DriftState] = Encoders.product[DriftState]
    implicit val outEnc: Encoder[(Long, Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong)
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    StatefulTwin.perBatch(ds, (r: (Long, Long, Long)) => r._1,
      (r: (Long, Long, Long)) => (r._2, 0L),
      DriftState(Map.empty, 0L, 0L)) {
      case (st, (_, seq, bk)) =>
        DriftState(st.counts.updated(bk, st.counts.getOrElse(bk, 0L) + 1L),
          st.n + 1L, seq)
    } { (key, st) => Iterator((key, st.lastSeq, st.n, w1(st.counts, ref, width))) }
  }
}
