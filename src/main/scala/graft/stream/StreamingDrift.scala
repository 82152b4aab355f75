package graft.stream

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
  * parity test).
  *
  * State per key = the bucket→count map, bounded by the bucket domain
  * (the batch operator's support argument), NOT by the stream length —
  * the property that makes indefinite monitoring safe. Output rows are
  * (key, last seq, n observed, w1_scaled_ppm).
  */
object StreamingDrift {

  final case class DriftState(counts: Map[Long, Long])

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
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[DriftState, (Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[DriftState]) =>
          val xs = rows.toArray
          var counts = state.getOption.map(_.counts).getOrElse(Map.empty[Long, Long])
          xs.foreach { case (_, _, bk) =>
            counts = counts.updated(bk, counts.getOrElse(bk, 0L) + 1L)
          }
          state.update(DriftState(counts))
          if (xs.isEmpty) Iterator.empty
          else Iterator((key, xs.map(_._2).max, counts.values.sum,
            w1(counts, ref, width)))
      }
  }
}
