package graft.stream

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Streaming twin of q322's run counter (the Wald–Wolfowitz core): per
  * key, consume an ordered ±sign stream (dichotomization happens
  * upstream against a FIXED reference — a prior-window median, a spec
  * limit — because a global median is not streamable one-pass) and
  * maintain (n, n_above, runs), where a run opens on the first row and
  * on every sign flip. The drained state row feeds the same z² formula
  * the batch query applies — the live "is this feed still mixing"
  * monitor beside [[StreamingCusum]]'s mean-shift alarm.
  *
  * Runs on the [[StatefulTwin]] frame (sequential recurrence: the fold
  * IS the statistic). State is four longs per key — O(keys), never
  * O(stream). A restart resumes from the checkpointed last sign, so a
  * flip that straddles the restart counts exactly once (StreamingSpec
  * pins this).
  */
object StreamingRuns {

  /** n = rows seen; last = previous sign (−1 before any row);
    * runs = maximal same-sign blocks; nAbove = rows with sign 1. */
  final case class RunsState(n: Long, last: Long, runs: Long, nAbove: Long)

  /** Rows are (key, seq, sgn ∈ {0, 1}). One output row per key per
    * micro-batch: (key, n, n_above, runs).
    */
  def maintain(ds: Dataset[(Long, Long, Long)]): Dataset[(Long, Long, Long, Long)] = {
    implicit val stEnc: Encoder[RunsState] = Encoders.product[RunsState]
    implicit val outEnc: Encoder[(Long, Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong)
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    StatefulTwin.perBatch(ds, (r: (Long, Long, Long)) => r._1,
      (r: (Long, Long, Long)) => (r._2, 0L),
      RunsState(0L, -1L, 0L, 0L)) {
      case (st, (_, _, sgn)) =>
        val flip = st.n == 0L || sgn != st.last
        RunsState(st.n + 1L, sgn, st.runs + (if (flip) 1L else 0L),
          st.nAbove + (if (sgn == 1L) 1L else 0L))
    } { (k, st) => Iterator((k, st.n, st.nAbove, st.runs)) }
  }
}
