package graft.stream

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Streaming twin of the q280 time-weighted average: per key the open
  * position (last observation's time and value) plus the running
  * Σ v·Δt / Σ Δt accumulators, maintained on the [[StatefulTwin]]
  * frame. The monitoring read "what level has this signal HELD, not
  * merely printed" stays live as ticks arrive — including across
  * micro-batch boundaries: the hold that SPANS a batch boundary (or a
  * checkpoint restart) is credited when its closing tick arrives,
  * which only works if the open position survived in state — the
  * restart test's proof obligation.
  *
  * Σ v·Δt exceeds a long at realistic magnitudes (5e8 micros ×
  * month-scale µs holds), exactly why the batch side runs DECIMAL(38);
  * the twin carries the accumulator as a BigInt rendered to a string
  * field — still O(1) state per key — and divides exactly on emit, so
  * the drained output matches the batch q280 arithmetic bit-for-bit
  * given the ordered-feed contract stated on [[StatefulTwin]].
  *
  * Rows: (key, tm_micros, seq, v_micros); emits per batch
  * (key, n_held, twap_micros, mean_micros).
  */
object StreamingTwap {

  final case class TwapState(opened: Long, nHeld: Long, lastTm: Long,
                             lastSeq: Long, lastV: Long, sumV: Long,
                             sumDt: Long, sumVdt: String)

  def twap(ds: Dataset[(String, Long, Long, Long)])
      : Dataset[(String, Long, Long, Long)] = {
    implicit val stEnc: Encoder[TwapState] = Encoders.product[TwapState]
    implicit val outEnc: Encoder[(String, Long, Long, Long)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong)
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    StatefulTwin.perBatch(ds, (r: (String, Long, Long, Long)) => r._1,
      (r: (String, Long, Long, Long)) => (r._2, r._3),
      TwapState(0L, 0L, 0L, 0L, 0L, 0L, 0L, "0")) {
      case (st, (_, tm, seq, v)) =>
        if (st.opened == 1L) {
          val dt = tm - st.lastTm
          val vdt = BigInt(st.sumVdt) + BigInt(st.lastV) * BigInt(dt)
          st.copy(nHeld = st.nHeld + 1L, lastTm = tm, lastSeq = seq,
            lastV = v, sumV = st.sumV + st.lastV, sumDt = st.sumDt + dt,
            sumVdt = vdt.toString)
        } else TwapState(1L, 0L, tm, seq, v, 0L, 0L, "0")
    } { (key, st) =>
      val twapM = (BigInt(st.sumVdt) / BigInt(math.max(st.sumDt, 1L))).toLong
      val meanM = st.sumV / math.max(st.nHeld, 1L)
      Iterator((key, st.nHeld, twapM, meanM))
    }
  }
}
