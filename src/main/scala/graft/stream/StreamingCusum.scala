package graft.stream

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Streaming twin of the q182 CUSUM monitor
  * (`analytics/TemporalOps.scala`): Page's two-sided S⁺/S⁻ per key on
  * the [[StatefulTwin]] frame, carrying exactly the TWO longs of state
  * per key the batch scaladoc promises. The batch form derives μ from
  * the whole series; a stream cannot see its future, so the caller
  * passes the trained μ (and the μ-derived slack/threshold use the
  * same truncating arithmetic) — the standard deploy split: fit the
  * baseline in batch, monitor in the stream.
  *
  * Rows are (key, seq, xm) consumed in `seq` order (the
  * [[StatefulTwin]] ordering contract). Every input row emits its
  * post-update (seq, s_hi, s_lo, alarm) so the output stream IS the
  * alarm stream — drained, it equals the batch query's per-day rows
  * bit-for-bit (StreamingSpec parity test).
  */
object StreamingCusum {

  final case class CusumState(hi: Long, lo: Long)

  def monitor(ds: Dataset[(Long, Long, Long)], muMicros: Long)
      : Dataset[(Long, Long, Long, Long, Boolean)] = {
    implicit val stEnc: Encoder[CusumState] = Encoders.product[CusumState]
    implicit val outEnc: Encoder[(Long, Long, Long, Long, Boolean)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaBoolean)
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    val slack = muMicros / 20L
    val h = muMicros / 2L
    StatefulTwin.perRow(ds, (r: (Long, Long, Long)) => r._1,
      (r: (Long, Long, Long)) => (r._2, 0L), CusumState(0L, 0L)) {
      case (st, (key, seq, x)) =>
        val hi = math.max(0L, st.hi + x - muMicros - slack)
        val lo = math.max(0L, st.lo - x + muMicros - slack)
        (CusumState(hi, lo), (key, seq, hi, lo, hi > h || lo > h))
    }
  }
}
