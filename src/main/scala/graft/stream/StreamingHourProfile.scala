package graft.stream

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Streaming twin of q353's harmonic hour-of-day profile: per key,
  * maintain the 24 slot counts of an event stream and emit the same
  * first-Fourier-harmonic amplitude and variance share once per
  * micro-batch — the live diurnal-drift monitor beside
  * [[StreamingVmr]]. Slot increments are ORDER-FREE, so the drained
  * row is bit-equal to the batch statistic regardless of arrival
  * order, micro-batch boundaries, or restarts: the projection folds
  * p(0)·cos₀ + p(1)·cos₁ + … in the SAME left-to-right IEEE order as
  * the batch expression text, over the SAME doubles (`math.cos` here;
  * the batch splices `Double.toString(math.cos(...))` literals, which
  * both engines parse back to the identical bit pattern), and the
  * final round replays Spark's ROUND_HALF_UP-on-BigDecimal.valueOf
  * semantics. Exactness bound: slot counts and Σp² convert to double
  * losslessly below 2^53 — the q353 batch side holds Σp² in
  * DECIMAL(38,0) and pays the same conversion at the same place.
  *
  * State per key = 24 longs — O(keys), never O(stream).
  */
object StreamingHourProfile {

  final case class ProfState(p: Seq[Long])

  private val cosH = (0 until 24).map(h => math.cos(2 * math.Pi * h / 24))
  private val sinH = (0 until 24).map(h => math.sin(2 * math.Pi * h / 24))

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Rows are (key, seq, h = hour-of-day slot 0..23). One output row
    * per key per micro-batch:
    * (key, n_events, peak_h, peak_p, amp_r, strength_r).
    */
  def maintain(ds: Dataset[(Long, Long, Long)])
      : Dataset[(Long, Long, Long, Long, Double, Double)] = {
    implicit val stEnc: Encoder[ProfState] = Encoders.product[ProfState]
    implicit val outEnc: Encoder[(Long, Long, Long, Long, Double, Double)] =
      Encoders.product[(Long, Long, Long, Long, Double, Double)]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    StatefulTwin.perBatch(ds, (r: (Long, Long, Long)) => r._1,
      (r: (Long, Long, Long)) => (r._2, 0L),
      ProfState(Vector.fill(24)(0L))) {
      case (st, (_, _, h)) =>
        val i = h.toInt
        ProfState(st.p.updated(i, st.p(i) + 1L))
    } { (key, st) =>
      val p = st.p
      // left-to-right folds — the batch expression's textual order
      var fb = 0.0; var fc = 0.0; var i = 0
      while (i < 24) { fb += p(i) * cosH(i); fc += p(i) * sinH(i); i += 1 }
      fb /= 12.0; fc /= 12.0
      val sp = p.sum
      var spp = 0.0; i = 0
      while (i < 24) { spp += p(i).toDouble * p(i); i += 1 }
      // Σp² accumulated exactly below 2^53 per term (batch: DECIMAL →
      // one double conversion; here each p²(h) is exact and the 24-term
      // double sum matches the decimal total's conversion while the
      // running total stays below 2^53)
      val sst = spp - sp.toDouble * sp / 24.0
      val peakH = p.indices.maxBy(h => (p(h), -h)).toLong
      val amp = round6(math.sqrt(fb * fb + fc * fc))
      val strength =
        if (sst == 0) 0.0 else round6(12.0 * (fb * fb + fc * fc) / sst)
      Iterator((key, sp, peakH, p(peakH.toInt), amp, strength))
    }
  }
}
