package graft.stream

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Streaming twin of the q212 Wald SPRT monitor
  * (`analytics/InferOps.sprtDaily`): the cumulative integer-nanos LLR
  * per key on the [[StatefulTwin]] frame, carrying the three longs of
  * state the sequential test actually needs (cum LLR, cum n, and the
  * sticky decision). This is the deployment shape the batch scaladoc
  * names: SPRT is a SEQUENTIAL test — the batch query replays history,
  * the stream IS the test, deciding the moment the boundary is
  * crossed.
  *
  * Rows are (key, seq, n, s) daily sufficient statistics consumed in
  * `seq` order (the [[StatefulTwin]] ordering contract). Every row
  * emits its post-update (seq, cum_llr, cum_n, decision); once a
  * boundary is crossed the decision is STICKY ('h1'/'h0' forever
  * after) and the accumulators freeze — the Wald protocol stops
  * sampling at the decision, so post-decision rows replay the decision
  * point, and the drained stream's final row per key equals the batch
  * query's (decision, n_at_decision, llr) verdict exactly
  * (StreamingSpec parity test).
  */
object StreamingSprt {

  final case class SprtState(llr: Long, n: Long, decision: String)

  /** Input (key, seq, n, s) → output (key, seq, cumLlr, cumN, decision). */
  def monitor(ds: Dataset[(String, Long, Long, Long)])
      : Dataset[(String, Long, Long, Long, String)] = {
    implicit val stEnc: Encoder[SprtState] = Encoders.product[SprtState]
    implicit val outEnc: Encoder[(String, Long, Long, Long, String)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.STRING)
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    val lpos = graft.analytics.InferOps.sprtLPosNanos
    val lneg = graft.analytics.InferOps.sprtLNegNanos
    val bound = graft.analytics.InferOps.sprtBoundNanos
    StatefulTwin.perRow(ds, (r: (String, Long, Long, Long)) => r._1,
      (r: (String, Long, Long, Long)) => (r._2, 0L),
      SprtState(0L, 0L, "continue")) {
      case (st0, (key, seq, n, s)) =>
        val st =
          if (st0.decision != "continue") st0
          else {
            val llr = st0.llr + s * lpos + (n - s) * lneg
            val dec =
              if (llr >= bound) "h1"
              else if (llr <= -bound) "h0"
              else "continue"
            SprtState(llr, st0.n + n, dec)
          }
        (st, (key, seq, st.llr, st.n, st.decision))
    }
  }
}
