package graft.stream

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Streaming twin of q199's KMV distinct-count sketch (Bar-Yossef et
  * al. / Beyer et al. 2007): per key, maintain the k smallest DISTINCT
  * portable 60-bit hashes of the value stream and emit the same
  * (k−1)·2⁶⁰ DIV h_k estimate once per micro-batch — the live
  * cardinality monitor beside [[StreamingVmr]]'s overdispersion check.
  * The k-min insert is ORDER-FREE (the bottom-k of a set is
  * order-independent, and the admission threshold h_k only ever
  * decreases, so a once-rejected hash can never belong later), which
  * makes the drained row bit-equal to the batch sketch regardless of
  * arrival order, micro-batch boundaries, or restarts (the
  * [[StreamingVmr]] parity class). Keys holding fewer than k distinct
  * hashes report exactly — the same n_in < k branch as the batch
  * estimator.
  *
  * Rows arrive PRE-HASHED (key, seq, h = TextStats.portableHash64 of
  * the value) so the twin's state is hash-typed like the batch
  * sketch's registers. State per key = a sorted ≤ k-element long
  * vector — O(k), never O(stream). The estimate divides through
  * BigInt ((k−1)·2⁶⁰ exceeds Long) with truncation, matching the
  * batch DECIMAL(38,0) DIV bit for bit.
  */
object StreamingKmv {

  final case class KmvState(hs: Seq[Long])

  private val Reg = BigInt("1152921504606846976") // 2^60

  /** One output row per key per micro-batch:
    * (key, n_in, h_k = max of the kept set (0 while empty), est).
    */
  def maintain(ds: Dataset[(Long, Long, Long)],
               k: Int = 64): Dataset[(Long, Long, Long, Long)] = {
    implicit val stEnc: Encoder[KmvState] = Encoders.product[KmvState]
    implicit val outEnc: Encoder[(Long, Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong)
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    StatefulTwin.perBatch(ds, (r: (Long, Long, Long)) => r._1,
      (r: (Long, Long, Long)) => (r._2, 0L),
      KmvState(Vector.empty)) {
      case (st, (_, _, h)) =>
        val hs = st.hs
        if (hs.contains(h) || (hs.length >= k && h >= hs.last)) st
        else KmvState(((hs :+ h).sorted).take(k))
    } { (key, st) =>
      val nIn = st.hs.length.toLong
      val hK = if (st.hs.isEmpty) 0L else st.hs.last
      val est =
        if (nIn < k) nIn
        else (BigInt(k - 1) * Reg / BigInt(hK)).bigInteger.longValueExact()
      Iterator((key, nIn, hK, est))
    }
  }
}
