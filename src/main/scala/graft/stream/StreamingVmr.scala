package graft.stream

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Streaming twin of q336's dispersion index: per key, maintain the
  * count-moment sufficient statistics (n, Σx, Σx²) of a bucketed count
  * stream and emit the same all-integer VMR/χ² pair once per
  * micro-batch — the live overdispersion monitor beside
  * [[StreamingRuns]]' mixing check. The fold is ORDER-FREE (sums
  * merge), so the drained row is bit-equal to the batch statistic
  * regardless of arrival order, micro-batch boundaries, or restarts
  * (the [[StreamingZoneMap]] parity class); the truncating DIVs are
  * applied at EMIT time over the running sums, never persisted.
  *
  * State per key = three longs — O(keys), never O(stream).
  */
object StreamingVmr {

  final case class VmrState(n: Long, s1: Long, s2: Long)

  /** Rows are (key, bucketId, x = the bucket's count). One output row
    * per key per micro-batch: (key, n, s1,
    * vmr_ppm = 1e6·(n·s2 − s1²) DIV ((n−1)·s1),
    * chi2_micros = 1e6·(n·s2 − s1²) DIV s1) — both floored at
    * max(den, 1) exactly like the batch query.
    */
  def maintain(ds: Dataset[(Long, Long, Long)]): Dataset[(Long, Long, Long, Long, Long)] = {
    implicit val stEnc: Encoder[VmrState] = Encoders.product[VmrState]
    implicit val outEnc: Encoder[(Long, Long, Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    StatefulTwin.perBatch(ds, (r: (Long, Long, Long)) => r._1,
      (_: (Long, Long, Long)) => (0L, 0L),
      VmrState(0L, 0L, 0L)) {
      case (st, (_, _, x)) => VmrState(st.n + 1L, st.s1 + x, st.s2 + x * x)
    } { (k, st) =>
      // n·s2 − s1² in BigInt (ADVICE r10 #2): the batch q336 statistic
      // this claims bit-parity with computes the numerator in
      // DECIMAL(38,0), so the streaming side must not wrap in Long for
      // large running counts. longValueExact makes an out-of-BIGINT
      // emission RAISE like the batch side's ANSI cast, never wrap.
      val num = BigInt(st.n) * st.s2 - BigInt(st.s1) * st.s1
      val vmr = (BigInt(1000000) * num /
        ((BigInt(st.n) - 1) * st.s1).max(BigInt(1))).bigInteger.longValueExact()
      val chi2 = (BigInt(1000000) * num /
        BigInt(st.s1).max(BigInt(1))).bigInteger.longValueExact()
      Iterator((k, st.n, st.s1, vmr, chi2))
    }
  }
}
