package graft.stream

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Streaming twin of the q299/q304 SAX symbolization — twin #15, also
  * born on the [[StatefulTwin]] harness: per key, map each arriving
  * value to its SAX letter against BATCH-FITTED normalization
  * constants (the fit-in-batch / monitor-in-stream deploy split of
  * [[StreamingCusum]]: a stream cannot see its future mean/σ, so the
  * caller passes the q299 fit's (n, Σx, isqrt(V)) triple), and
  * maintain the run-length encoding live: state is the OPEN run
  * (letter, length, run index) — two longs and a one-char string,
  * O(1) per key. Every row emits its run's post-update view
  * (run_idx, letter, run_len), so a sink holding max(run_len) per
  * (key, run_idx) IS the live RLE the motif/anomaly grep of q304
  * subscribes to.
  *
  * Arithmetic is the q299 letter rule token-for-token: z_micros =
  * sign-safe (n·x − Σx)·1e6 DIV max(sig, 1), then the 4-letter
  * alphabet at ±674490/0 — so a drained stream's runs equal the batch
  * gaps-and-islands RLE bit-for-bit given the ordered-feed contract
  * ([[StatefulTwin]] scaladoc; StreamingSpec parity + restart test —
  * a run that SPANS a checkpoint restart keeps growing, which only
  * works if the open run survived in state).
  *
  * Rows: (key, seq, x). Emits (key, run_idx, letter, run_len).
  */
object StreamingSax {

  final case class SaxState(letter: String, len: Long, runIdx: Long)

  private[graft] def letterOf(x: Long, n: Long, sx: Long, sig: Long): String = {
    val znum = n * x - sx
    val z =
      if (znum < 0L) -(((-znum) * 1000000L) / math.max(sig, 1L))
      else (znum * 1000000L) / math.max(sig, 1L)
    if (z < -674490L) "a" else if (z < 0L) "b" else if (z < 674490L) "c" else "d"
  }

  def symbolize(ds: Dataset[(Long, Long, Long)], n: Long, sx: Long, sig: Long)
      : Dataset[(Long, Long, String, Long)] = {
    implicit val stEnc: Encoder[SaxState] = Encoders.product[SaxState]
    implicit val outEnc: Encoder[(Long, Long, String, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING,
        Encoders.scalaLong)
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    StatefulTwin.perRow(ds, (r: (Long, Long, Long)) => r._1,
      (r: (Long, Long, Long)) => (r._2, 0L), SaxState("", 0L, 0L)) {
      case (st, (key, _, x)) =>
        val l = letterOf(x, n, sx, sig)
        val st2 =
          if (st.letter == l) st.copy(len = st.len + 1L)
          else SaxState(l, 1L, st.runIdx + 1L)
        (st2, (key, st2.runIdx, l, st2.len))
    }
  }
}
