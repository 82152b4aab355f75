package graft.stream

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Streaming twin of q307's block-maxima stage (the extreme-value-theory
  * input: per calendar month, the maximum daily revenue in kilodollar
  * floors): per block key, maintain the running per-day cent sums and
  * emit the block's day count and current maximum floored daily total
  * once per micro-batch — the live "what spike has this block already
  * absorbed" feed whose drained output the q307 Gumbel fit consumes.
  *
  * Runs on the [[StatefulTwin]] frame (the 15th twin, and the contract
  * test's positive case). The fold is ORDER-FREE — cent sums merge —
  * so the harness gets a constant order key and the drained table is
  * bit-equal to the batch aggregate regardless of arrival order,
  * micro-batch boundaries, or restarts (the [[StreamingZoneMap]]
  * parity class). The truncating DIV to kilodollar floors is applied
  * at EMIT time over the running sums, never persisted — a day split
  * across micro-batches floors once on its full total, exactly like
  * batch (StreamingSpec pins a restart mid-day).
  *
  * State per block = the day→cents map, bounded by the days-per-block
  * domain (≤31 for calendar months), NOT by the stream length.
  */
object StreamingBlockMax {

  final case class BMState(dayCents: Map[Long, Long])

  /** Rows are (ym block key, od day key, cents). One output row per
    * block per micro-batch: (ym, n_days, x = max over days of
    * running-day-cents DIV 100000).
    */
  def maintain(ds: Dataset[(Long, Long, Long)]): Dataset[(Long, Long, Long)] = {
    implicit val stEnc: Encoder[BMState] = Encoders.product[BMState]
    implicit val outEnc: Encoder[(Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    StatefulTwin.perBatch(ds, (r: (Long, Long, Long)) => r._1,
      (_: (Long, Long, Long)) => (0L, 0L),
      BMState(Map.empty)) {
      case (st, (_, od, c)) =>
        BMState(st.dayCents.updated(od, st.dayCents.getOrElse(od, 0L) + c))
    } { (ym, st) =>
      Iterator((ym, st.dayCents.size.toLong,
        st.dayCents.values.map(_ / 100000L).max))
    }
  }
}
