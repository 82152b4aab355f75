package graft.stream

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the q162/q176 exponential-smoothing recurrences
  * (`analytics/TemporalOps.scala`): Holt level+trend per key via
  * `flatMapGroupsWithState`, carrying exactly the TWO longs of state
  * per key the batch scaladoc promises (EWMA is the β=0, b≡0 special
  * case of the same recurrence — one long of live state).
  *
  * Contract: rows are (key, seq, xm) with xm already on the
  * floor-micros grid; the recurrence consumes them in `seq` order.
  * Within a micro-batch the group buffer is sorted before folding;
  * ACROSS batches ordering is the ingestion contract (event-time
  * ordered feed — the same assumption every sequential-recurrence
  * stream makes; an out-of-order feed needs a watermark-bounded
  * reorder buffer upstream, which is the q51/q153 sessionize
  * machinery, not more per-key state).
  *
  * Each batch emits the key's post-batch (n, level, trend) so a sink
  * always holds the latest smoothed state; the arithmetic is
  * token-for-token the batch fold — floor after EVERY multiplication —
  * so a drained stream equals the batch query bit-for-bit
  * (StreamingSpec parity test).
  */
object StreamingTrend {

  final case class TrendState(n: Long, l: Long, b: Long)

  def holt(ds: Dataset[(Long, Long, Long)],
           alphaMicros: Long = 500000L,
           betaMicros: Long = 300000L): Dataset[(Long, Long, Long, Long)] = {
    implicit val stEnc: Encoder[TrendState] = Encoders.product[TrendState]
    implicit val outEnc: Encoder[(Long, Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong)
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    val a = alphaMicros; val be = betaMicros
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[TrendState, (Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[TrendState]) =>
          val xs = rows.toArray.sortBy(_._2).map(_._3)
          if (xs.isEmpty) Iterator.empty
          else {
            var st = state.getOption.getOrElse(TrendState(0L, 0L, 0L))
            var i = 0
            if (st.n == 0L) { st = TrendState(1L, xs(0), 0L); i = 1 }
            while (i < xs.length) {
              val x = xs(i)
              val lNew = (a * x + (1000000L - a) * (st.l + st.b)) / 1000000L
              val bNew = (be * (lNew - st.l) + (1000000L - be) * st.b) / 1000000L
              st = TrendState(st.n + 1L, lNew, bNew)
              i += 1
            }
            state.update(st)
            Iterator((key, st.n, st.l, st.b))
          }
      }
  }
}
