package graft.stream

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the q93 Misra–Gries heavy-hitter sketch
  * (`catalyst/MisraGries.scala` TypedImperativeAggregate): capacity-k
  * candidate counters maintained continuously per hash bucket via
  * `flatMapGroupsWithState` — the S5 shape for "which tokens are hot
  * RIGHT NOW" over an unbounded token stream, where the batch aggregate
  * would have to rescan history every time.
  *
  * Domain partitioning mirrors the batch partial/final split: tokens
  * hash into `nBuckets` disjoint buckets (`pmod(xxhash64(token), n)`),
  * each bucket maintaining its own MG(k) over exactly its sub-stream,
  * so per-key state is ≤ k counters — CONSTANT — and the union of
  * bucket candidates inherits the per-bucket deterministic guarantees:
  *
  *  - never overcount: cnt(token) ≤ true count;
  *  - bounded undercount: true − cnt ≤ ⌊m_b/(k+1)⌋ for a bucket that
  *    has seen m_b rows (the classical MG bound);
  *  - every token with bucket-frequency > m_b/(k+1) is IN the
  *    candidate set.
  *
  * Counts depend on arrival order under eviction (inherent to MG, same
  * as the batch sketch's partition-merge order); the certification
  * properties above are order-free, and in the no-eviction regime
  * (≤ k distinct tokens per bucket) the counts are EXACT — the
  * StreamingSpec restart test pins both regimes.
  *
  * Each batch emits the bucket's full post-batch candidate table
  * (bucket, batch_rows_seen_total, token, cnt) — the monitor's
  * dashboard rows, deterministic given arrival order.
  */
object StreamingHeavyHitters {

  final case class MgState(total: Long, tokens: Array[String], counts: Array[Long])

  /** `tokens` must be a single string column; k is the per-bucket
    * counter capacity.
    */
  def monitor(tokens: DataFrame, tokenCol: Column, k: Int = 8,
              nBuckets: Int = 32): Dataset[(Long, Long, String, Long)] = {
    require(k >= 1 && k <= 4096, s"k=$k outside [1, 4096]: k counters per bucket ARE the state")
    require(nBuckets >= 1 && nBuckets <= 65536, s"nBuckets=$nBuckets outside [1, 65536]")
    val spark = tokens.sparkSession
    import spark.implicits._
    implicit val stEnc: Encoder[MgState] = Encoders.product[MgState]
    val keyed = tokens
      .select(pmod(xxhash64(tokenCol), lit(nBuckets.toLong)).as("bucket"),
        tokenCol.cast("string").as("tok"))
      .as[(Long, String)]
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState[MgState, (Long, Long, String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: Long, rows: Iterator[(Long, String)], state: GroupState[MgState]) =>
          val st = state.getOption.getOrElse(MgState(0L, Array.empty, Array.empty))
          val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
          st.tokens.zip(st.counts).foreach { case (t, c) => m(t) = c }
          var total = st.total
          rows.foreach { case (_, tok) =>
            total += 1L
            if (m.contains(tok)) m(tok) += 1L
            else if (m.size < k) m(tok) = 1L
            else {
              // decrement-all step: every counter pays 1; zeros drop out
              val dead = scala.collection.mutable.ArrayBuffer.empty[String]
              m.keysIterator.foreach { t =>
                val c = m(t) - 1L
                if (c == 0L) dead += t else m(t) = c
              }
              dead.foreach(m.remove)
            }
          }
          state.update(MgState(total, m.keys.toArray, m.values.toArray))
          // deterministic emission order: count desc, then token
          m.toSeq.sortBy { case (t, c) => (-c, t) }
            .map { case (t, c) => (bucket, total, t, c) }.iterator
      }
  }
}
