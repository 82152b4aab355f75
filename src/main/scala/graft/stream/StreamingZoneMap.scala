package graft.stream

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the q267 zone-map data-skipping index: per-zone
  * (n_rows, v_min, v_max) maintained continuously via
  * `flatMapGroupsWithState` — at 100 TB the footer-stat index a scan
  * planner prunes against updates INCREMENTALLY as data lands, instead
  * of rescanning the table to rebuild it.
  *
  * The state triple is exactly mergeable (count adds, min/max fold), so
  * unlike the order-sensitive Misra–Gries twin the drained zone table is
  * bit-equal to the batch aggregate over the same rows REGARDLESS of
  * arrival order, micro-batch boundaries, or checkpoint restarts — the
  * strongest batch-parity contract in the streaming battery, pinned by
  * the StreamingSpec restart test against the q267-shape batch
  * aggregate.
  *
  * Per-zone state is three longs — CONSTANT; the zone domain is bounded
  * by construction (the q267 layouts use 64 zones). Each batch emits the
  * zone's post-batch row (zone, n_rows, v_min, v_max); the live index is
  * each zone's latest (max-n_rows) row, n being monotone.
  */
object StreamingZoneMap {

  final case class ZState(n: Long, mn: Long, mx: Long)

  /** `zoneCol` must be a long zone id, `vCol` the long sort-key value
    * the zone map indexes (q267: days-since-epoch of the order date).
    */
  def maintain(rows: DataFrame, zoneCol: Column, vCol: Column)
      : Dataset[(Long, Long, Long, Long)] = {
    val spark = rows.sparkSession
    import spark.implicits._
    implicit val stEnc: Encoder[ZState] = Encoders.product[ZState]
    rows.select(zoneCol.cast("long").as("zone"), vCol.cast("long").as("v"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ZState, (Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (zone: Long, it: Iterator[(Long, Long)], state: GroupState[ZState]) =>
          var st = state.getOption.getOrElse(
            ZState(0L, Long.MaxValue, Long.MinValue))
          it.foreach { case (_, v) =>
            st = ZState(st.n + 1L, math.min(st.mn, v), math.max(st.mx, v))
          }
          state.update(st)
          Iterator((zone, st.n, st.mn, st.mx))
      }
  }
}
