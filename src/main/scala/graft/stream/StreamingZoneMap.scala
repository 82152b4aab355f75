package graft.stream

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}

/** Streaming twin of the q267 zone-map data-skipping index: per-zone
  * (n_rows, v_min, v_max) maintained continuously on the
  * [[StatefulTwin]] frame — at 100 TB the footer-stat index a scan
  * planner prunes against updates INCREMENTALLY as data lands, instead
  * of rescanning the table to rebuild it.
  *
  * The state triple is exactly mergeable (count adds, min/max fold), so
  * unlike the order-sensitive Misra–Gries twin the drained zone table is
  * bit-equal to the batch aggregate over the same rows REGARDLESS of
  * arrival order, micro-batch boundaries, or checkpoint restarts — the
  * strongest batch-parity contract in the streaming battery, pinned by
  * the StreamingSpec restart test against the q267-shape batch
  * aggregate. (Order-freedom is why the harness gets a CONSTANT order
  * key here.)
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
    val keyed = rows
      .select(zoneCol.cast("long").as("zone"), vCol.cast("long").as("v"))
      .as[(Long, Long)]
    StatefulTwin.perBatch(keyed, (r: (Long, Long)) => r._1,
      (_: (Long, Long)) => (0L, 0L),
      ZState(0L, Long.MaxValue, Long.MinValue)) {
      case (st, (_, v)) =>
        ZState(st.n + 1L, math.min(st.mn, v), math.max(st.mx, v))
    } { (zone, st) => Iterator((zone, st.n, st.mn, st.mx)) }
  }
}
