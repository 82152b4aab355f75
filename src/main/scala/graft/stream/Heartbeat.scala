package graft.stream

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Batch-latency heartbeat (SURVEY.md §2.2 SNK4; reference
  * listener.js:44-56,140-145 GETs elapsed seconds to a heartbeat URL
  * after each batch, swallowing errors).
  *
  * Spark's `QueryProgressEvent` already carries per-batch duration and
  * row counts, so the listener just forwards them to a caller-supplied
  * emitter (an HTTP ping in production, a collector in tests); emitter
  * failures are swallowed exactly like the reference's catch-all.
  */
final class Heartbeat(emit: Heartbeat.Beat => Unit) extends StreamingQueryListener {
  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    try emit(Heartbeat.Beat(p.batchId, p.batchDuration, p.numInputRows))
    catch { case _: Throwable => () }  // heartbeat must never fail the query
  }
}

object Heartbeat {
  final case class Beat(batchId: Long, durationMs: Long, inputRows: Long)
}
