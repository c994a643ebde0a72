package graft.etl

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Streaming progress channel — the engine-side analog of the
  * reference's WebSocket sync-status push (`{status, progress,
  * currentOperation, error}`, src/app/components/sync-status.tsx:15-63;
  * SURVEY §2.7 "retry / progress reporting" → StreamingQueryListener).
  *
  * Events are buffered off the listener thread (listeners must not
  * block micro-batch planning) and drained to a DataFrame / appended to
  * a `logs`-shaped status table on demand.
  */
object SyncStatus {
  /** top-level (companion) case class: Spark can't encode inner classes */
  final case class StatusEvent(
      query_id: String, status: String, batch_id: Long,
      rows_per_second: Double, num_input_rows: Long, error: String)
}

final class SyncStatus extends StreamingQueryListener {
  import SyncStatus.StatusEvent

  private val buf = new ConcurrentLinkedQueue[StatusEvent]()

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    buf.add(StatusEvent(e.id.toString, "started", -1L, 0.0, 0L, null))

  override def onQueryProgress(e: QueryProgressEvent): Unit =
    buf.add(StatusEvent(
      e.progress.id.toString, "progress", e.progress.batchId,
      e.progress.processedRowsPerSecond, e.progress.numInputRows, null))

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    buf.add(StatusEvent(e.id.toString, "terminated", -1L, 0.0, 0L,
      e.exception.orNull))

  /** Drain buffered events into a DataFrame (oldest first). */
  def drain(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val events = Iterator.continually(buf.poll()).takeWhile(_ != null).toSeq
    events.toDF()
  }

  def attach(spark: SparkSession): this.type = {
    spark.streams.addListener(this); this
  }
  def detach(spark: SparkSession): Unit = spark.streams.removeListener(this)
}
