package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** A6: rows/sec throughput metrics from StreamingQueryProgress — the
  * events/sec report of the reference (`pkg/app/process_source.go:80-138`;
  * one line per poll) becomes one metric row per micro-batch.
  */
object StreamingMetrics {

  final case class BatchMetric(
    queryName: String, batchId: Long, numInputRows: Long,
    processedRowsPerSecond: Double, durationMs: Long)

  /** Attach a collecting listener; returns (listener, drain-fn). Caller
    * removes the listener when done. */
  def attach(spark: SparkSession): (StreamingQueryListener, () => Seq[BatchMetric]) = {
    val q = new ConcurrentLinkedQueue[BatchMetric]()
    val l = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        q.add(BatchMetric(
          Option(p.name).getOrElse(""), p.batchId, p.numInputRows,
          p.processedRowsPerSecond,
          Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L)))
      }
    }
    spark.streams.addListener(l)
    (l, () => { val it = q.iterator(); Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next()).toSeq })
  }
}
