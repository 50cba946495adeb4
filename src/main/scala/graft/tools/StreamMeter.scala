package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability shared by the CLI drivers ([[StreamLogs]],
  * [[StreamCorpus]], [[StreamStats]]): appends every micro-batch's
  * `StreamingQueryProgress` as one JSON line to `<outDir>/progress.jsonl`
  * (input rows, per-stage durations, state-operator rows/memory —
  * everything Spark already measures, persisted where a throughput
  * ladder can read it), and prints a final wall-clock throughput line.
  *
  * The listener is the supported instrumentation point — no timers in
  * the data path, so metering cannot perturb what it measures. */
object StreamMeter {

  /** Attach a progress recorder; returns a completion hook that
    * detaches the listener, prints the summary, and returns the wall
    * seconds (for the caller's own item-throughput line).
    *
    * The listener is session-global, but only the FIRST query that
    * reports progress after attach is counted (its id is captured on
    * first event and later events are filtered on it) — a concurrent
    * unrelated query on the same session must not leak its rows into
    * this meter's throughput line or progress.jsonl. The CLIs attach
    * immediately before starting their single query, so first-progress
    * binding is unambiguous there.
    *
    * @param label  CLI tag for the summary line, e.g. "stream-logs"
    * @param outDir progress.jsonl lands under this directory */
  def attach(spark: SparkSession, label: String, outDir: String)
      : () => Double = {
    val t0 = System.nanoTime()
    val path = java.nio.file.Paths.get(outDir, "progress.jsonl")
    java.nio.file.Files.createDirectories(path.getParent)
    val rows = new java.util.concurrent.atomic.AtomicLong(0L)
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new StreamingQueryListener {
      private var boundId: java.util.UUID = null
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        synchronized {
          if (boundId == null) boundId = e.progress.id
          if (e.progress.id == boundId) {
            rows.addAndGet(e.progress.numInputRows)
            batches.incrementAndGet()
            java.nio.file.Files.writeString(path, e.progress.json + "\n",
              java.nio.file.StandardOpenOption.CREATE,
              java.nio.file.StandardOpenOption.APPEND)
          }
        }
    }
    spark.streams.addListener(listener)
    () => {
      spark.streams.removeListener(listener)
      val wallS = (System.nanoTime() - t0) / 1e9
      val n = rows.get()
      // source_rows is Spark's numInputRows sum — a plan whose union
      // branches re-read the source counts it once PER BRANCH (the
      // sessionize CLI did until its r16 single-operator plan), so true
      // item throughput is the caller's item count over this wall clock
      println(f"[$label] meter: source_rows=$n batches=${batches.get()} " +
        f"wall=$wallS%.1fs source_rows_per_s=${n / math.max(wallS, 1e-9)}%.0f " +
        s"progress=$path")
      wallS
    }
  }
}
