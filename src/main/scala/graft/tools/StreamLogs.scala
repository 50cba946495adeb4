package graft.tools

import graft.streaming.{StreamWidth, StreamingSessionize}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming CLI — the continuous analogue of the reference's stdin loop:
  * watch a directory of syslog text files, sessionize incrementally with
  * keyed state + 10-minute TTL, write enriched events/faults parquet.
  *
  * Sequence numbers: the file source exposes no offsets, so lines are
  * stamped on a single partition with `(file-mtime-seconds-since-2020
  * << 31) | line index` — exact arrival order within a file, monotone
  * across micro-batches for tailed logs (later files have later mtimes),
  * and — critically — DETERMINISTIC: Spark may recompute this stage
  * (task retry, plan re-derivation), so a wall-clock stamp would hand
  * different runs inconsistent seqs (found empirically under the old
  * three-branch union plan: it broke every dovecot window join; the
  * r16 plan computes the stage once per batch, but determinism is still
  * the contract retries rely on). The single-partition stamping only affects
  * the classify stage of a replay CLI; the stateful stage re-shuffles to
  * full parallelism. An offset-bearing source (e.g. Kafka) should use its
  * offsets instead — [[StdinLogs]] is the offset-bearing variant here
  * (seqs embedded in a spool WAL), and the reference's literal
  * `cat mail.log | parse.py` entry point.
  *
  * Usage: StreamLogs <inputDir> <outDir> [--follow]
  *   default: Trigger.AvailableNow (process everything present, then stop)
  *   --follow: 5-second micro-batches, runs until killed.
  * Env: SPARK_GRAFT_ROCKSDB=1 keeps session state in the RocksDB state
  * store ([[StreamingSessionize.withRocksDbStateStore]] — the 100 TB
  * configuration: state spills to executor-local disk instead of heap);
  * SPARK_GRAFT_MAX_FILES_PER_TRIGGER bounds each micro-batch (batch-size
  * sensitivity probes). Shuffle/state width defaults to the micro-batch
  * size ([[StreamWidth]] — the r18 ladder's measured knee: the state
  * store pays ~400 ms of commit file ops per partition per batch);
  * SPARK_GRAFT_SHUFFLE_PARTITIONS overrides. Every run appends per-batch
  * `StreamingQueryProgress` JSON to `<outDir>/progress.jsonl` and prints
  * a wall-clock lines/s summary ([[StreamMeter]]).
  */
object StreamLogs {
  def main(args: Array[String]): Unit = {
    val inputDir = args(0)
    val outDir = args(1)
    val follow = args.length > 2 && args(2) == "--follow"
    val spark0 = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .appName("graft-stream-logs")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark0.sparkContext.setLogLevel("WARN")
    // RocksDB state store on request — an isolated session so the
    // provider choice cannot leak into other queries on the context
    val spark =
      if (sys.env.get("SPARK_GRAFT_ROCKSDB").contains("1"))
        StreamingSessionize.withRocksDbStateStore(spark0)
      else spark0
    import spark.implicits._
    val maxFiles =
      sys.env.get("SPARK_GRAFT_MAX_FILES_PER_TRIGGER").map(_.toInt)
    // shuffle/state width sized to the micro-batch (env overrides);
    // recorded on stdout + width.json (+ a progress.jsonl record)
    StreamWidth(spark, "stream-logs", outDir,
      StreamWidth.estimateTextDir(inputDir, maxFiles))
    val done = StreamMeter.attach(spark, "stream-logs", outDir)

    val epoch2020s = 1577836800L
    val reader = spark.readStream
    maxFiles.foreach(v => reader.option("maxFilesPerTrigger", v))
    val lines = reader.text(inputDir)
      .select(col("value"),
        unix_timestamp(col("_metadata.file_modification_time")).as("fsec"))
      .as[(String, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        it.zipWithIndex.map { case ((l, fsec), i) =>
          (((fsec - epoch2020s) << 31) | i.toLong, l)
        }
      }

    // TTL eviction only makes sense while tailing (--follow); a bounded
    // AvailableNow replay is batch semantics (no eviction, SURVEY §7.3) —
    // and pending processing-time timeouts keep an AvailableNow query
    // alive until they fire, which would stall the replay for 10 minutes.
    val ttl = if (follow) Some(StreamingSessionize.TtlMs) else None
    val writer = StreamingSessionize(lines, ttlMs = ttl)
      .writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .foreachBatch(StreamingSessionize.parquetSink(outDir))

    val q = (if (follow) writer.trigger(Trigger.ProcessingTime("5 seconds"))
             else writer.trigger(Trigger.AvailableNow())).start()
    q.awaitTermination()
    val wallS = done()
    val nLines = spark.read.text(inputDir).count()
    val n = spark.read.parquet(s"$outDir/events").count()
    println(f"[stream-logs] lines=$nLines lines_per_s=${nLines / math.max(wallS, 1e-9)}%.0f " +
      s"events=$n out=$outDir")
    spark.stop()
  }
}
