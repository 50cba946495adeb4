package graft.tools

import graft.streaming.StreamingSessionize
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import java.io.{BufferedReader, File, InputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}

/** Streaming CLI for the reference's literal entry point:
  * `cat /var/log/mail.log* | parse.py` (parse.py:508-520) —
  * `cat mail.log* | StdinLogs <outDir>` here.
  *
  * stdin is not a replayable Spark source, so the driver turns it into
  * one: a spooler thread reads lines in arrival order, stamps each with
  * its global sequence number, and appends batches to an atomic-renamed
  * spool file (a write-ahead log). The streaming query tails the spool
  * with the file source and parses the seq back out of each record —
  * OFFSET-BEARING by construction, so unlike a derived stamp
  * (`coalesce(1)` + zipWithIndex, see [[StreamLogs]]) it stays correct
  * under plan re-execution, survives restarts from the checkpoint, and
  * leaves the classify stage fully parallel.
  *
  * Usage: StdinLogs <outDir> [--ttl] [--listen <port>]
  *   default:  replay semantics — process until stdin EOF, then drain and
  *             stop (batch-identical output; no TTL, matching the batch
  *             operator's no-eviction contract, SURVEY §7.3)
  *   --ttl:    enable the 10-minute session TTL while tailing a live feed
  *   --listen: accept one TCP connection and read it instead of stdin.
  */
object StdinLogs {

  /** Spool `in` into seq-stamped files under `spoolDir`; returns lines
    * written. Record format: `<seq> <raw>` (seq is a zero-padded decimal
    * so the record parses with one indexOf). Files are written outside
    * the dir and atomically renamed in, so the file source never sees a
    * partial file. */
  def spool(in: InputStream, spoolDir: File, batchLines: Int = 8192): Long = {
    val reader = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
    val buf = new StringBuilder
    var seq = 0L
    var fileNo = 0
    var pending = 0
    def flush(): Unit = if (pending > 0) {
      val tmp = File.createTempFile(s"spool_$fileNo", ".tmp", spoolDir.getParentFile)
      Files.write(tmp.toPath, buf.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp.toPath, new File(spoolDir, f"part-$fileNo%08d.txt").toPath,
        StandardCopyOption.ATOMIC_MOVE)
      fileNo += 1; pending = 0; buf.clear()
    }
    var line = reader.readLine()
    while (line != null) {
      buf.append(f"$seq%016d ").append(line).append('\n')
      seq += 1; pending += 1
      if (pending >= batchLines) flush()
      line = reader.readLine()
    }
    flush()
    seq
  }

  /** Run the spool + streaming-sessionize pipeline over `in` until EOF,
    * writing enriched events/faults parquet under `outDir`. Factored out
    * of `main` so tests can drive it with an in-memory stream. */
  def run(spark: SparkSession, in: InputStream, outDir: String,
          ttlMs: Option[Long]): Unit = {
    import spark.implicits._
    val spoolDir = new File(outDir, "_spool")
    spoolDir.mkdirs()

    val lines = spark.readStream.text(spoolDir.getAbsolutePath).as[String]
      .map { s =>
        val sp = s.indexOf(' ')
        (s.substring(0, sp).toLong, s.substring(sp + 1))
      }
    val q = StreamingSessionize(lines, ttlMs = ttlMs)
      .writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .foreachBatch(StreamingSessionize.parquetSink(outDir))
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()

    val n = spool(in, spoolDir) // blocks until EOF on the feed
    if (ttlMs.isDefined) {
      // --ttl means live-tailing semantics: a registered processing-time
      // timeout keeps scheduling no-data micro-batches to evaluate expiry,
      // so processAllAvailable would never settle (see StreamingSessionize
      // scaladoc). Like the reference's endless stdin loop, run until
      // killed — pending sessions keep evicting on their deadlines.
      println(s"[stdin-logs] feed EOF after $n lines; tailing with TTL until killed")
      q.awaitTermination()
    } else {
      q.processAllAvailable()
      q.stop()
    }
    println(s"[stdin-logs] lines=$n out=$outDir")
  }

  /** `--listen <port>`: accept ONE TCP connection and treat its byte
    * stream exactly like stdin (the `nc`-able socket analogue of the
    * reference's pipe; same spool WAL, same offset-bearing seqs — unlike
    * `readStream.format("socket")`, whose rows would need a derived
    * stamp with the same re-execution hazards StreamLogs documents). */
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val rest = args.drop(1)
    val ttl = if (rest.contains("--ttl")) Some(StreamingSessionize.TtlMs) else None
    val listenPort = rest.sliding(2).collectFirst {
      case Array("--listen", p) => p.toInt
    }
    // stdin spool batches are arrival-rate-sized (no directory to
    // estimate from ahead of the stream) — measured-knee fallback, env
    // override retained ([[graft.streaming.StreamWidth]])
    val width = graft.streaming.StreamWidth.resolve(None)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .appName("graft-stdin-logs")
      .config("spark.sql.shuffle.partitions", width.width.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val in = listenPort match {
      case Some(port) =>
        val server = new java.net.ServerSocket(port)
        println(s"[stdin-logs] listening on :$port")
        server.accept().getInputStream
      case None => System.in
    }
    run(spark, in, outDir, ttl)
    val n = spark.read.parquet(s"$outDir/events").count()
    println(s"[stdin-logs] events=$n out=$outDir")
    spark.stop()
  }
}
