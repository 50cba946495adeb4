package graft.streaming

import graft.SparkSpec
import graft.core.PostfixEvent
import graft.operators.Sessionize
import graft.tools.StdinLogs
import org.scalatest.funsuite.AnyFunSuite
import java.io.{BufferedReader, ByteArrayInputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

/** The stdin entry point (`cat mail.log | StdinLogs`) must produce the
  * same events as the batch operator fed the identical line sequence —
  * the spool WAL's embedded seqs are the arrival order, so streaming
  * replay ≡ batch replay (SURVEY §7.3 no-eviction contract). */
class StdinLogsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def key(e: PostfixEvent) =
    (e.queue_id, e.message_id, e.timestamp.getTime, e.message_to, e.message_subject,
      e.status_code, e.dovecot_fileinto_action, e.client, e.raw_log)

  test("stdin spool streaming is identical to batch on the same feed") {
    import spark.implicits._
    val in = new BufferedReader(new InputStreamReader(new GZIPInputStream(
      getClass.getResourceAsStream("/parity/mail.log.gz")), StandardCharsets.UTF_8))
    val log = try Iterator.continually(in.readLine()).takeWhile(_ != null).take(3000).toVector
              finally in.close()

    val outDir = java.nio.file.Files.createTempDirectory("graft-stdin").toFile
    try {
      StdinLogs.run(spark,
        new ByteArrayInputStream((log.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8)),
        outDir.getAbsolutePath, ttlMs = None)

      val streamed = spark.read.parquet(s"$outDir/events").as[PostfixEvent].collect()
      val streamedFaults = spark.read.parquet(s"$outDir/faults").count()

      val batch = Sessionize(spark,
        log.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDS())
      val batchEvents = batch.events.collect()

      assert(streamed.length == batchEvents.length, "event count")
      assert(streamedFaults == batch.faults.count(), "fault count")
      assert(streamed.map(key).sortBy(_.toString()).toSeq ==
        batchEvents.map(key).sortBy(_.toString()).toSeq, "event content")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(outDir)
    }
  }
}
