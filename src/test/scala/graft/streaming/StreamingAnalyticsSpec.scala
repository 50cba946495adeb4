package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamingAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked tumbling window emits closed windows, drops late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val name = s"win_${System.nanoTime()}"
    val q = StreamingAnalytics.windowedStatusCounts(
        mem.toDF().toDF("timestamp", "status"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
    try {
      mem.addData((ts(1), "sent"), (ts(2), "sent"), (ts(3), "bounced"))
      q.processAllAvailable()
      // advance watermark far past the first window (10-min lateness)
      mem.addData((ts(30), "sent"))
      q.processAllAvailable()
      // a VERY late event for the first window — must be dropped
      mem.addData((ts(1), "sent"))
      q.processAllAvailable()
      mem.addData((ts(59), "sent"))
      q.processAllAvailable()
      val rows = spark.table(name)
        .select("window_start", "status", "n_events")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(rows.contains((Timestamp.valueOf("2024-01-01 10:00:00"), "sent", 2L)))
      assert(rows.contains((Timestamp.valueOf("2024-01-01 10:00:00"), "bounced", 1L)))
      // the late (ts(1)) event did NOT bump the closed window
      assert(!rows.contains((Timestamp.valueOf("2024-01-01 10:00:00"), "sent", 3L)))
    } finally q.stop()
  }

  test("streaming corpus intake: dedup + quality gate match batch semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val good = "the data pipeline processes a lot of the input rows and " +
      "it is that for the most part quite readable text of the corpus " +
      "with a sensible number of words in it and the usual mix"
      // > 20 tokens, high stopword ratio → quality ≥ 0.5
    val junk = "zzz"                       // < 20 tokens → low quality
    val mem = MemoryStream[(Timestamp, Long, String)]
    val name = s"intake_${System.nanoTime()}"
    val q = StreamingAnalytics.corpusIntake(
        mem.toDF().toDF("timestamp", "doc_id", "text"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
    try {
      // batch 1: only the good doc — its fingerprint enters dedup state
      mem.addData((ts(1), 1L, good))
      q.processAllAvailable()
      // batch 2: a CASE/WHITESPACE variant of the good doc (the batch
      // gate's normalized fingerprint must catch it — a raw content
      // hash would not) and a junk doc; cross-batch arrival makes the
      // keep-first choice deterministic
      mem.addData((ts(2), 2L, good.toUpperCase.replace(" ", "  ")),
        (ts(3), 3L, junk))
      q.processAllAvailable()
      val rows = spark.table(name)
        .select("doc_id", "quality_score", "predicted_lang", "n_tokens")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3)))
      assert(rows.map(_._1).toSet == Set(1L),
        s"normalized dup (2) and junk (3) must be gated, got ${rows.toSeq}")
      // the streaming columns are the BATCH expressions verbatim — values
      // must equal a batch run on the same row
      val batch = graft.operators.TextAnalysis
        .withQuality(Seq((1L, good)).toDF("doc_id", "text"), "text")
        .withColumn("predicted_lang", graft.operators.TextAnalysis.langId($"text"))
        .select("doc_id", "quality_score", "predicted_lang", "n_tokens")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3)))
      assert(rows.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("corpus intake gates identically under the RocksDB state store") {
    val rocks = StreamingSessionize.withRocksDbStateStore(spark)
    import rocks.implicits._
    implicit val sqlCtx = rocks.sqlContext
    val good = "the data pipeline processes a lot of the input rows and " +
      "it is that for the most part quite readable text of the corpus " +
      "with a sensible number of words in it and the usual mix"
    val mem = MemoryStream[(Timestamp, Long, String)]
    val name = s"intake_rocks_${System.nanoTime()}"
    val q = StreamingAnalytics.corpusIntake(
        mem.toDF().toDF("timestamp", "doc_id", "text"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
    try {
      mem.addData((ts(1), 1L, good))
      q.processAllAvailable()
      // the dedup state crossing micro-batches now lives in RocksDB
      mem.addData((ts(2), 2L, good.toUpperCase.replace(" ", "  ")), (ts(3), 3L, "zzz"))
      q.processAllAvailable()
      val kept = rocks.table(name).select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L),
        s"RocksDB-backed dedup state must gate exactly like the default store: $kept")
    } finally q.stop()
  }

  test("streaming dedup keeps first per content hash within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val name = s"dedup_${System.nanoTime()}"
    val q = StreamingAnalytics.streamingDedup(
        mem.toDF().toDF("timestamp", "doc_id", "text"), "text")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
    try {
      mem.addData((ts(1), 1L, "same text"), (ts(2), 2L, "same text"), (ts(3), 3L, "other"))
      q.processAllAvailable()
      mem.addData((ts(4), 4L, "same text"))   // dup within horizon → dropped
      q.processAllAvailable()
      val ids = spark.table(name).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids.intersect(Set(1L, 2L)).size == 1)  // exactly one of the dups kept
      assert(ids.contains(3L))
      assert(!ids.contains(4L))
    } finally q.stop()
  }
}
