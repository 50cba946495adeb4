package graft.streaming

import graft.SparkSpec
import graft.core.Fixtures
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** The reference fixtures through Structured Streaming, fed across several
  * micro-batches to prove state survives batch boundaries. */
class StreamingSessionizeSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  /** Run lines through the streaming pipeline `batchSize` lines at a time,
    * then apply the dovecot enrichment join the way parquetSink does. */
  private def run(input: String, batchSize: Int,
                  session: org.apache.spark.sql.SparkSession = null)
      : (Seq[graft.core.PostfixEvent], Seq[graft.core.ParseFault]) = {
    val spark = Option(session).getOrElse(this.spark)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val name = s"stream_out_${System.nanoTime()}"
    val q = StreamingSessionize(mem.toDS(), ttlMs = None)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name)
      .start()
    try {
      val lines = input.split("\n", -1).zipWithIndex.map { case (l, i) => (i.toLong, l) }
      lines.grouped(batchSize).foreach { batch =>
        mem.addData(batch.toSeq)
        q.processAllAvailable()
      }
      val out = spark.table(name).as[StreamingSessionize.StreamOut]
      val events = StreamingSessionize.enrich(
          out.filter(_.kind == 0), out.filter(_.kind == 1).toDF())
        .collect().sortBy(_.timestamp.getTime).toSeq
      (events, out.filter(_.kind == 2).collect().flatMap(_.fault).toSeq)
    } finally q.stop()
  }

  test("read-time TTL eviction: rows after the deadline start a FRESH session") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import graft.core.SessionBuf

    val qid = "0A3F51021C3"
    def row(seq: Long, payload: String) = StreamingSessionize.InRow(
      seq, 0, qid, 1700000000000000L + seq,
      s"2024-04-09T20:22:42+00:00 h postfix/x[1]: $qid: $payload", "", "", "")

    // state accumulated long ago: message-id + from + to already set
    val oldBuf = SessionBuf.empty.copy(
      kv = Map("message-id" -> "<m@x>", "from" -> "<a@b>", "status" -> "sent"),
      to = Vector("<r@d>"), tsMicros = 1L,
      statusDescription = Some("250 ok"), rawLog = Vector("old line"))
    val oldState = StreamingSessionize.S1State(oldBuf, Nil, "<m@x>", 0L,
      firstSeenMs = 1000L)

    // processing time far past firstSeenMs + TTL → the key must be evicted
    // BEFORE this batch's rows fold in (reference cleanup-then-feed order):
    // the `removed` line lands in a FRESH session with no fields and
    // faults with KeyError instead of emitting the stale event
    val now = 1000L + StreamingSessionize.TtlMs + 60000L
    val state = TestGroupState.create[StreamingSessionize.S1State](
      Optional.of(oldState), GroupStateTimeout.ProcessingTimeTimeout,
      now, Optional.empty[Long], false)
    val out = StreamingSessionize.updateSession(Some(StreamingSessionize.TtlMs))(
      qid, Iterator(row(100L, "removed")), state).toVector

    assert(out.count(_.kind == 0) == 0, "stale session must not emit an event")
    assert(out.count(_.kind == 2) == 1, "fresh empty session + removed → KeyError fault")
    assert(out.flatMap(_.fault).head.error.contains("from"))

    // same call with the deadline NOT passed emits the accumulated event
    val live = TestGroupState.create[StreamingSessionize.S1State](
      Optional.of(oldState), GroupStateTimeout.ProcessingTimeTimeout,
      1000L + 5000L, Optional.empty[Long], false)
    val out2 = StreamingSessionize.updateSession(Some(StreamingSessionize.TtlMs))(
      qid, Iterator(row(100L, "removed")), live).toVector
    assert(out2.count(_.kind == 0) == 1, "live session emits on removed")
  }

  test("pass-through keys never write state and map dove/fault rows verbatim") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val dove = StreamingSessionize.InRow(7L, 1, "", -1L,
      "raw dove line", "<m@x>", "stored into 'Junk'", "")
    val fault = StreamingSessionize.InRow(9L, 2, "", -1L,
      "bad line", "", "", "boom")
    val state = TestGroupState.create[StreamingSessionize.S1State](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], false)
    val out = StreamingSessionize.dispatch(Some(StreamingSessionize.TtlMs))(
      "p:3", Iterator(dove, fault), state).toVector
    assert(!state.exists, "pass-through keys must not create state")
    assert(!state.isUpdated && !state.isRemoved)
    assert(out.map(_.kind) == Vector(1, 2))
    assert(out(0).msgidRaw == "<m@x>" && out(0).doveSeq == 7L &&
      out(0).doveAction == "stored into 'Junk'")
    assert(out(1).fault.exists(f => f.line == "bad line" && f.error == "boom"))
  }

  test("basic fixture, one line per micro-batch") {
    val (events, faults) = run(Fixtures.basic, 1)
    assert(faults.isEmpty)
    assert(events.size == 1)
    val e = events.head
    assert(e.queue_id == "85C6C10208A")
    assert(e.status_code.contains(250))
    assert(e.raw_log == Fixtures.basicRawLog)
    assert(e.client.contains("mail.localhost[192.168.0.1]"))
  }

  test("mixed fixture interleaved across batches") {
    val input = Fixtures.mixedPart1 + "\n" + Fixtures.mixedSentLine +
      "\n2024-04-09T20:22:43.039628+03:00 localhost postfix/qmgr[837]: 85C6C10208A: removed" +
      "\n" + Fixtures.mixedBouncedLine +
      "\n2024-04-09T20:25:02.570564+03:00 localhost postfix/qmgr[837]: 2D7291020EE: removed"
    val (events, faults) = run(input, 3)
    assert(faults.isEmpty)
    assert(events.size == 2)
    assert(events.map(_.status).toSet == Set("sent", "bounced"))
  }

  test("dovecot sieve line enriches only the live session (cross-batch)") {
    val (events, faults) = run(Fixtures.dovecot, 2)
    assert(faults.isEmpty)
    assert(events.size == 1)
    assert(events.head.dovecot_fileinto_action.contains("stored mail into mailbox 'Junk'"))
  }

  test("dovecot line AFTER removal does not enrich (live-window semantics)") {
    val lines = Fixtures.dovecot.split("\n").filter(_.nonEmpty)
    val (doveLine, rest) = lines.partition(_.startsWith("Apr 30"))
    val reordered = (rest :+ doveLine.head).mkString("\n")
    val (events, faults) = run(reordered, 4)
    assert(faults.isEmpty)
    assert(events.size == 1)
    assert(events.head.dovecot_fileinto_action.isEmpty)
  }

  test("subject decoding across batch boundary") {
    val (events, faults) = run(Fixtures.utf8Subject, 2)
    assert(faults.isEmpty)
    assert(events.head.message_subject.contains("test - Тест"))
  }

  test("RocksDB state store: cross-batch state + dovecot enrichment agree with default store") {
    val rocks = StreamingSessionize.withRocksDbStateStore(spark)
    assert(rocks.conf.get("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDBStateStoreProvider"))
    // isolation: the parent session's provider is untouched
    assert(!spark.conf.get("spark.sql.streaming.stateStore.providerClass",
      "default").contains("RocksDB"))
    for (fixture <- Seq(Fixtures.mixedPart1 + "\n" + Fixtures.mixedSentLine +
        "\n2024-04-09T20:22:43.039628+03:00 localhost postfix/qmgr[837]: 85C6C10208A: removed" +
        "\n" + Fixtures.mixedBouncedLine +
        "\n2024-04-09T20:25:02.570564+03:00 localhost postfix/qmgr[837]: 2D7291020EE: removed",
        Fixtures.dovecot)) {
      val (defEvents, defFaults) = run(fixture, 2)
      val (rocksEvents, rocksFaults) = run(fixture, 2, session = rocks)
      assert(rocksFaults == defFaults)
      assert(rocksEvents.map(_.queue_id) == defEvents.map(_.queue_id))
      assert(rocksEvents.map(_.dovecot_fileinto_action) ==
        defEvents.map(_.dovecot_fileinto_action))
      assert(rocksEvents == defEvents)
    }
  }

  test("parquet foreachBatch sink end-to-end") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val mem = MemoryStream[(Long, String)]
    val q = StreamingSessionize(mem.toDS(), ttlMs = None)
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch(StreamingSessionize.parquetSink(dir))
      .start()
    try {
      val lines = Fixtures.dovecot.split("\n", -1).zipWithIndex.map { case (l, i) => (i.toLong, l) }
      lines.grouped(3).foreach { b => mem.addData(b.toSeq); q.processAllAvailable() }
      val events = spark.read.parquet(s"$dir/events").as[graft.core.PostfixEvent].collect()
      assert(events.length == 1)
      assert(events.head.dovecot_fileinto_action.contains("stored mail into mailbox 'Junk'"))
    } finally q.stop()
  }
}
