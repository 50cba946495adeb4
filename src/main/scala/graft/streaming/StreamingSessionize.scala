package graft.streaming

import graft.core._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming sessionization — the same [[SessionFold]] semantics
  * as the batch operator.
  *
  * Architecture: ONE stateful operator (Spark supports arbitrary chained
  * stateful stages only for event-time window aggregations, and a second
  * `flatMapGroupsWithState` stage stalls the micro-batch planner — found
  * empirically). The keyed stage handles A1/A2/A5/A6 + the TTL (A3) via
  * `ProcessingTimeTimeout`; dovecot correlation (A4) is a per-micro-batch
  * equi-join in `foreachBatch` against the actions accumulated so far.
  *
  * Exactness of the dovecot join: the reference enriches only sessions
  * whose CURRENT message-id matches when the sieve line arrives
  * (parse.py:373-375). With arrival-order sequence numbers this is "the
  * action's seq falls inside one of the session's [[MsgidInterval]]s" —
  * and any such action is necessarily in the same or an earlier
  * micro-batch than the event's `removed` line, so joining each batch's
  * events against all-actions-so-far reproduces the live semantics
  * exactly (same join as the batch operator).
  *
  * Sessions close on `removed` punctuation, which Spark's built-in
  * time-gap `session_window` cannot express — hence the custom state
  * function (SURVEY.md §7.3).
  */
object StreamingSessionize {

  /** Classified transport row. kind: 0=session line, 1=dovecot, 2=fault. */
  case class InRow(seq: Long, kind: Int, queueId: String, tsMicros: Long,
                   raw: String, msgid: String, action: String, error: String)

  /** Stage-1 state: session buffer + message-id validity intervals
    * (closed ones plus the currently-open one).
    * `firstSeenMs` is the processing time when the state was created —
    * TTL expiry is measured from it (reference evicts 10 min after a
    * session's FIRST-seen timestamp regardless of later activity,
    * parse.py:272-284; the timestamp is never refreshed). */
  case class S1State(buf: SessionBuf, closed: List[MsgidInterval],
                     curMsgid: String, curFrom: Long, firstSeenMs: Long = -1L)

  /** Output row: exactly one of event / fault / dovecot action is set.
    * Events carry their message-id validity intervals for the dovecot
    * join ([[MsgidInterval]] semantics — see the batch operator). */
  case class StreamOut(kind: Int, event: Option[PostfixEvent], fault: Option[ParseFault],
                       emitSeq: Long, intervals: Seq[MsgidInterval],
                       msgidRaw: String, doveSeq: Long, doveAction: String)

  val TtlMs: Long = 10L * 60L * 1000L // parse.py:77

  /** Spark's disk-backed state store (shipped in spark-sql; no extra
    * deps). The default HDFS-backed provider keeps every live session in
    * executor heap — fine for thousands of in-flight queue ids, the first
    * thing to fall over at 100 TB-scale session cardinality. RocksDB
    * spills state to local disk with an in-memory working set. */
  val RocksDbProviderClass: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** A session whose streaming queries keep keyed state in RocksDB:
    * returns a NEW SparkSession (shared SparkContext, isolated SQLConf),
    * so the provider choice cannot leak into other queries on the same
    * context. Build the stream and call `.writeStream.start()` from the
    * returned session. */
  def withRocksDbStateStore(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDbProviderClass)
    s
  }

  def classify(lines: Dataset[(Long, String)]): Dataset[InRow] = {
    import lines.sparkSession.implicits._
    lines.flatMap { case (seq, raw) =>
      LineParser.classify(raw).map {
        case LineParser.SessionLine(qid, ts, r) => InRow(seq, 0, qid, ts, r, "", "", "")
        case LineParser.DovecotLine(m, a)       => InRow(seq, 1, "", -1L, raw, m, a, "")
        case LineParser.Fault(l, e)             => InRow(seq, 2, "", -1L, l, "", "", e)
      }
    }
  }

  /** The keyed stateful update: replay this batch's lines for one queue id
    * in seq order through the shared fold; TTL-evict silently (A3). */
  def updateSession(ttlMs: Option[Long])(queueId: String, rows: Iterator[InRow],
                    state: GroupState[S1State]): Iterator[StreamOut] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    // absolute TTL anchor: the reference's eviction clock starts at first
    // sight of the queue id and is never refreshed, so re-arming a sliding
    // inactivity timeout here would keep long-lived sessions alive that
    // the reference silently drops.
    // READ-TIME eviction first (reference runs _cleanup_old_entities before
    // feeding every line, parse.py:385, 272-284): a key whose deadline
    // already passed is dropped BEFORE this batch's rows fold in — they
    // then start a fresh session with a fresh first-seen clock, exactly
    // like the reference's `setdefault` after cleanup. Without this, rows
    // arriving between the deadline and the next timeout sweep would still
    // extend and emit from the expired session.
    val nowMs = state.getCurrentProcessingTimeMs()
    val expired = ttlMs.exists(t =>
      state.exists && nowMs - state.get.firstSeenMs >= t)
    if (expired) state.remove()
    val prev = if (expired) None else state.getOption
    val firstSeenMs = prev.map(_.firstSeenMs).getOrElse(nowMs)
    var st = prev.getOrElse(S1State(SessionBuf.empty, Nil, null, 0L))
    val out = Vector.newBuilder[StreamOut]
    rows.toArray.sortBy(_.seq).foreach { row =>
      val res = SessionFold.step(st.buf, LineParser.SessionLine(queueId, row.tsMicros, row.raw))
      st = res.state match {
        case Some(b) =>
          val m = b.kv.getOrElse("message-id", null)
          if (m != st.curMsgid) {
            val closed = if (st.curMsgid != null)
              MsgidInterval(st.curMsgid, st.curFrom, row.seq) :: st.closed else st.closed
            S1State(b, closed, m, row.seq)
          } else st.copy(buf = b)
        case None => S1State(SessionBuf.empty, st.closed, st.curMsgid, st.curFrom)
      }
      res.event.foreach { ev =>
        val all = (if (st.curMsgid != null)
          MsgidInterval(st.curMsgid, st.curFrom, row.seq) :: st.closed else st.closed).reverse
        out += StreamOut(0, Some(ev), None, row.seq, all, "", -1L, "")
        st = S1State(SessionBuf.empty, Nil, null, 0L)
      }
      res.fault.foreach(f => out += StreamOut(2, None, Some(f), -1L, Nil, "", -1L, ""))
    }
    if (st.buf.isEmpty) state.remove()
    else {
      state.update(st.copy(firstSeenMs = firstSeenMs))
      // GroupState clears a pending timeout whenever the function runs for
      // the key, so re-arm with the REMAINING duration from the absolute
      // first-seen anchor (≥1 ms: already-expired sessions die at the next
      // timeout sweep rather than emitting further)
      ttlMs.foreach { t =>
        state.setTimeoutDuration(
          math.max(1L, firstSeenMs + t - state.getCurrentProcessingTimeMs()))
      }
    }
    out.result().iterator
  }

  /** Raw (seq, line) stream → events (un-enriched) + faults + dovecot
    * action rows. Single stateful operator; works on batch Datasets too.
    *
    * @param ttlMs session TTL (A3 eviction). With a timeout registered the
    *              engine schedules extra no-data micro-batches to evaluate
    *              expiry — use a ProcessingTime trigger in production, and
    *              None in synchronous tests (`processAllAvailable` would
    *              otherwise never settle — found empirically). */
  def apply(lines: Dataset[(Long, String)], ttlMs: Option[Long] = Some(TtlMs)): Dataset[StreamOut] = {
    import lines.sparkSession.implicits._
    // NOTE (r18, measured): classify runs inside the seq-stamping
    // partition (the deterministic arrival order needs a serial
    // zipWithIndex), but parallelizing it with a repartition before the
    // parse bought NOTHING at the 10M-line ladder (80.7 → 80.9 s at 20
    // batches, 44.3 → 44.8 s at 1) — the tokenizer is cheap enough that
    // the extra raw-line exchange exactly offsets the parallel parse.
    // Kept serial: one fewer exchange, same wall.
    val rows = classify(lines)
    val timeoutConf = if (ttlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    // ONE source pass, ONE shuffle, ONE stateful operator. The previous
    // shape (stateful branch ∪ dovecot map ∪ fault map) made Spark
    // re-read and RE-PARSE the entire source once per union branch —
    // every micro-batch paid 3× classify (numInputRows showed 3× the
    // line count; ~2 s of the measured ~2.9 s per-batch fixed cost).
    // Non-session rows route through the same operator under spread
    // pass-through keys ("p:" + seq&31) that never create state or arm
    // timeouts; queue keys carry a "q:" prefix so the two key spaces
    // cannot collide.
    rows.groupByKey(r =>
        if (r.kind == 0) "q:" + r.queueId else "p:" + (r.seq & 31L))
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(dispatch(ttlMs))
  }

  /** Key-routed dispatch for the single stateful operator: "q:" keys run
    * the session fold; "p:" keys pass dovecot/fault rows straight
    * through (stateless — no state row is ever written for them). */
  private[streaming] def dispatch(ttlMs: Option[Long])(key: String, rows: Iterator[InRow],
               state: GroupState[S1State]): Iterator[StreamOut] =
    if (key.startsWith("q:")) updateSession(ttlMs)(key.substring(2), rows, state)
    else rows.map { r =>
      if (r.kind == 1)
        StreamOut(1, None, None, -1L, Nil, r.msgid, r.seq, r.action)
      else
        StreamOut(2, None, Some(ParseFault(r.raw, r.error)), -1L, Nil, "", -1L, "")
    }

  /** Dovecot enrichment (A4) as a batch join: last action inside each
    * event's live window wins (reference overwrites, parse.py:375).
    *
    * @param events  dataframe of StreamOut event rows (kind 0)
    * @param actions dataframe of StreamOut dovecot rows (kind 1) — ALL
    *                actions seen so far, not just this batch's
    */
  def enrich(events: Dataset[StreamOut], actions: DataFrame): Dataset[PostfixEvent] = {
    import events.sparkSession.implicits._
    val acts = actions.select(col("msgidRaw").as("a_msgid"),
      col("doveSeq").as("a_seq"), col("doveAction").as("a_action"))
    // same emitSeq-keyed shape as the batch operator: the wide event
    // struct never travels through the interval explode/join
    val matched = events.toDF()
      .select(col("emitSeq"), explode(col("intervals")).as("iv"))
      // inclusive toSeq for combined dovecot+msgid-change lines — see the
      // batch operator's join for the boundary rationale
      .join(acts, col("iv.msgid") === col("a_msgid") &&
        col("a_seq") > col("iv.fromSeq") && col("a_seq") <= col("iv.toSeq"))
      .groupBy(col("emitSeq"))
      .agg(max_by(col("a_action"), col("a_seq")).as("last_action"))
      .withColumnRenamed("emitSeq", "m_seq").alias("mt")
    events.toDF().select(col("event"), col("emitSeq")).alias("ev")
      .join(matched, col("ev.emitSeq") === col("mt.m_seq"), "left_outer")
      .select(col("event"), col("last_action"))
      .as[(PostfixEvent, Option[String])]
      .map { case (evt, act) =>
        evt.copy(dovecot_fileinto_action = act.orElse(evt.dovecot_fileinto_action)) }
  }

  /** Convenience sink: write enriched events + faults as parquet, with the
    * dovecot action log accumulated under the same root. Use as
    * `sessionized.writeStream.foreachBatch(parquetSink(outDir)).start()`. */
  def parquetSink(outDir: String): (Dataset[StreamOut], Long) => Unit = {
    (batch: Dataset[StreamOut], batchId: Long) => {
      val spark = batch.sparkSession
      import spark.implicits._
      // COLUMNAR cache + columnar kind projections: the old object
      // cache paid a typed-lambda deserialization pass per consumer
      // (3× per batch). THREE jobs per batch, down from five: this
      // batch's actions join the enrichment as a cache-side union (the
      // store is NOT re-written-then-re-read first — replayed batches
      // may duplicate store rows either way, and the max_by(seq)
      // enrichment is idempotent to duplicates), and the events write
      // runs first so the cache materializes inside it at the stateful
      // stage's full parallelism (coalesce only collapses the
      // post-shuffle tail of the enrich plan). The two SLIM sinks
      // (actions store + faults, each a one-task job over the cache)
      // then commit CONCURRENTLY — their wall cost is max, not sum;
      // Spark's scheduler interleaves independent jobs from separate
      // submitter threads. Replay caveat: the sink is append-mode, NOT
      // idempotent — a crash while the events write or either
      // concurrent slim write is in flight duplicates the landed
      // rows when the batch replays (at-least-once); consumers that
      // need exactly-once should dedup on (queue_id, seq) or read
      // through a batch_id-partitioned overwrite sink.
      val timing = sys.env.get("SPARK_GRAFT_SINK_TIMING").contains("1")
      val t0 = System.nanoTime()
      val cached = batch.toDF().persist()
      try {
        val newActs = cached.where(col("kind") === 1)
        val allActions =
          if (graft.operators.Artifacts.hasData(spark, s"$outDir/dovecot_actions"))
            spark.read.parquet(s"$outDir/dovecot_actions").unionByName(newActs)
          else newActs
        enrich(cached.where(col("kind") === 0).as[StreamOut], allActions)
          .toDF().coalesce(4).write.mode("append").parquet(s"$outDir/events")
        val tEvents = System.nanoTime()
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration.Duration
        // one file per batch keeps the accumulated store's per-batch
        // re-list/re-scan at O(batches) files instead of
        // O(batches × shuffle partitions), and commits one task
        val actsJob = Future {
          newActs.coalesce(1).write.mode("append")
            .parquet(s"$outDir/dovecot_actions")
        }
        val faultsJob = Future {
          cached.where(col("kind") === 2).select(col("fault.*"))
            .coalesce(1).write.mode("append").parquet(s"$outDir/faults")
        }
        Await.result(actsJob, Duration.Inf)
        Await.result(faultsJob, Duration.Inf)
        if (timing)
          println(f"[parquet-sink] batch=$batchId " +
            f"events=${(tEvents - t0) / 1e9}%.2fs " +
            f"slims=${(System.nanoTime() - tEvents) / 1e9}%.2fs")
      } finally { cached.unpersist(); () }
    }
  }
}
