package graft.operators

import graft.core._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Batch sessionization: `Dataset[(seq, rawLine)]` → finalized
  * [[PostfixEvent]]s + [[ParseFault]] side channel.
  *
  * Physical shape (designed for a 1000-executor cluster, tested on
  * local[32]):
  *
  *   1. narrow `flatMap` classify stage — pure projection/filter, no
  *      shuffle; noise lines die here so only postfix session lines carry
  *      into the exchange (reference's manual predicate ordering,
  *      parse.py:388-405, is free here).
  *   2. ONE hash shuffle on `queue_id` (`groupByKey`) + per-group fold.
  *      Groups are individual mail deliveries — a handful of lines each —
  *      so the in-memory per-group sort by input sequence number is O(10)
  *      and can never skew: queue ids are uniformly random 11-hex-char
  *      strings.
  *   3. dovecot enrichment as an equi-join on the bracketed message-id
  *      (replaces the reference's O(state) nested scan per sieve line,
  *      parse.py:373-375, with a hash join; AQE picks broadcast when the
  *      sieve side is small).
  *
  * The input sequence number re-imposes the reference's arrival order
  * (last-write-wins k=v, first-seen timestamp, raw_log order) across the
  * shuffle — see SURVEY.md §7.3.
  */
object Sessionize {

  /** One classified line, encodable for the exchange.
    * kind: 0 = session line, 1 = dovecot action, 2 = classify fault. */
  case class ClassifiedRow(
      seq: Long, kind: Int, queueId: String, tsMicros: Long,
      raw: String, msgid: String, action: String, error: String)

  /** Fold output: exactly one of event/fault is set; msgidRaw carries the
    * dovecot join key for emitted events. */
  case class FoldOut(event: Option[PostfixEvent], fault: Option[ParseFault], msgidRaw: Option[String])

  case class Result(events: Dataset[PostfixEvent], faults: Dataset[ParseFault])

  def classify(spark: SparkSession, lines: Dataset[(Long, String)]): Dataset[ClassifiedRow] = {
    import spark.implicits._
    lines.flatMap { case (seq, raw) =>
      LineParser.classify(raw).map {
        case LineParser.SessionLine(qid, ts, r) =>
          ClassifiedRow(seq, 0, qid, ts, r, null, null, null)
        case LineParser.DovecotLine(msgid, action) =>
          ClassifiedRow(seq, 1, null, -1L, raw, msgid, action, null)
        case LineParser.Fault(line, err) =>
          ClassifiedRow(seq, 2, null, -1L, line, null, null, err)
      }
    }
  }

  /** Replay one queue id's lines in input order through the shared fold.
    * May emit several events (queue-id reuse after `removed`). */
  def foldGroup(queueId: String, rows: Iterator[ClassifiedRow]): Iterator[FoldOut] = {
    val sorted = rows.toArray.sortBy(_.seq)
    val out = Vector.newBuilder[FoldOut]
    var st = SessionBuf.empty
    sorted.foreach { row =>
      val res = SessionFold.step(st, LineParser.SessionLine(queueId, row.tsMicros, row.raw))
      st = res.state.getOrElse(SessionBuf.empty)
      if (res.event.isDefined || res.fault.isDefined)
        out += FoldOut(res.event, res.fault, res.msgidRaw)
    }
    out.result().iterator
  }

  def apply(spark: SparkSession, lines: Dataset[(Long, String)]): Result = {
    import spark.implicits._
    val classified = classify(spark, lines)

    val folded = classified
      .filter(_.kind == 0)
      .groupByKey(_.queueId)
      .flatMapGroups((qid: String, it: Iterator[ClassifiedRow]) => foldGroup(qid, it))

    // Last sieve line wins per message id (parse.py:375 keeps overwriting).
    val doveAgg = classified
      .filter(_.kind == 1)
      .groupByKey(_.msgid)
      .mapGroups((_: String, it: Iterator[ClassifiedRow]) => { val m = it.maxBy(_.seq); (m.msgid, m.action) })
      .toDF("msgid", "dovecot_action")

    val events = folded
      .filter(_.event.isDefined)
      .map(f => (f.event.get, f.msgidRaw.orNull))
      .toDF("event", "msgid_raw")
      .join(doveAgg, $"msgid_raw" === $"msgid", "left_outer")
      .select(col("event"), col("dovecot_action"))
      .as[(PostfixEvent, Option[String])]
      .map { case (ev, action) => ev.copy(dovecot_fileinto_action = action.orElse(ev.dovecot_fileinto_action)) }

    val faults = classified.filter(_.kind == 2).map(r => ParseFault(r.raw, r.error))
      .unionAll(folded.filter(_.fault.isDefined).map(_.fault.get))

    Result(events, faults)
  }

  /** Convenience: read text files (one line per row) and sessionize.
    * The per-file line index is the arrival order within a file — matching
    * the reference's `cat file | parse.py` contract (README.md:4). */
  def fromTextFiles(spark: SparkSession, paths: String*): Result = {
    import spark.implicits._
    val lines = spark.read.textFile(paths: _*)
      .rdd.zipWithIndex.map { case (l, i) => (i, l) }
      .toDS()
    apply(spark, lines)
  }
}
