package graft.core

import java.sql.Timestamp
import java.time.Instant

/** Finalized postfix delivery session — one row of the `events` analytic
  * table.
  *
  * Field set and nullability mirror the reference's ClickHouse DDL
  * (reference: lognormalizer/parse.py:27-54) and the `PostfixEvent`
  * attribute block (parse.py:104-127). Numeric-looking fields
  * (`delay`, `size`, `nrcpt`, ...) are kept as strings for parity with the
  * reference's `Nullable(String)` columns (parse.py:46-51); see
  * [[graft.sources.EventsTable]] for the typed analytic view.
  *
  * `status_code`/`status_postfix_code` are `Option` because the reference
  * leaves the attributes *unset* when no `ddd d.d.d` pair occurs in the
  * status description (parse.py:206-215) — the closest JVM analogue of an
  * absent Python attribute.
  */
case class PostfixEvent(
    timestamp: Timestamp,
    queue_id: String,
    domain_from: String,
    domains_to: Seq[String],
    message_from: String,
    message_to: Seq[String],
    message_id: String,
    message_subject: Option[String],
    status: String,
    status_code: Option[Int],
    status_postfix_code: Option[String],
    status_description: String,
    client: Option[String],
    orig_to: Option[String],
    dovecot_fileinto_action: Option[String],
    delay: Option[String],
    delays: Option[String],
    dsn: Option[String],
    nrcpt: Option[String],
    relay: Option[String],
    size: Option[String],
    raw_log: Seq[String]
)

/** A line the pipeline could not process — the reference's `on_fault`
  * side-channel (parse.py:265-270, try/except at parse.py:387,422-423). */
case class ParseFault(line: String, error: String)

/** Stack-trace-free exceptions for the reference's exception-as-control-flow
  * quirks (lazy guards raising IndexError, required-key KeyError,
  * parse.py:319-323, 136-168). Python exceptions are cheap; the JVM's
  * `fillInStackTrace` walk is not, and ~6% of real log lines take a fault
  * path — suppressing the (never-read) stack capture keeps the classify
  * and fold loops allocation-cheap while `toString` still lands in the
  * fault channel. */
final class PyKeyError(msg: String) extends NoSuchElementException(msg) {
  override def fillInStackTrace(): Throwable = this
}

final class PyIndexError(msg: String) extends IndexOutOfBoundsException(msg) {
  override def fillInStackTrace(): Throwable = this
}

/** In-flight session accumulator for one queue id — the Spark-typed
  * equivalent of the reference's `Dict[str, Any]` state entry
  * (parse.py:227). Immutable so it can serve directly as the
  * `GroupState[_]` value in Structured Streaming.
  *
  * @param tsMicros  epoch micros of the first line seen for the queue id
  *                  (-1 = unset; parse.py:414-415)
  * @param rawLog    every contributing raw line, arrival order (parse.py:409-412)
  * @param to        accumulated `to=` values, angle brackets still on
  *                  (parse.py:299-300)
  * @param kv        last-write-wins key=value tokens (parse.py:302)
  */
case class SessionBuf(
    tsMicros: Long,
    rawLog: Vector[String],
    to: Vector[String],
    kv: Map[String, String],
    subject: Option[String],
    statusDescription: Option[String],
    dovecotFileintoAction: Option[String]
) {
  def isEmpty: Boolean = rawLog.isEmpty
}

object SessionBuf {
  val empty: SessionBuf =
    SessionBuf(-1L, Vector.empty, Vector.empty, Map.empty, None, None, None)
}

/** A half-open seq-interval during which `msgid` was the session's current
  * `message-id=` value: set at `fromSeq`, replaced/closed at `toSeq`.
  * Dovecot enrichment (parse.py:373-375) applies an action to a session
  * iff the sieve line arrived inside such an interval — carrying the
  * intervals out of the fold lets the batch/streaming join reproduce the
  * reference's live-scan semantics exactly, including sessions whose
  * message-id changed (fault-kept state merged into a reused queue id). */
case class MsgidInterval(msgid: String, fromSeq: Long, toSeq: Long)

object TimeUtil {
  def toTimestamp(micros: Long): Timestamp =
    Timestamp.from(Instant.ofEpochSecond(
      Math.floorDiv(micros, 1000000L),
      Math.floorMod(micros, 1000000L) * 1000L))

  def toMicros(i: Instant): Long =
    Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)
}
