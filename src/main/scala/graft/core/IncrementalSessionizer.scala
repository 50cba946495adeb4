package graft.core

import scala.collection.mutable

/** Single-node incremental mode — the exact analogue of the reference's
  * stdin loop (parse.py:508-520) and `PostfixLogParser` state machine,
  * including the mixed-clock TTL eviction (parse.py:272-284): once per
  * `cleanupInterval` of wall-clock time, drop sessions whose *first-seen
  * event time* is more than `oldLogs` older than *wall-clock now*.
  *
  * Useful for: exact TTL-semantics tests (injectable clock), ordered
  * replay inside `mapPartitions` when a partition is a whole log file, and
  * the parity micro-benchmark against the reference parser.
  *
  * @param clockMicros wall clock in epoch micros (injectable for tests)
  */
final class IncrementalSessionizer(
    val onEvent: PostfixEvent => Unit,
    val onFault: ParseFault => Unit,
    clockMicros: () => Long = () => System.currentTimeMillis() * 1000L,
    cleanupIntervalMicros: Long = 60L * 1000000L,       // parse.py:234
    oldLogsMicros: Long = 10L * 60L * 1000000L          // parse.py:77
) {

  /** queue id → in-flight session; insertion-ordered like a Python dict. */
  val state: mutable.LinkedHashMap[String, SessionBuf] = mutable.LinkedHashMap.empty
  var nextCleanupMicros: Long = clockMicros() + cleanupIntervalMicros

  /** parse.py:272-284 — lazy amortized eviction, silent (no event). */
  def cleanupOldEntities(): Unit = {
    val ts = clockMicros()
    if (nextCleanupMicros > ts) return
    nextCleanupMicros = ts + cleanupIntervalMicros
    state.filterInPlace((_, buf) => ts - buf.tsMicros < oldLogsMicros)
  }

  /** parse.py:380-423 — one line through the full dispatch. */
  def feedLine(raw: String): Unit = {
    cleanupOldEntities()
    LineParser.classify(raw).foreach {
      case LineParser.Fault(line, err) => onFault(ParseFault(line, err))
      case LineParser.DovecotLine(msgid, action) =>
        // nested scan over all live sessions (parse.py:373-375)
        state.mapValuesInPlace((_, buf) => SessionFold.applyDovecot(buf, msgid, action))
      case sl: LineParser.SessionLine =>
        val out = SessionFold.step(state.getOrElse(sl.queueId, SessionBuf.empty), sl)
        out.state match {
          case Some(s) => state.update(sl.queueId, s)
          case None    => state.remove(sl.queueId)
        }
        out.event.foreach(onEvent)
        out.fault.foreach(onFault)
    }
  }
}
