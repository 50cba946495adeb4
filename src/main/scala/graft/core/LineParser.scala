package graft.core

import java.time.{LocalDate, LocalDateTime, OffsetDateTime, ZoneOffset}

/** Pure, Spark-free per-line classification — the projection/filter stage
  * of the pipeline (reference: lognormalizer/parse.py:380-405 dispatch
  * order). Every quirk of the reference's tokenizer and predicates is
  * reproduced here so both the batch and the streaming operators share one
  * semantics:
  *
  *   - whitespace tokenize, drop lines with < 5 tokens (parse.py:388-391)
  *   - dovecot sieve detection runs BEFORE the timestamp filter and never
  *     consumes the line (parse.py:393-394, 378)
  *   - ISO-8601 parse-or-drop on token 0 (parse.py:396-400)
  *   - queue id = exactly 11 uppercase-hex chars + ':' (parse.py:237-256)
  */
object LineParser {

  /** Classification of one raw line. A single line can yield more than one
    * result: a dovecot-shaped line falls through to the normal pipeline in
    * the reference (its handler always returns False, parse.py:378), so we
    * model the output as a list. */
  sealed trait Classified
  /** A line that enters session state for `queueId` (parse.py:402-415). */
  final case class SessionLine(queueId: String, tsMicros: Long, raw: String) extends Classified
  /** A dovecot sieve `fileinto` enrichment (parse.py:362-378).
    * `msgid` keeps its angle brackets — that is what the reference compares
    * against the stored `message-id=` value (parse.py:370-374). */
  final case class DovecotLine(msgid: String, action: String) extends Classified
  /** Parse error → the reference's `on_fault` channel (parse.py:422-423). */
  final case class Fault(line: String, error: String) extends Classified

  /** Python `str.split()`: any-whitespace split, empties discarded.
    * Hand-rolled single-pass scan — `String.split("\\s+")` recompiles its
    * regex per call and this runs twice per line in the hot path.
    * `Character.isWhitespace` misses the non-breaking spaces Python's
    * `str.isspace` includes (U+00A0/U+2007/U+202F) — added explicitly. */
  private def isPySpace(c: Char): Boolean =
    Character.isWhitespace(c) || c == '\u00a0' || c == '\u2007' || c == '\u202f'

  def tokenize(s: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuilder.ofRef[String]
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isPySpace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isPySpace(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.result()
  }

  /** Queue-id predicate: 11 chars of [0-9A-F] followed by ':'
    * (parse.py:237-256). */
  def isQueueId(tok: String): Boolean =
    tok.length == 12 && tok.charAt(11) == ':' &&
      tok.substring(0, 11).forall(c => (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F'))

  /** `datetime.fromisoformat` analogue (parse.py:398): accepts offset,
    * naive datetime, or bare date; anything else → None (line dropped).
    * Naive timestamps are taken as UTC (the engine normalizes to UTC).
    *
    * The cheap shape guard matters: this predicate rejects every noise
    * line (dovecot syslog `Apr 30 ...`, junk), and JVM exceptions cost
    * microseconds each — an exception-driven reject path dominated the
    * classify stage profile. */
  def parseIsoMicros(tok: String): Option[Long] = {
    // ISO shapes start "dddd-dd-dd"; everything else can't parse.
    if (tok.length < 10) return None
    var i = 0
    while (i < 4) { if (!isDigit(tok.charAt(i))) return None; i += 1 }
    if (tok.charAt(4) != '-' || tok.charAt(7) != '-') return None
    if (!isDigit(tok.charAt(5)) || !isDigit(tok.charAt(6)) ||
        !isDigit(tok.charAt(8)) || !isDigit(tok.charAt(9))) return None
    if (tok.length == 10) {
      try return Some(TimeUtil.toMicros(LocalDate.parse(tok).atStartOfDay.toInstant(ZoneOffset.UTC)))
      catch { case _: Exception => return None }
    }
    // offset forms contain +/-/Z after the date part, naive forms don't
    val hasOffset = tok.indexOf('+', 10) >= 0 || tok.indexOf('-', 10) >= 0 ||
      tok.indexOf('Z', 10) >= 0 || tok.indexOf('z', 10) >= 0
    if (hasOffset) {
      try Some(TimeUtil.toMicros(OffsetDateTime.parse(tok).toInstant))
      catch { case _: Exception => None }
    } else {
      try Some(TimeUtil.toMicros(LocalDateTime.parse(tok).toInstant(ZoneOffset.UTC)))
      catch { case _: Exception => None }
    }
  }

  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** Dovecot sieve guard (parse.py:362-369). Python evaluates the
    * conjunction lazily, so a line whose tokens run out mid-check raises
    * IndexError → on_fault; `tok` reproduces that. */
  private def dovecotMatch(tokens: Array[String]): Option[(String, String)] = {
    def tok(i: Int): String =
      if (i < tokens.length) tokens(i)
      else throw new IndexOutOfBoundsException(s"list index out of range: $i")
    if (tok(4) == "Info:" && tok(5) == "sieve:" && tok(6).startsWith("msgid=") &&
        tok(7) == "fileinto" && tok(8) == "action:") {
      // msgid=<...>:  →  drop "msgid=", then the trailing ':' (parse.py:370-372)
      val msgid = tok(6).split("=", 2)(1).dropRight(1)
      Some(msgid -> tokens.drop(9).mkString(" "))
    } else None
  }

  /** Classify one raw line, reproducing feed_line's dispatch order
    * (parse.py:380-405). Returns Nil for dropped/noise lines. */
  def classify(raw: String): List[Classified] =
    try {
      val tokens = tokenize(raw)
      if (tokens.length < 5) return Nil
      val dove = dovecotMatch(tokens).map { case (m, a) => DovecotLine(m, a) }.toList
      parseIsoMicros(tokens(0)) match {
        case None => dove
        case Some(ts) =>
          if (!isQueueId(tokens(3))) dove
          else dove :+ SessionLine(tokens(3).substring(0, 11), ts, raw)
      }
    } catch {
      case e: Exception => List(Fault(raw, e.toString))
    }
}
