package graft.core

import java.time.LocalDate

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

  /** First `max` tokens of [[tokenize]] — the count is exact when the line
    * has fewer. [[classify]] only ever inspects tokens 0-8 (timestamp,
    * queue id, dovecot guard), so scanning and allocating the full ~20
    * tokens of every line — including all noise lines — was wasted work in
    * the classify stage; the full tokenize is deferred to the rare dovecot
    * match and the post-shuffle session fold. */
  def tokenizePrefix(s: String, max: Int): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuilder.ofRef[String]
    out.sizeHint(max)
    var i = 0
    var n = 0
    val len = s.length
    while (i < len && n < max) {
      while (i < len && isPySpace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isPySpace(s.charAt(i))) i += 1
      if (i > start) { out += s.substring(start, i); n += 1 }
    }
    out.result()
  }

  /** Queue-id predicate: 11 chars of [0-9A-F] followed by ':'
    * (parse.py:237-256). */
  def isQueueId(tok: String): Boolean =
    tok.length == 12 && tok.charAt(11) == ':' &&
      tok.substring(0, 11).forall(c => (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F'))

  /** `datetime.fromisoformat` analogue (parse.py:398) — a hand-rolled
    * scanner of CPython 3.11's C implementation
    * (Modules/_datetimemodule.c: `_find_isoformat_datetime_separator`,
    * `parse_isoformat_date`, `parse_hh_mm_ss_ff`), pinned by a fuzz table
    * generated from the actual interpreter
    * (LineParserSpec "fromisoformat parity table"):
    *
    *   date  = YYYY-MM-DD | YYYYMMDD | YYYY-Www[-D] | YYYYWwwD?  — the
    *           date length is decided UP FRONT by format-discrimination
    *           rules (not greedily), then parsed strictly
    *   sep   = any ONE character at the predetermined position
    *   time  = HH[:MM[:SS]] | HH[MM[SS]]: 2-digit comps, ':' use is
    *           all-or-nothing; a fraction (first 6 digits = micros) may
    *           follow ANY component after `.`/`,` — or follow the seconds
    *           with `:` (sep mode) / no separator at all (basic mode)
    *   tz    = trailing 'Z', or ±time-grammar with NO per-component range
    *           checks (CPython normalizes via timedelta), |off| < 24 h,
    *           and a zero-second offset collapses to UTC dropping its
    *           fraction
    *
    * Naive timestamps are taken as UTC (the engine normalizes to UTC).
    * Exception-free on every reject path: this predicate filters all
    * noise lines (dovecot syslog `Apr 30 ...`, junk) and JVM exceptions
    * cost microseconds each — an exception-driven reject dominated the
    * classify-stage profile in round 1. */
  def parseIsoMicros(tok: String): Option[Long] = {
    val n = tok.length
    if (n < 7) return None // shortest accepted form is "YYYYWwwD"-less "YYYYWww"
    var i = 0
    while (i < 4) { if (!isDigit(tok.charAt(i))) return None; i += 1 }
    val year = (tok.charAt(0) - '0') * 1000 + (tok.charAt(1) - '0') * 100 +
      (tok.charAt(2) - '0') * 10 + (tok.charAt(3) - '0')
    if (year < 1) return None

    // ---- date length via CPython's format discrimination ------------
    val dateLen: Int =
      if (n == 7) 7
      else if (tok.charAt(4) == '-') {
        if (tok.charAt(5) == 'W') {
          if (n > 8 && tok.charAt(8) == '-') {
            if (n == 9) -1
            else if (n > 10 && isDigit(tok.charAt(10))) 8
            else 10
          } else 8
        } else 10
      } else if (tok.charAt(4) == 'W') {
        var idx = 7
        while (idx < n && isDigit(tok.charAt(idx))) idx += 1
        if (idx < 9) idx else if (idx % 2 == 0) 7 else 8
      } else 8
    if (dateLen < 0 || dateLen > n) return None

    def twoDigitIn(at: Int, end: Int): Int =
      if (at + 1 < end && isDigit(tok.charAt(at)) && isDigit(tok.charAt(at + 1)))
        (tok.charAt(at) - '0') * 10 + (tok.charAt(at + 1) - '0')
      else -1

    // ---- date part → epoch day (strict parse of tok[0, dateLen)) ----
    val hasDash = tok.charAt(4) == '-'
    var pos = if (hasDash) 5 else 4
    if (pos >= dateLen) return None
    var epochDay = 0L
    if (tok.charAt(pos) == 'W') {
      pos += 1
      val week = twoDigitIn(pos, dateLen); if (week < 0) return None
      pos += 2
      var dow = 1
      if (dateLen > pos) {
        // "Inconsistent use of dash separator" check (datetime.py:336)
        if ((tok.charAt(pos) == '-') != hasDash) return None
        if (hasDash) pos += 1
        if (pos >= dateLen || !isDigit(tok.charAt(pos))) return None
        dow = tok.charAt(pos) - '0'
        pos += 1
      }
      if (pos != dateLen) return None
      if (week < 1 || week > isoWeeksInYear(year) || dow < 1 || dow > 7) return None
      val jan4 = LocalDate.of(year, 1, 4)
      epochDay = jan4.toEpochDay - (jan4.getDayOfWeek.getValue - 1) +
        (week - 1) * 7L + (dow - 1)
    } else {
      val month = twoDigitIn(pos, dateLen); if (month < 0) return None
      pos += 2
      if (pos < dateLen) {
        if ((tok.charAt(pos) == '-') != hasDash) return None
      } else if (hasDash) return None
      if (hasDash) pos += 1
      val day = twoDigitIn(pos, dateLen); if (day < 0) return None
      pos += 2
      if (pos != dateLen) return None
      if (month < 1 || month > 12 || day < 1 || day > daysInMonth(year, month)) return None
      epochDay = LocalDate.of(year, month, day).toEpochDay
    }

    val dateMicros = epochDay * 86400000000L
    if (dateLen == n) return Some(dateMicros)
    pos = dateLen + 1 // the predetermined separator position: ANY one char
    if (n - pos < 2) return None // "Isoformat time too short"

    // ---- locate tz: first occurrence of 'Z'/'+'/'-' ------------------
    var tzPos = pos
    while (tzPos < n && { val c = tok.charAt(tzPos); c != 'Z' && c != '+' && c != '-' })
      tzPos += 1

    // parse_hh_mm_ss_ff over [s, e): packed micros (secs*1e6 + frac), or
    // -1 on reject — unboxed; a (Long, Long) tuple here allocated once per
    // parsed line in the classify hot path.
    // validateComps: time components get datetime's range checks; tz
    // components do NOT (CPython routes them through timedelta).
    def parseHms(s: Int, e: Int, validateComps: Boolean): Long = {
      var p = s
      val comps = Array(0, 0, 0)
      var frac = 0L
      var ci = 0
      var done = false
      // ':' use is all-or-nothing, decided by the char after the hour
      val hasSep = s + 2 < e && tok.charAt(s + 2) == ':'
      while (!done && ci < 3) {
        val v = twoDigitIn(p, e); if (v < 0) return -1L
        comps(ci) = v
        p += 2
        if (p >= e) done = true
        else {
          val c = tok.charAt(p)
          if (c == '.' || c == ',') {
            // explicit fraction separator after any component
            p += 1
            if (p >= e || !isDigit(tok.charAt(p))) return -1L
            var scale = 100000L
            var k = 0
            while (p < e) {
              if (!isDigit(tok.charAt(p))) return -1L
              if (k < 6) { frac += (tok.charAt(p) - '0') * scale; scale /= 10 }
              k += 1; p += 1
            }
            done = true
          } else if (ci < 2) {
            if (hasSep) { if (c != ':') return -1L; p += 1 }
            else if (!isDigit(c)) return -1L
            ci += 1
          } else {
            // after seconds: ':'+digits (sep mode) or bare digits (basic
            // mode) are ALSO a fraction in CPython's C scanner
            if (hasSep) { if (c != ':') return -1L; p += 1 }
            else if (!isDigit(c)) return -1L
            if (p >= e || !isDigit(tok.charAt(p))) return -1L
            var scale = 100000L
            var k = 0
            while (p < e) {
              if (!isDigit(tok.charAt(p))) return -1L
              if (k < 6) { frac += (tok.charAt(p) - '0') * scale; scale /= 10 }
              k += 1; p += 1
            }
            done = true
          }
        }
      }
      if (validateComps && (comps(0) > 23 || comps(1) > 59 || comps(2) > 59)) return -1L
      (comps(0) * 3600L + comps(1) * 60L + comps(2)) * 1000000L + frac
    }

    val timeMicros = parseHms(pos, tzPos, validateComps = true)
    if (timeMicros < 0) return None
    if (tzPos == n) return Some(dateMicros + timeMicros) // naive → UTC

    // ---- timezone ----------------------------------------------------
    val marker = tok.charAt(tzPos)
    if (marker == 'Z') {
      if (tzPos + 1 != n) return None
      Some(dateMicros + timeMicros)
    } else {
      val tzLen = n - (tzPos + 1)
      if (tzLen == 0 || tzLen == 1 || tzLen == 3) return None // datetime.py:445
      val o = parseHms(tzPos + 1, n, validateComps = false)
      if (o < 0) return None
      val offMicros =
        // zero-SECOND offset collapses to UTC, fraction dropped (packed
        // micros < 1e6 ⟺ the h/m/s components were all zero)
        if (o < 1000000L) 0L
        else {
          if (o >= 86400000000L) return None // |offset| must be < 24 h
          if (marker == '+') o else -o
        }
      Some(dateMicros + timeMicros - offMicros)
    }
  }

  /** 53 iff the ISO year starts on Thursday, or is a leap year starting
    * on Wednesday; else 52. */
  private def isoWeeksInYear(year: Int): Int = {
    val jan1 = LocalDate.of(year, 1, 1).getDayOfWeek.getValue
    if (jan1 == 4 || (jan1 == 3 && isLeap(year))) 53 else 52
  }

  private def isLeap(y: Int): Boolean = (y % 4 == 0 && y % 100 != 0) || y % 400 == 0

  private def daysInMonth(y: Int, m: Int): Int = m match {
    case 2 => if (isLeap(y)) 29 else 28
    case 4 | 6 | 9 | 11 => 30
    case _ => 31
  }

  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** Dovecot sieve guard (parse.py:362-369). Python evaluates the
    * conjunction lazily, so a line whose tokens run out mid-check raises
    * IndexError → on_fault; `tok` reproduces that. `tokens` is the 9-token
    * prefix — all the guard ever indexes; the action's tail tokens are
    * re-scanned from `raw` only on a match (dovecot lines are rare). */
  private def dovecotMatch(raw: String, tokens: Array[String]): Option[(String, String)] = {
    def tok(i: Int): String =
      if (i < tokens.length) tokens(i)
      else throw new PyIndexError(s"list index out of range: $i")
    if (tok(4) == "Info:" && tok(5) == "sieve:" && tok(6).startsWith("msgid=") &&
        tok(7) == "fileinto" && tok(8) == "action:") {
      // msgid=<...>:  →  drop "msgid=", then the trailing ':' (parse.py:370-372)
      val msgid = tok(6).split("=", 2)(1).dropRight(1)
      Some(msgid -> tokenize(raw).drop(9).mkString(" "))
    } else None
  }

  /** Classify one raw line, reproducing feed_line's dispatch order
    * (parse.py:380-405). Returns Nil for dropped/noise lines. */
  def classify(raw: String): List[Classified] =
    try {
      val tokens = tokenizePrefix(raw, 9)
      if (tokens.length < 5) return Nil
      val dove = dovecotMatch(raw, tokens).map { case (m, a) => DovecotLine(m, a) }.toList
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
