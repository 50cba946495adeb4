package graft.core

/** Pure session-accumulation semantics — one step per session line, shared
  * verbatim by the batch operator ([[graft.operators.Sessionize]]), the
  * streaming operator ([[graft.streaming.StreamingSessionize]]) and the
  * single-node incremental mode ([[graft.core.IncrementalSessionizer]]).
  *
  * Reference: lognormalizer/parse.py:286-360 and 406-420. All reproduced
  * quirks are commented at the site that implements them.
  */
object SessionFold {

  /** Result of feeding one session line:
    *   - `state`: new session state; None ⇒ the session finalized and its
    *     state must be dropped (parse.py:353)
    *   - `event`: finalized event to emit (parse.py:354)
    *   - `fault`: fault to emit; the reference keeps the (already updated)
    *     state when finalize throws, because `del` runs after the
    *     constructor (parse.py:352-353) — hence state=Some on fault.
    *   - `msgidRaw`: on emit, the session's raw (still angle-bracketed)
    *     `message-id=` value — the key the dovecot enrichment joins on
    *     (parse.py:374).
    */
  final case class StepOut(
      state: Option[SessionBuf],
      event: Option[PostfixEvent],
      fault: Option[ParseFault],
      msgidRaw: Option[String])

  /** Python `str.strip(chars)`: remove any of `chars` from both ends. */
  def stripChars(s: String, chars: String): String = {
    var a = 0
    var b = s.length
    while (a < b && chars.indexOf(s.charAt(a)) >= 0) a += 1
    while (b > a && chars.indexOf(s.charAt(b - 1)) >= 0) b -= 1
    s.substring(a, b)
  }

  /** Domain part after the first '@'; whole string when no '@'
    * (parse.py:129-134). */
  def getDomain(mail: String): String = {
    val parts = mail.split("@", 2)
    if (parts.length == 2) parts(1) else mail
  }

  /** 3 chars, all digits (parse.py:170-184). */
  def isStatusCode(s: String): Boolean =
    s.length == 3 && s.forall(Character.isDigit)

  /** Dotted digit triple, each part non-empty (parse.py:186-204; Python's
    * `"".isdigit()` is False so `"2..0"` fails there too). */
  def isPostfixStatusCode(s: String): Boolean = {
    val parts = s.split("\\.", -1)
    parts.length == 3 && parts.forall(p => p.nonEmpty && p.forall(Character.isDigit))
  }

  /** Slide a width-2 window over the description tokens; the LAST matching
    * (ddd, d.d.d) pair wins (parse.py:206-215 — the loop keeps overwriting).
    * None when no pair matches (attributes stay unset in the reference). */
  def parseStatusCode(desc: String): (Option[Int], Option[String]) = {
    val toks = LineParser.tokenize(desc)
    var code: Option[Int] = None
    var pcode: Option[String] = None
    var i = 0
    while (i < toks.length - 1) {
      if (isStatusCode(toks(i)) && isPostfixStatusCode(toks(i + 1))) {
        code = Some(toks(i).toInt)
        pcode = Some(toks(i + 1))
      }
      i += 1
    }
    (code, pcode)
  }

  /** k=v extraction over the FULL token list (parse.py:286-308):
    *   - split once on '=', value rstrip(',')
    *   - `to` accumulates, everything else last-write-wins
    *   - remember the index of the `status=` token; when truthy (>0 — the
    *     reference's `if status_idx:` treats index 0 as unset), capture
    *     everything after it, lstrip('(') + rstrip(')').
    */
  def setFields(st: SessionBuf, tokens: Array[String]): SessionBuf = {
    var to = st.to
    var kv = st.kv
    var statusIdx = -1
    var i = 0
    while (i < tokens.length) {
      val token = tokens(i)
      val eq = token.indexOf('=')
      if (eq >= 0) {
        val name = token.substring(0, eq)
        var value = token.substring(eq + 1)
        var e = value.length
        while (e > 0 && value.charAt(e - 1) == ',') e -= 1
        value = value.substring(0, e)
        if (name == "status") statusIdx = i
        if (name == "to") to = to :+ value
        else kv = kv.updated(name, value)
      }
      i += 1
    }
    val desc =
      if (statusIdx > 0)
        Some(stripTrailing(stripLeading(tokens.drop(statusIdx + 1).mkString(" "), '('), ')'))
      else st.statusDescription
    st.copy(to = to, kv = kv, statusDescription = desc)
  }

  private def stripLeading(s: String, c: Char): String = {
    var a = 0
    while (a < s.length && s.charAt(a) == c) a += 1
    s.substring(a)
  }

  private def stripTrailing(s: String, c: Char): String = {
    var b = s.length
    while (b > 0 && s.charAt(b - 1) == c) b -= 1
    s.substring(0, b)
  }

  /** Subject-line guard over payload = tokens[4:] (parse.py:319-323).
    * Python evaluates lazily and raises IndexError if the line ends
    * mid-guard — reproduced. */
  def isSubjectLine(p: Array[String]): Boolean =
    p(0) == "warning:" && {
      if (p.length < 2) throw new PyIndexError("list index out of range: 1")
      p(1) == "header" && {
        if (p.length < 3) throw new PyIndexError("list index out of range: 2")
        p(2) == "Subject:"
      }
    }

  /** Subject extraction (parse.py:324-337). MIME branch: only tokens
    * starting with "=?UTF-8" (case-sensitive) are decoded, and only the
    * first encoded word. ASCII branch: pairwise scan until the
    * ("from", "*;") boundary — a line without the boundary silently drops
    * its final token, exactly like `pairwise` does. */
  def parseSubject(payload: Array[String]): String = {
    if (payload.length < 4)
      throw new PyIndexError("list index out of range: 3")
    val t3 = payload(3)
    if (t3.startsWith("=?UTF-8")) Rfc2047.decodeFirstWord(t3)
    else {
      val toks = payload.drop(3)
      val subj = Vector.newBuilder[String]
      var i = 0
      var done = false
      while (i < toks.length - 1 && !done) {
        if (toks(i) == "from" && toks(i + 1).endsWith(";")) done = true
        else { subj += toks(i); i += 1 }
      }
      subj.result().mkString(" ")
    }
  }

  /** Build the finalized event (PostfixEvent.__init__, parse.py:136-168).
    * Throws NoSuchElementException for missing required keys in the same
    * order Python's dict lookups would raise KeyError. */
  def finalizeEvent(queueId: String, st: SessionBuf): PostfixEvent = {
    def req(key: String): String = st.kv.getOrElse(key,
      throw new PyKeyError(s"KeyError: '$key'"))
    val messageFrom = stripChars(req("from"), "<>")
    // obj["to"] — the key only exists once a to= token accumulated
    if (st.to.isEmpty) throw new PyKeyError("KeyError: 'to'")
    val messageTo = st.to.map(stripChars(_, "<>"))
    val messageId = stripChars(req("message-id"), "<>")
    val status = req("status")
    val desc = st.statusDescription.getOrElse(
      throw new PyKeyError("KeyError: 'status_description'"))
    val (code, pcode) = parseStatusCode(desc)
    PostfixEvent(
      timestamp = TimeUtil.toTimestamp(st.tsMicros),
      queue_id = queueId,
      domain_from = getDomain(messageFrom),
      // Vector.distinct preserves first occurrence = dict.fromkeys order
      // (parse.py:153-155); message_to itself is NOT deduped.
      domains_to = messageTo.map(getDomain).distinct,
      message_from = messageFrom,
      message_to = messageTo,
      message_id = messageId,
      message_subject = st.subject,
      status = status,
      status_code = code,
      status_postfix_code = pcode,
      status_description = desc,
      client = st.kv.get("client"),
      orig_to = st.kv.get("orig_to"),
      dovecot_fileinto_action = st.dovecotFileintoAction,
      delay = st.kv.get("delay"),
      delays = st.kv.get("delays"),
      dsn = st.kv.get("dsn"),
      nrcpt = st.kv.get("nrcpt"),
      relay = st.kv.get("relay"),
      size = st.kv.get("size"),
      raw_log = st.rawLog
    )
  }

  /** One full feed_line step for an already-classified session line
    * (parse.py:406-420). */
  def step(st0: SessionBuf, line: LineParser.SessionLine): StepOut = {
    val tokens = LineParser.tokenize(line.raw)
    var st = st0.copy(rawLog = st0.rawLog :+ line.raw)
    if (st.tsMicros < 0) st = st.copy(tsMicros = line.tsMicros)
    val payload = tokens.drop(4)
    try {
      if (payload(0) == "removed") {
        val msgid = st.kv.get("message-id")
        val ev = finalizeEvent(line.queueId, st)
        StepOut(None, Some(ev), None, msgid)
      } else if (isSubjectLine(payload)) {
        val subj = parseSubject(payload)
        StepOut(Some(st.copy(subject = Some(subj))), None, None, None)
      } else {
        StepOut(Some(setFields(st, tokens)), None, None, None)
      }
    } catch {
      case e: Exception => StepOut(Some(st), None, Some(ParseFault(line.raw, e.toString)), None)
    }
  }

  /** Dovecot enrichment of a live session (parse.py:373-375): applies when
    * the stored (bracketed) message-id equals the sieve line's msgid. */
  def applyDovecot(st: SessionBuf, msgid: String, action: String): SessionBuf =
    if (st.kv.get("message-id").contains(msgid)) st.copy(dovecotFileintoAction = Some(action))
    else st
}
