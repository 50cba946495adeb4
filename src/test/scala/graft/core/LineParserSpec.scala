package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Unit + property tests for the pure parsing primitives (SURVEY.md §2.2). */
class LineParserSpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("queue id predicate (parse.py:237-256)") {
    assert(LineParser.isQueueId("0A3F51021C3:"))
    assert(!LineParser.isQueueId(""))
    assert(!LineParser.isQueueId("0A3F51021C3"))   // no trailing colon
    assert(!LineParser.isQueueId("0a3f51021c3:"))  // lowercase rejected
    assert(!LineParser.isQueueId("0A3F51021C33:")) // 12 hex chars
    assert(!LineParser.isQueueId("0A3F51021CG:"))  // non-hex
  }

  test("status code predicates (parse.py:170-204)") {
    assert(SessionFold.isStatusCode("200"))
    assert(!SessionFold.isStatusCode("2000"))
    assert(!SessionFold.isStatusCode(""))
    assert(!SessionFold.isStatusCode("20a"))
    assert(SessionFold.isPostfixStatusCode("2.0.0"))
    assert(SessionFold.isPostfixStatusCode("2.5.0"))
    assert(SessionFold.isPostfixStatusCode("5.10.12"))
    assert(!SessionFold.isPostfixStatusCode("250"))
    assert(!SessionFold.isPostfixStatusCode("a.a.a"))
    assert(!SessionFold.isPostfixStatusCode("2..0"))
    assert(!SessionFold.isPostfixStatusCode("2.0."))
  }

  test("last status pair wins (parse.py:206-215)") {
    val (c, p) = SessionFold.parseStatusCode("421 4.0.0 retry later 250 2.0.0 done")
    assert(c.contains(250) && p.contains("2.0.0"))
    val (none, _) = SessionFold.parseStatusCode("no codes here")
    assert(none.isEmpty)
    // pair must be adjacent and ordered (ddd then d.d.d)
    val (c2, _) = SessionFold.parseStatusCode("2.0.0 250")
    assert(c2.isEmpty)
  }

  test("ISO timestamp filter (parse.py:396-400)") {
    assert(LineParser.parseIsoMicros("2024-04-09T20:22:42.548478+03:00").isDefined)
    assert(LineParser.parseIsoMicros("2024-04-09T20:22:42Z").isDefined)
    assert(LineParser.parseIsoMicros("2024-04-09T20:22:42").isDefined)
    assert(LineParser.parseIsoMicros("2024-04-09").isDefined)   // fromisoformat accepts dates
    assert(LineParser.parseIsoMicros("Apr").isEmpty)            // syslog month → dropped
    assert(LineParser.parseIsoMicros("30").isEmpty)
  }

  test("domain extraction (parse.py:129-134)") {
    assert(SessionFold.getDomain("a@b.com") == "b.com")
    assert(SessionFold.getDomain("a@b@c") == "b@c")   // split once
    assert(SessionFold.getDomain("nodomain") == "nodomain")
    assert(SessionFold.getDomain("@x") == "x")
    assert(SessionFold.getDomain("x@") == "")
  }

  test("python strip semantics") {
    assert(SessionFold.stripChars("<a@b>", "<>") == "a@b")
    assert(SessionFold.stripChars("<<a>>", "<>") == "a")
    assert(SessionFold.stripChars("a<b", "<>") == "a<b")
    assert(SessionFold.stripChars("<>", "<>") == "")
  }

  test("RFC 2047 decode (parse.py:324-326)") {
    assert(Rfc2047.decodeFirstWord("=?UTF-8?B?dGVzdCAtINCi0LXRgdGC?=") == "test - Тест")
    assert(Rfc2047.decodeFirstWord("=?UTF-8?Q?hello_world?=") == "hello world")
    assert(Rfc2047.decodeFirstWord("=?UTF-8?Q?caf=C3=A9?=") == "café")
    // only the FIRST encoded word (decode_header(...)[0])
    assert(Rfc2047.decodeFirstWord("=?UTF-8?B?YQ==?==?UTF-8?B?Yg==?=") == "a")
    intercept[Exception](Rfc2047.decodeFirstWord("=?UTF-8garbage"))
  }

  test("k=v extraction: to accumulates, others last-write-wins, comma trim") {
    var st = SessionBuf.empty
    st = SessionFold.setFields(st, Array("ts", "host", "prog:", "QID:", "to=<a@x>,", "size=1,"))
    st = SessionFold.setFields(st, Array("ts", "host", "prog:", "QID:", "to=<b@y>,", "size=2"))
    assert(st.to == Vector("<a@x>", "<b@y>"))
    assert(st.kv("size") == "2")
  }

  test("status_description capture with paren strip (parse.py:305-308)") {
    val st = SessionFold.setFields(SessionBuf.empty,
      LineParser.tokenize("ts h p: Q: to=<a>, status=bounced (host said: 550 5.1.1 no (in reply to RCPT TO command))"))
    assert(st.statusDescription.contains("host said: 550 5.1.1 no (in reply to RCPT TO command"))
    assert(st.kv("status") == "bounced")
  }

  test("noise lines classify to nothing") {
    assert(LineParser.classify("").isEmpty)
    assert(LineParser.classify("short line").isEmpty)
    assert(LineParser.classify(
      "2024-04-09T20:22:42.736796+03:00 localhost postfix/smtpd[1]: disconnect from x[1.2.3.4] a=1 b=2").isEmpty)
    assert(LineParser.classify(
      "2024-04-09T20:25:02.134775+03:00 localhost fetchmail-all[2182112]: Please create: /var/lock/fetchmail").isEmpty)
  }

  test("property: tokenizePrefix(s, k) equals tokenize(s).take(k)") {
    // classify's bounded scan must agree with the full tokenizer on every
    // whitespace mix, including the Python-isspace NBSP family
    val wsChars = Seq(' ', '\t', '\n', '\u00a0', '\u2007', '\u202f')
    val piece = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.oneOf(wsChars).map(_.toString),
      Gen.const("a=b,"), Gen.const("Info:"))
    val strGen = Gen.listOf(piece).map(_.mkString)
    val kGen = Gen.choose(0, 12)
    checkProp(Prop.forAll(strGen, kGen) { (s: String, k: Int) =>
      LineParser.tokenizePrefix(s, k).toSeq == LineParser.tokenize(s).take(k).toSeq
    })
  }

  test("property: any name=value, token round-trips through setFields") {
    val name = Gen.alphaStr.suchThat(s => s.nonEmpty && s != "to" && s != "status")
    val value = Gen.alphaNumStr.suchThat(_.nonEmpty)
    checkProp(Prop.forAll(name, value) { (n: String, v: String) =>
      val st = SessionFold.setFields(SessionBuf.empty, Array("ts", "h", "p:", "Q:", s"$n=$v,"))
      st.kv(n) == v
    })
  }

  /** parseIsoMicros vs the ACTUAL CPython 3.11 interpreter: the table is
    * every template + seeded-mutation token from
    * scripts/gen_pyiso_table.py with fromisoformat's verdict (epoch
    * micros, naive→UTC; null = raised). Full-surface parity: week dates,
    * basic forms, arbitrary separators, comma fractions, offset grammar,
    * range validation. */
  test("fromisoformat parity table (1430 interpreter-generated tokens)") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/pyiso_table.json"), "UTF-8")
    val json = try src.mkString finally src.close()
    val entry = """\["((?:[^"\\]|\\.)*)",\s*(-?\d+|null)\]""".r
    val rows = entry.findAllMatchIn(json).map { m =>
      (m.group(1), Option(m.group(2)).filter(_ != "null").map(_.toLong))
    }.toVector
    assert(rows.length > 1400, s"table parse found only ${rows.length} rows")
    val bad = rows.filter { case (tok, exp) => LineParser.parseIsoMicros(tok) != exp }
    assert(bad.isEmpty, s"${bad.length} divergences, first 10: " +
      bad.take(10).map { case (t, e) =>
        s"'$t' python=$e graft=${LineParser.parseIsoMicros(t)}" }.mkString("; "))
  }

  test("property: domains_to dedup preserves first-occurrence order") {
    val mailsGen = Gen.listOf(Gen.oneOf("a", "b", "c", "d").map(d => s"u@$d"))
    checkProp(Prop.forAll(mailsGen) { (mails: List[String]) =>
      val deduped = mails.map(SessionFold.getDomain).distinct
      val seen = scala.collection.mutable.LinkedHashSet[String]()
      mails.foreach(m => seen += SessionFold.getDomain(m))
      deduped == seen.toList
    })
  }
}
