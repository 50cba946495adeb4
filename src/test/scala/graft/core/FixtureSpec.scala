package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** Port of the reference's end-to-end fixture tests
  * (lognormalizer/parse_test.py) against the single-node incremental mode
  * — same inputs, same asserts. The Spark batch path is covered by
  * [[graft.operators.SessionizeSpec]] over the same fixtures. */
class FixtureSpec extends AnyFunSuite {

  class Harness {
    val events = ArrayBuffer[PostfixEvent]()
    val faults = ArrayBuffer[ParseFault]()
    var clock: Long = 1700000000L * 1000000L
    val parser = new IncrementalSessionizer(events += _, faults += _, () => clock)
    def feed(input: String): Unit = input.split("\n", -1).foreach(parser.feedLine)
  }

  // parse_test.py:26-60
  test("basic") {
    val h = new Harness
    h.feed(Fixtures.basic)
    assert(h.faults.isEmpty)
    assert(h.events.size == 1)
    val e = h.events.head
    assert(e.queue_id == "85C6C10208A")
    assert(e.message_from == "user@localhost")
    assert(e.message_to == Seq("user@localhost"))
    assert(e.message_id == "214b89-66157980-3-dc1e520@120925011")
    assert(e.status == "sent")
    assert(e.status_code.contains(250))
    assert(e.status_postfix_code.contains("2.0.0"))
    assert(e.status_description ==
      "250 2.0.0 <user@localhost> VB7QLWJ5FWbMSyEA0J78UA Saved")
    assert(e.client.contains("mail.localhost[192.168.0.1]"))
    assert(e.raw_log == Fixtures.basicRawLog)
    // first-seen timestamp: 2024-04-09T20:22:42.548478+03:00
    assert(TimeUtil.toMicros(e.timestamp.toInstant) ==
      LineParser.parseIsoMicros("2024-04-09T20:22:42.548478+03:00").get)
  }

  // parse_test.py:63-98 — TTL eviction with a manipulated clock
  test("cleanup") {
    val h = new Harness
    h.feed(Fixtures.cleanupInput)
    assert(h.faults.isEmpty)
    assert(h.events.isEmpty)
    assert(h.parser.state.size == 1)
    assert(h.parser.state.contains("85C6C10208A"))

    // fresh timestamp + due cleanup → survives
    h.parser.state.update("85C6C10208A",
      h.parser.state("85C6C10208A").copy(tsMicros = h.clock))
    h.parser.nextCleanupMicros = h.clock
    h.parser.feedLine("LINE")
    assert(h.faults.isEmpty && h.events.isEmpty)
    assert(h.parser.state.size == 1)

    // 1-day-old timestamp + due cleanup → evicted silently
    h.parser.state.update("85C6C10208A",
      h.parser.state("85C6C10208A").copy(tsMicros = h.clock - 86400L * 1000000L))
    h.parser.nextCleanupMicros = h.clock
    h.parser.feedLine("LINE")
    assert(h.faults.isEmpty)
    assert(h.parser.state.isEmpty)
  }

  // parse_test.py:101-160
  test("mixed") {
    val h = new Harness
    h.feed(Fixtures.mixedPart1)
    assert(h.faults.isEmpty && h.events.isEmpty)
    assert(h.parser.state.size == 2)

    h.parser.feedLine(Fixtures.mixedSentLine)
    h.parser.feedLine(
      "2024-04-09T20:22:43.039628+03:00 localhost postfix/qmgr[837]: 85C6C10208A: removed")
    assert(h.faults.isEmpty)
    assert(h.events.size == 1 && h.parser.state.size == 1)
    val e = h.events.head
    assert(e.message_from == "user@localhost")
    assert(e.message_to == Seq("user@localhost"))
    assert(e.message_id == "214b89-66157980-3-dc1e520@120925011")
    assert(e.status == "sent")
    assert(e.status_code.contains(250))
    assert(e.status_postfix_code.contains("2.0.0"))
    assert(e.status_description == "250 2.0.0 <user@localhost> VB7QLWJ5FWbMSyEA0J78UA Saved")
    assert(e.client.contains("mail.localhost[192.168.0.1]"))

    h.parser.feedLine(Fixtures.mixedBouncedLine)
    h.parser.feedLine(
      "2024-04-09T20:25:02.570564+03:00 localhost postfix/qmgr[837]: 2D7291020EE: removed")
    assert(h.faults.isEmpty)
    assert(h.events.size == 2 && h.parser.state.isEmpty)
    val b = h.events(1)
    assert(b.message_from == "root@localhost")
    assert(b.message_to == Seq("root@localhost"))
    assert(b.message_id == "20240409172502.2D7291020EE@mail.localhost")
    assert(b.status == "bounced")
    assert(b.status_code.contains(550))
    assert(b.status_postfix_code.contains("5.1.1"))
    // orig_to is NOT angle-stripped in the reference (parse.py:162)
    assert(b.orig_to.contains("<root>"))
  }

  // parse_test.py:163-193
  test("parse subject (RFC 2047 UTF-8 base64)") {
    val h = new Harness
    h.feed(Fixtures.utf8Subject)
    assert(h.faults.isEmpty)
    assert(h.events.size == 1)
    val e = h.events.head
    assert(e.message_from == "example@gmail.com")
    assert(e.message_to == Seq("max1@localhost"))
    assert(e.message_id == "c6817a87-5fd4-4702-a784-ad400bbd9641@gmail.com")
    assert(e.message_subject.contains("test - Тест"))
    assert(e.status == "sent")
    assert(e.status_code.contains(250))
    assert(e.status_postfix_code.contains("2.0.0"))
    assert(e.status_description == "250 2.0.0 <max1@localhost> 8lAxMB8DPmZAegEA0J78UA Saved")
  }

  // parse_test.py:196-220
  test("parse ascii subject") {
    val h = new Harness
    h.feed(Fixtures.asciiSubject)
    assert(h.faults.isEmpty)
    assert(h.events.size == 1)
    val e = h.events.head
    assert(e.message_from == "root@localhost")
    assert(e.message_to == Seq("root@localhost"))
    assert(e.message_subject.contains(
      "Cron <root@test3-stack> /usr/bin/sudo -H -u vmail /var/www/postfixadmin/ADDITIONS/fetchmail.pl"))
    assert(e.status_code.contains(550))
    // nested parens: only trailing ')' chars stripped, interior kept
    assert(e.status_description.endsWith("(in reply to RCPT TO command"))
  }

  // parse_test.py:223-248
  test("dovecot integration") {
    val h = new Harness
    h.feed(Fixtures.dovecot)
    assert(h.faults.isEmpty)
    assert(h.events.size == 1)
    val e = h.events.head
    assert(e.message_from == "mishin@vrufa.ru")
    assert(e.message_to == Seq("admin@localhost"))
    assert(e.message_id == "2cd16c8571abc90a2986ef44b051ebe1d44c9c29@vrufa.ru")
    assert(e.status == "sent")
    assert(e.dovecot_fileinto_action.contains("stored mail into mailbox 'Junk'"))
  }

  // parse_test.py:251-276
  test("multiple to") {
    val h = new Harness
    h.feed(Fixtures.multipleTo)
    assert(h.faults.isEmpty)
    assert(h.events.size == 1)
    val e = h.events.head
    assert(e.message_from == "example@gmail.com")
    assert(e.message_subject.contains("test2 - Тест2"))
    assert(e.domain_from == "gmail.com")
    assert(e.domains_to == Seq("localhost"))
    assert(e.message_to == Seq("max1@localhost", "max2@localhost"))
  }
}
