package graft.operators

import graft.SparkSpec
import graft.core.Fixtures
import org.scalatest.funsuite.AnyFunSuite

/** The reference fixtures through the distributed batch path — proves the
  * shuffle + per-group replay reproduces arrival-order semantics. */
class SessionizeSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def run(input: String): (Seq[graft.core.PostfixEvent], Seq[graft.core.ParseFault]) = {
    import spark.implicits._
    val lines = input.split("\n", -1).toSeq.zipWithIndex.map { case (l, i) => (i.toLong, l) }
    val res = Sessionize(spark, lines.toDS())
    (res.events.collect().toSeq.sortBy(_.timestamp.getTime), res.faults.collect().toSeq)
  }

  test("basic fixture via Spark batch") {
    val (events, faults) = run(Fixtures.basic)
    assert(faults.isEmpty)
    assert(events.size == 1)
    val e = events.head
    assert(e.queue_id == "85C6C10208A")
    assert(e.message_from == "user@localhost")
    assert(e.status_code.contains(250))
    assert(e.status_postfix_code.contains("2.0.0"))
    assert(e.client.contains("mail.localhost[192.168.0.1]"))
    assert(e.raw_log == Fixtures.basicRawLog)
  }

  test("mixed fixture via Spark batch: two interleaved sessions") {
    val input = Fixtures.mixedPart1 + "\n" + Fixtures.mixedSentLine +
      "\n2024-04-09T20:22:43.039628+03:00 localhost postfix/qmgr[837]: 85C6C10208A: removed" +
      "\n" + Fixtures.mixedBouncedLine +
      "\n2024-04-09T20:25:02.570564+03:00 localhost postfix/qmgr[837]: 2D7291020EE: removed"
    val (events, faults) = run(input)
    assert(faults.isEmpty)
    assert(events.size == 2)
    assert(events.map(_.queue_id).toSet == Set("85C6C10208A", "2D7291020EE"))
    val sent = events.find(_.queue_id == "85C6C10208A").get
    assert(sent.status == "sent" && sent.status_code.contains(250))
    val bounced = events.find(_.queue_id == "2D7291020EE").get
    assert(bounced.status == "bounced" && bounced.status_code.contains(550))
    assert(bounced.status_postfix_code.contains("5.1.1"))
    assert(bounced.orig_to.contains("<root>"))  // not angle-stripped (parse.py:162)
  }

  test("dovecot fixture via Spark batch: sieve join enriches the session") {
    val (events, faults) = run(Fixtures.dovecot)
    assert(faults.isEmpty)
    assert(events.size == 1)
    assert(events.head.dovecot_fileinto_action.contains("stored mail into mailbox 'Junk'"))
  }

  test("multiple-to fixture via Spark batch") {
    val (events, faults) = run(Fixtures.multipleTo)
    assert(faults.isEmpty)
    val e = events.head
    assert(e.message_to == Seq("max1@localhost", "max2@localhost"))
    assert(e.domains_to == Seq("localhost"))
    assert(e.message_subject.contains("test2 - Тест2"))
  }

  test("subject fixtures via Spark batch") {
    val (e1, f1) = run(Fixtures.utf8Subject)
    assert(f1.isEmpty && e1.head.message_subject.contains("test - Тест"))
    val (e2, f2) = run(Fixtures.asciiSubject)
    assert(f2.isEmpty && e2.head.message_subject.contains(
      "Cron <root@test3-stack> /usr/bin/sudo -H -u vmail /var/www/postfixadmin/ADDITIONS/fetchmail.pl"))
  }

  test("queue-id reuse emits two events for one key") {
    val input = """
2024-04-09T20:22:42.548478+03:00 h postfix/smtpd[1]: 85C6C10208A: client=c1[1.1.1.1]
2024-04-09T20:22:42.596265+03:00 h postfix/cleanup[2]: 85C6C10208A: message-id=<a@b>
2024-04-09T20:22:42.736487+03:00 h postfix/qmgr[3]: 85C6C10208A: from=<x@y>, size=1, nrcpt=1 (queue active)
2024-04-09T20:22:43.039303+03:00 h postfix/lmtp[4]: 85C6C10208A: to=<u@v>, status=sent (250 2.0.0 ok)
2024-04-09T20:22:43.039628+03:00 h postfix/qmgr[5]: 85C6C10208A: removed
2024-04-09T20:30:00.000000+03:00 h postfix/cleanup[6]: 85C6C10208A: message-id=<c@d>
2024-04-09T20:30:00.100000+03:00 h postfix/qmgr[7]: 85C6C10208A: from=<p@q>, size=2, nrcpt=1 (queue active)
2024-04-09T20:30:00.200000+03:00 h postfix/lmtp[8]: 85C6C10208A: to=<r@s>, status=bounced (550 5.1.1 no)
2024-04-09T20:30:00.300000+03:00 h postfix/qmgr[9]: 85C6C10208A: removed"""
    val (events, faults) = run(input)
    assert(faults.isEmpty)
    assert(events.size == 2)
    assert(events(0).message_id == "a@b" && events(0).status == "sent")
    assert(events(1).message_id == "c@d" && events(1).status == "bounced")
  }

  test("finalize with missing required key faults and keeps state") {
    val input = """
2024-04-09T20:22:42.596265+03:00 h postfix/cleanup[2]: 85C6C10208A: message-id=<a@b>
2024-04-09T20:22:43.039628+03:00 h postfix/qmgr[5]: 85C6C10208A: removed"""
    val (events, faults) = run(input)
    assert(events.isEmpty)
    assert(faults.size == 1)
    assert(faults.head.line.endsWith("removed"))
    assert(faults.head.error.contains("from"))
  }
}
