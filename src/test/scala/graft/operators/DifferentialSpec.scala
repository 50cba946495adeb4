package graft.operators

import graft.SparkSpec
import graft.core.{IncrementalSessionizer, ParseFault, PostfixEvent}
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer
import scala.util.Random

/** Differential test: randomized session streams (every quirk the
  * reference exercises — missing required fields, multi-recipient,
  * queue-id reuse, both subject encodings, dovecot lines, noise,
  * malformed guards) through the single-node incremental path and the
  * distributed batch path must produce identical events and fault
  * counts. The incremental path is the executable spec (it mirrors
  * feed_line statement-for-statement), so agreement pins the batch
  * operator's shuffle/ordering semantics. */
class DifferentialSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  def genLog(seed: Long, nSessions: Int): Seq[String] = {
    val rnd = new Random(seed)
    val lines = ArrayBuffer[(Double, String)]()  // (sortTime, line)
    var t = 1700000000.0
    for (i <- 0 until nSessions) {
      // ~25% queue-id reuse
      val qid = f"${if (rnd.nextInt(4) == 0 && i > 4) i - 4 else i}%011X"
      t += rnd.nextDouble() * 2
      val base = t
      def iso(off: Double) = {
        val inst = java.time.Instant.ofEpochMilli(((base + off) * 1000).toLong)
        java.time.OffsetDateTime.ofInstant(inst, java.time.ZoneOffset.ofHours(3))
          .format(java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME)
      }
      val msgid = s"<m$i@ex.com>"
      lines += ((base, s"${iso(0)} h postfix/smtpd[1]: $qid: client=c$i[1.2.3.$i]"))
      if (rnd.nextInt(10) != 0)  // 10% missing message-id → fault
        lines += ((base + 0.1, s"${iso(0.1)} h postfix/cleanup[2]: $qid: message-id=$msgid"))
      if (rnd.nextInt(10) != 0)  // 10% missing from → fault
        lines += ((base + 0.2, s"${iso(0.2)} h postfix/qmgr[3]: $qid: from=<u$i@d${i % 5}.ex>, size=$i, nrcpt=1 (queue active)"))
      val nTo = 1 + rnd.nextInt(3)
      for (j <- 0 until nTo)
        lines += ((base + 0.3 + j * 0.01,
          s"${iso(0.3 + j * 0.01)} h postfix/lmtp[4]: $qid: to=<r$j@d${j % 2}.ex>, relay=rl$j, delay=0.$j, dsn=2.0.0, status=sent (250 2.0.$j <r$j@d${j % 2}.ex> ok)"))
      rnd.nextInt(4) match {
        case 0 => lines += ((base + 0.4,
          s"${iso(0.4)} h postfix/cleanup[2]: $qid: warning: header Subject: =?UTF-8?B?${java.util.Base64.getEncoder.encodeToString(s"Тема $i".getBytes("UTF-8"))}?= from x.ex[1.1.1.1]; from=<a@b> to=<c@d>"))
        case 1 => lines += ((base + 0.4,
          s"${iso(0.4)} h postfix/cleanup[2]: $qid: warning: header Subject: plain subject $i from local; from=<a@b> to=<c@d>"))
        case 2 => lines += ((base + 0.4,
          s"${iso(0.4)} h postfix/cleanup[2]: $qid: warning: header Subject:"))  // truncated → fault
        case _ => ()
      }
      if (rnd.nextInt(3) == 0)
        lines += ((base + 0.45,
          s"Apr 30 15:09:27 lmtp(x)<1><Y>: Info: sieve: msgid=$msgid: fileinto action: stored into 'Box$i'"))
      // combined dovecot + message-id-CHANGING session line: the dovecot
      // branch must act against the PRE-line msgid (whose validity
      // interval closes at exactly this line's seq — inclusive-toSeq
      // boundary), and any LATER dovecot line for the old msgid must NOT
      // apply
      if (rnd.nextInt(4) == 0)
        lines += ((base + 0.25,
          s"${iso(0.25)} h lmtp(x)[9]: $qid: Info: sieve: msgid=$msgid: fileinto action: stored into 'Combo$i' message-id=<chg$i@ex.com>"))
      if (rnd.nextInt(5) == 0)
        lines += ((base + 0.05, s"${iso(0.05)} h postfix/smtpd[1]: disconnect from c$i[1.2.3.$i] ehlo=1 quit=1"))
      lines += ((base + 0.5, s"${iso(0.5)} h postfix/qmgr[5]: $qid: removed"))
    }
    lines.sortBy(_._1).map(_._2).toSeq
  }

  def key(e: PostfixEvent) =
    (e.queue_id, e.message_id, e.timestamp.getTime, e.message_to, e.message_subject,
      e.status_code, e.dovecot_fileinto_action, e.client, e.raw_log)

  /** Adversarial dovecot arrival mix for the A4 differential: sieve
    * lines BEFORE a session's msgid exists, AFTER its removal, for
    * msgids with NO session at all, msgids SHARED across up to three
    * concurrently-live sessions (the reference's live-scan applies one
    * sieve line to every matching live session — the interval join must
    * reproduce the fan-out), repeated sieve lines on one msgid (last
    * wins), and combined dovecot+msgid-CHANGE lines (the inclusive-toSeq
    * boundary). One total line order; every mode must agree on it. */
  def genDovecotStress(seed: Long, nSessions: Int): Seq[String] = {
    val rnd = new Random(seed)
    val lines = ArrayBuffer[(Double, String)]()
    var t = 1700000000.0
    def iso(at: Double) = {
      val inst = java.time.Instant.ofEpochMilli((at * 1000).toLong)
      java.time.OffsetDateTime.ofInstant(inst, java.time.ZoneOffset.ofHours(3))
        .format(java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME)
    }
    def sieve(msgid: String, box: String) =
      s"Apr 30 15:09:27 lmtp(x)<1><Y>: Info: sieve: msgid=$msgid: fileinto action: stored into '$box'"
    for (i <- 0 until nSessions) {
      val qid = f"$i%011X"
      // overlap window: short gaps keep up to ~3 same-msgid sessions live
      t += 0.05 + rnd.nextDouble() * 0.3
      val base = t
      // msgid shared across a rolling window of 3 sessions
      val msgid = s"<shared${i / 3}@ex.com>"
      lines += ((base, s"${iso(base)} h postfix/smtpd[1]: $qid: client=c$i[1.2.3.4]"))
      // sieve BEFORE this session's msgid is set (may legally enrich an
      // EARLIER live session of the same shared-msgid group)
      if (rnd.nextInt(3) == 0)
        lines += ((base + 0.05, sieve(msgid, s"Early$i")))
      lines += ((base + 0.1, s"${iso(base + 0.1)} h postfix/cleanup[2]: $qid: message-id=$msgid"))
      lines += ((base + 0.2, s"${iso(base + 0.2)} h postfix/qmgr[3]: $qid: from=<u$i@ex.dom>, size=$i, nrcpt=1 (queue active)"))
      // sieve DURING the live window: 0-2 lines, last one wins
      for (j <- 0 until rnd.nextInt(3))
        lines += ((base + 0.25 + j * 0.01, sieve(msgid, s"During${i}_$j")))
      // sieve for a msgid that never belongs to ANY session
      if (rnd.nextInt(4) == 0)
        lines += ((base + 0.27, sieve(s"<ghost$i@ex.com>", s"Ghost$i")))
      lines += ((base + 0.3, s"${iso(base + 0.3)} h postfix/lmtp[4]: $qid: to=<r$i@ex.dom>, relay=rl, delay=0.1, dsn=2.0.0, status=sent (250 ok)"))
      // combined dovecot + msgid-CHANGE line: acts on the PRE-line msgid
      if (rnd.nextInt(4) == 0)
        lines += ((base + 0.35,
          s"${iso(base + 0.35)} h lmtp(x)[9]: $qid: Info: sieve: msgid=$msgid: fileinto action: stored into 'Combo$i' message-id=<chg$i@ex.com>"))
      lines += ((base + 0.4, s"${iso(base + 0.4)} h postfix/qmgr[5]: $qid: removed"))
      // sieve AFTER removal (may still enrich a LATER live session of the
      // same group — never this one)
      if (rnd.nextInt(3) == 0)
        lines += ((base + 0.45, sieve(msgid, s"Late$i")))
    }
    lines.sortBy(_._1).map(_._2).toSeq
  }

  test("incremental and batch agree on adversarial dovecot streams") {
    import spark.implicits._
    var enriched = 0
    for (seed <- 1 to 20) {
      val log = genDovecotStress(seed, 36)
      val incEvents = ArrayBuffer[PostfixEvent]()
      val incFaults = ArrayBuffer[ParseFault]()
      val inc = new IncrementalSessionizer(incEvents += _, incFaults += _)
      log.foreach(inc.feedLine)

      val res = Sessionize(spark,
        log.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDS())
      val batchEvents = res.events.collect()
      assert(batchEvents.length == incEvents.length, s"seed=$seed event count")
      assert(res.faults.count() == incFaults.length.toLong, s"seed=$seed fault count")
      assert(batchEvents.map(key).sortBy(_.toString()).toSeq ==
        incEvents.map(key).sortBy(_.toString()).toSeq, s"seed=$seed event content")
      enriched += batchEvents.count(_.dovecot_fileinto_action.isDefined)
    }
    // non-vacuity: the adversarial mix must actually exercise enrichment
    assert(enriched > 0, "no event was dovecot-enriched across all seeds")
  }

  test("fromTextFiles multi-file rotation replay matches cat-order incremental") {
    // The reference's primary usage is `cat /var/log/mail.log* | parse.py`
    // (parse.py:515-516): lines arrive in lexicographic-filename order,
    // files concatenated. Split a generated log across 3 rotation files at
    // arbitrary mid-session boundaries, then verify the distributed read
    // (per-file byte-offset seqs; files read as multiple splits that Spark
    // may pack in any order) is field-identical to the single-node
    // incremental path fed the exact `cat` concatenation.
    val log = genLog(seed = 99, nSessions = 60)
    val dir = java.nio.file.Files.createTempDirectory("graft-rotation").toFile
    try {
      val cuts = Seq(0, log.length / 3 + 1, 2 * log.length / 3 - 1, log.length)
      for (i <- 0 until 3) {
        val f = new java.io.File(dir, s"mail.log.$i")
        val w = new java.io.PrintWriter(f, "UTF-8")
        log.slice(cuts(i), cuts(i + 1)).foreach(w.println)
        w.close()
      }
      // hidden/metadata droppings must be ignored (Hadoop convention)
      java.nio.file.Files.writeString(new java.io.File(dir, "_SUCCESS").toPath, "")
      java.nio.file.Files.writeString(new java.io.File(dir, ".mail.log.swp").toPath,
        log.head + "\n")

      val incEvents = ArrayBuffer[PostfixEvent]()
      val incFaults = ArrayBuffer[ParseFault]()
      val inc = new IncrementalSessionizer(incEvents += _, incFaults += _)
      log.foreach(inc.feedLine)  // cat order == lexicographic file order here

      val res = Sessionize.fromTextFiles(spark, s"${dir.getAbsolutePath}/mail.log*")
      val batchEvents = res.events.collect()
      assert(batchEvents.length == incEvents.length, "event count")
      assert(res.faults.count() == incFaults.length.toLong, "fault count")
      assert(batchEvents.map(key).sortBy(_.toString()).toSeq ==
        incEvents.map(key).sortBy(_.toString()).toSeq, "event content")

      // directory form resolves to the same file set
      val resDir = Sessionize.fromTextFiles(spark, dir.getAbsolutePath)
      assert(resDir.events.count() == incEvents.length.toLong, "dir-form event count")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("incremental and batch agree on 30 random streams") {
    import spark.implicits._
    for (seed <- 1 to 30) {
      val log = genLog(seed, 40)
      val incEvents = ArrayBuffer[PostfixEvent]()
      val incFaults = ArrayBuffer[ParseFault]()
      val inc = new IncrementalSessionizer(incEvents += _, incFaults += _)
      log.foreach(inc.feedLine)

      val res = Sessionize(spark,
        log.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDS())
      val batchEvents = res.events.collect()
      val batchFaults = res.faults.count()

      assert(batchEvents.length == incEvents.length, s"seed=$seed event count")
      assert(batchFaults == incFaults.length, s"seed=$seed fault count")
      assert(batchEvents.map(key).sortBy(_.toString()).toSeq ==
        incEvents.map(key).sortBy(_.toString()).toSeq, s"seed=$seed event content")
    }
  }
}
