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
  *   2. ONE hash exchange on `queue_id` + Tungsten sort within partitions
  *      + streaming run fold ([[foldRuns]], secondary-sort pattern).
  *      Sessions are individual mail deliveries — a handful of lines
  *      each — and queue ids are uniformly random 11-hex-char strings, so
  *      the exchange cannot skew.
  *   3. dovecot enrichment as an equi-join on message-id validity
  *      intervals (replaces the reference's O(state) nested scan per
  *      sieve line, parse.py:373-375, with a hash join; AQE picks
  *      broadcast when the sieve side is small).
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

  /** Fold output: exactly one of event/fault is set. `emitSeq` (seq of
    * the emitting line) is a unique row key; `intervals` are the emitted
    * session's message-id validity windows for the dovecot join. */
  case class FoldOut(event: Option[PostfixEvent], fault: Option[ParseFault],
                     emitSeq: Long, intervals: Seq[MsgidInterval])

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

  /** Streaming fold over a partition pre-sorted by (queueId, seq) —
    * secondary-sort pattern: detects key runs and folds each session line
    * as it streams past, O(1) memory beyond one in-flight SessionBuf.
    * Chosen over `groupByKey.flatMapGroups` because the typed-key path
    * deserializes and re-serializes every row around the exchange
    * (measured ~3× slower end-to-end); here the exchange stays in Tungsten
    * rows and each row is decoded exactly once.
    *
    * Alongside the session buffer it maintains the message-id validity
    * intervals ([[MsgidInterval]]): an interval opens when a line sets a
    * new `message-id=` value and closes when the value changes or the
    * session finalizes. Intervals survive failed finalizes (the reference
    * keeps state on KeyError, parse.py:352-353). */
  def foldRuns(rows: Iterator[ClassifiedRow]): Iterator[FoldOut] = new Iterator[FoldOut] {
    private val in = rows.buffered
    private var st = SessionBuf.empty
    private var qid: String = null
    private var pending: Iterator[FoldOut] = Iterator.empty
    private var closed = List.empty[MsgidInterval]
    private var curMsgid: String = null
    private var curFrom = 0L

    private def advance(): Unit = {
      while (!pending.hasNext && in.hasNext) {
        val row = in.next()
        if (row.queueId != qid) {
          qid = row.queueId; st = SessionBuf.empty
          closed = Nil; curMsgid = null
        }
        val res = SessionFold.step(st, LineParser.SessionLine(qid, row.tsMicros, row.raw))
        st = res.state.getOrElse(SessionBuf.empty)
        res.state.foreach { b =>
          val m = b.kv.getOrElse("message-id", null)
          if (m != curMsgid) {
            if (curMsgid != null) closed ::= MsgidInterval(curMsgid, curFrom, row.seq)
            curMsgid = m
            curFrom = row.seq
          }
        }
        if (res.event.isDefined) {
          val all = (if (curMsgid != null) MsgidInterval(curMsgid, curFrom, row.seq) :: closed
                     else closed).reverse
          pending = Iterator.single(FoldOut(res.event, None, row.seq, all))
          closed = Nil; curMsgid = null
        } else res.fault.foreach { f =>
          pending = Iterator.single(FoldOut(None, Some(f), row.seq, Nil))
        }
      }
    }
    override def hasNext: Boolean = { advance(); pending.hasNext }
    override def next(): FoldOut = { advance(); pending.next() }
  }

  /** @param persistIntermediate cache the classified + folded datasets so
    *        consuming BOTH events and faults (or several projections of
    *        one) costs a single parse/shuffle pass. Off by default — a
    *        library caller owning exactly one downstream action shouldn't
    *        pay the cache. */
  def apply(spark: SparkSession, lines: Dataset[(Long, String)],
            persistIntermediate: Boolean = false): Result = {
    import spark.implicits._
    val classified0 = classify(spark, lines)
    val classified = if (persistIntermediate) classified0.persist() else classified0

    // Everything below the fold is COLUMNAR (where/select, no typed
    // lambdas): a lambda filter would deserialize every cached row, while
    // column predicates let Catalyst prune columns straight out of the
    // (columnar) cache / shuffle files.
    val folded0 = classified
      .where($"kind" === 0)
      .repartition($"queueId")
      .sortWithinPartitions($"queueId", $"seq")
      .as[ClassifiedRow]
      .mapPartitions(foldRuns _)
    val folded = if (persistIntermediate) folded0.persist() else folded0

    // Dovecot enrichment with the reference's live-scan semantics
    // (parse.py:373-375): an action applies iff its arrival seq falls
    // inside an interval when its msgid was the session's current value;
    // the LAST matching action wins (the reference keeps overwriting).
    val doveActs = classified.where($"kind" === 1)
      .select($"msgid".as("d_msgid"), $"seq".as("d_seq"), $"action")

    // ONE consumption of the fold chain: the event struct rides through
    // the interval explode and the (left) dovecot join, and the final
    // aggregation keys on the long emitSeq (never hash-grouping the wide
    // struct). Resolving matches on a slim (emitSeq, interval) projection
    // and joining back would read `folded` twice — and re-executing the
    // classify+shuffle+fold chain (or caching its wide rows) measures
    // 2-3× more expensive than carrying the event through this one extra
    // exchange of event-count rows; at cluster scale the re-read is all
    // raw lines vs an exchange of ~lines/8 event rows.
    val events = folded
      .where($"event".isNotNull)
      .select($"event", $"emitSeq", explode_outer($"intervals").as("iv"))
      // Bounds: strict at fromSeq (a line that SETS the msgid and is also
      // dovecot-shaped applies its action before the set — reference runs
      // the dovecot branch before _set_fields, parse.py:378,393-394), but
      // INCLUSIVE at toSeq: that same branch ordering means a combined
      // dovecot + message-id-CHANGING line acts against the pre-line
      // msgid, whose interval closes at exactly that line's seq. Equal
      // seqs only arise from one physical line, so <= is safe.
      // explode_outer + left join keep interval-less / unmatched events.
      .join(doveActs, $"iv.msgid" === $"d_msgid" &&
        $"d_seq" > $"iv.fromSeq" && $"d_seq" <= $"iv.toSeq", "left_outer")
      .groupBy($"emitSeq")
      // all exploded copies of an event are identical → first() is
      // deterministic; max_by skips null-ordering rows, so unmatched
      // (null d_seq) rows only contribute when nothing matched → null
      .agg(first($"event").as("event"),
        max_by($"action", $"d_seq").as("dovecot_action"))
      .select($"event".withField("dovecot_fileinto_action",
        coalesce($"dovecot_action", $"event.dovecot_fileinto_action")).as("event"))
      .select("event.*")
      .as[PostfixEvent]

    val faults = classified.where($"kind" === 2)
      .select($"raw".as("line"), $"error").as[ParseFault]
      .unionAll(folded.where($"fault".isNotNull)
        .select($"fault.line".as("line"), $"fault.error".as("error")).as[ParseFault])

    Result(events, faults)
  }

  /** Convenience: read text files (one line per row) and sessionize in
    * `cat`-order — matching the reference's `cat /var/log/mail.log* |
    * parse.py` contract (README.md:4, parse.py:515-516). */
  def fromTextFiles(spark: SparkSession, paths: String*): Result =
    apply(spark, catOrderedLines(spark, paths: _*))

  /** Maximum in-file byte offset: 44 bits → 16 TiB per file, 2^19 files. */
  private val OffsetBits = 44

  /** Lines of `paths` (files, globs, or directories) stamped with seq
    * numbers order-isomorphic to `cat $(ls <paths>)`:
    *
    *   seq = (lexicographic file rank << 44) | in-file byte offset
    *
    * Shell globs sort matches lexicographically, so ranking the resolved
    * file list the same way reproduces the reference's rotation-replay
    * order. The in-file component is the record's byte offset from
    * `TextInputFormat` — a property of the FILE, not of Spark's split
    * packing — so the stamping is deterministic and correct even when a
    * file is read as many splits in any order (Spark packs splits by size
    * descending, so a plain `zipWithIndex` over the scan numbers lines in
    * an order that can contradict `cat`). Also avoids `zipWithIndex`'s
    * extra partition-count job: this is a single narrow pass. */
  def catOrderedLines(spark: SparkSession, paths: String*): Dataset[(Long, String)] = {
    import spark.implicits._
    import org.apache.hadoop.fs.{FileStatus, Path}
    import org.apache.hadoop.io.{LongWritable, Text}
    import org.apache.hadoop.mapred.TextInputFormat

    val sc = spark.sparkContext
    val conf = sc.hadoopConfiguration
    // Hadoop's hidden-file convention (the filter spark.read.textFile
    // applies): _SUCCESS markers, .swp/._* droppings must not parse as
    // log lines. Applied to directory listings and glob EXPANSION only —
    // a file the caller named exactly is read regardless (cat would).
    def visible(st: FileStatus): Boolean = {
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    val files: Seq[String] = paths.flatMap { p =>
      val isGlob = p.exists("{}[]*?".contains(_))
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      val matched = Option(fs.globStatus(hp)).getOrElse(Array.empty[FileStatus])
      matched.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).filter(s => s.isFile && visible(s))
        else if (!isGlob || visible(st)) Array(st)
        else Array.empty[FileStatus]
      }.map(_.getPath.toUri.toString)
    }.distinct.sorted
    require(files.nonEmpty, s"no input files matched: ${paths.mkString(",")}")
    require(files.size < (1 << (63 - OffsetBits)),
      s"too many input files for 44-bit offset seqs: ${files.size}")

    val maxOff = 1L << OffsetBits
    val rdds = files.zipWithIndex.map { case (path, rank) =>
      val base = rank.toLong << OffsetBits
      sc.hadoopFile(path, classOf[TextInputFormat], classOf[LongWritable], classOf[Text])
        .map { case (off, text) =>
          val o = off.get
          require(o < maxOff, s"file exceeds 16 TiB offset budget: $path")
          (base | o, new String(text.getBytes, 0, text.getLength, java.nio.charset.StandardCharsets.UTF_8))
        }
    }
    sc.union(rdds.toSeq).toDS()
  }
}
