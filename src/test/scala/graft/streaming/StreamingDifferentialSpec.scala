package graft.streaming

import graft.SparkSpec
import graft.core.{IncrementalSessionizer, ParseFault, PostfixEvent}
import graft.operators.DifferentialSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer
import scala.util.Random

/** Tri-modal differential: the same randomized session streams as
  * [[graft.operators.DifferentialSpec]], fed to the STREAMING pipeline in
  * randomly-sized micro-batches, must agree with the single-node
  * incremental spec — pinning cross-batch state, emission, and the
  * interval-based dovecot join under arbitrary batch boundaries. */
class StreamingDifferentialSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  private val gen = new DifferentialSpec

  test("incremental and streaming agree on random streams with random batching") {
    runSeeds(spark, 1 to 6)
  }

  test("differential holds under the RocksDB state store") {
    runSeeds(StreamingSessionize.withRocksDbStateStore(spark), 7 to 8)
  }

  test("adversarial dovecot streams agree across incremental and streaming") {
    // the A4 stress mix (sieve before/after/without sessions, shared
    // msgids across live sessions, repeated + combined lines) under
    // random micro-batch boundaries — locks the enrichment timing the
    // in-order streaming path shares with the reference's live scan
    runSeeds(spark, 9 to 12,
      s => gen.genDovecotStress(s * 313, 30))
  }

  private def runSeeds(spark: org.apache.spark.sql.SparkSession,
                       seeds: Range,
                       mkLog: Int => Seq[String] = s => gen.genLog(s * 101, 30))
      : Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    for (seed <- seeds) {
      val log = mkLog(seed)
      val incEvents = ArrayBuffer[PostfixEvent]()
      val incFaults = ArrayBuffer[ParseFault]()
      val inc = new IncrementalSessionizer(incEvents += _, incFaults += _)
      log.foreach(inc.feedLine)

      val mem = MemoryStream[(Long, String)]
      val name = s"diff_stream_$seed"
      val q = StreamingSessionize(mem.toDS(), ttlMs = None)
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName(name).start()
      try {
        val rnd = new Random(seed)
        var i = 0L
        var rest = log
        while (rest.nonEmpty) {
          val n = 1 + rnd.nextInt(7)
          val (batch, tail) = rest.splitAt(n)
          mem.addData(batch.zipWithIndex.map { case (l, j) => (i + j, l) })
          i += batch.length
          rest = tail
          q.processAllAvailable()
        }
        val out = spark.table(name).as[StreamingSessionize.StreamOut]
        val events = StreamingSessionize.enrich(
          out.filter(_.kind == 0), out.filter(_.kind == 1).toDF()).collect()
        val faults = out.filter(_.kind == 2).count()

        assert(events.length == incEvents.length, s"seed=$seed event count")
        assert(faults == incFaults.length, s"seed=$seed fault count")
        assert(events.map(gen.key).sortBy(_.toString()).toSeq ==
          incEvents.map(gen.key).sortBy(_.toString()).toSeq, s"seed=$seed content")
      } finally q.stop()
    }
  }
}
