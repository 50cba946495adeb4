package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._

/** Randomized reference-parity fuzzing: every run generates a FRESH
  * adversarial corpus (seed logged, reproducible via
  * `GRAFT_PARITY_SEED`) through `scripts/gen_parity_fuzz.py`, which
  * mutates the session generator's output (timestamp corruption,
  * truncation, duplication, deletion, orphan lines, deferred/bounced
  * status variants, garbage) and records what the reference's ACTUAL
  * PostfixLogParser emits for it. Our batch pipeline must match
  * field-for-field plus the fault count — so parser divergences on
  * input neither side has ever seen trip CI, not just replays of the
  * pinned [[ReferenceParitySpec]] corpus (which stays as the
  * deterministic floor).
  *
  * Cancels (does not fail) when python3 or /root/reference is absent —
  * the fuzz needs the reference parser itself to produce expectations. */
class ParityFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private val seed: Long = sys.env.get("GRAFT_PARITY_SEED").map(_.toLong)
    .getOrElse(math.abs(System.nanoTime()) % 1000000L)

  test(s"batch pipeline matches the reference parser on a fresh fuzzed corpus [seed=$seed]") {
    assume(new java.io.File("/root/reference/lognormalizer/parse.py").isFile,
      "reference parser not available")
    assume(Seq("sh", "-c", "command -v python3").! == 0, "python3 not available")
    info(s"fuzz seed = $seed (rerun with GRAFT_PARITY_SEED=$seed)")

    val dir = java.nio.file.Files.createTempDirectory(s"parity_fuzz_$seed")
    val gen = Process(Seq("python3", "scripts/gen_parity_fuzz.py",
      dir.toString, "800", seed.toString))
    val log = new StringBuilder
    val rc = gen ! ProcessLogger(l => { log.append(l).append('\n'); () },
      l => { log.append(l).append('\n'); () })
    assert(rc == 0, s"generator failed (seed=$seed):\n$log")
    info(log.toString.trim)

    import spark.implicits._
    val lines = java.nio.file.Files
      .readAllLines(dir.resolve("mail.log")).toArray(Array.empty[String]).toVector
    val Array(expEvents, expFaults) = java.nio.file.Files
      .readString(dir.resolve("expected_counts.txt")).trim.split(" ").map(_.toInt)
    val expected = ParityHarness.expectedCanon(
      spark, dir.resolve("expected_events.jsonl").toString)
    assert(expected.length == expEvents, s"fixture self-consistency (seed=$seed)")

    val res = Sessionize(spark,
      lines.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDS())
    val got = res.events.collect().map(ParityHarness.canonEvent).sorted.toSeq
    assert(res.faults.count() == expFaults.toLong,
      s"fault count vs reference (seed=$seed)")
    assert(got.length == expected.length, s"event count vs reference (seed=$seed)")
    got.zip(expected).zipWithIndex.foreach { case ((g, e), idx) =>
      assert(g == e, s"event #$idx differs from reference (seed=$seed)")
    }
  }
}
