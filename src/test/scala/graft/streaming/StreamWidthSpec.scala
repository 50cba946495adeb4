package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Pins the micro-batch-sized streaming width ([[StreamWidth]]):
  * the derive formula reproduces every r18 ladder sweep optimum
  * (`target/stream_ladder_r18.txt`), the text/parquet estimators
  * recover planted row counts, and the resolution order is
  * env → legacy env-cpus → derived → fallback. */
class StreamWidthSpec extends AnyFunSuite {

  test("derive reproduces the measured knees: 500k→4, 1M→8, 10M→8") {
    assert(StreamWidth.derive(500000L) === 4)
    assert(StreamWidth.derive(1000000L) === 8)
    assert(StreamWidth.derive(10000000L) === 8)
    // floors and monotone interior
    assert(StreamWidth.derive(1L) === 4)
    assert(StreamWidth.derive(0L) === 4) // degenerate estimate clamps
    assert(StreamWidth.derive(625001L) === 6)
    assert(StreamWidth.derive(Long.MaxValue / 2) === 8) // cap, no overflow
  }

  test("resolve: env > legacy env-cpus > derived > fallback") {
    assert(StreamWidth.resolve(Some(500000L), Map.empty) ===
      StreamWidth.Resolved(4, "derived", 500000L))
    assert(StreamWidth.resolve(None, Map.empty) ===
      StreamWidth.Resolved(8, "fallback", -1L))
    // the primary env override wins over everything
    assert(StreamWidth.resolve(Some(500000L),
      Map("SPARK_GRAFT_SHUFFLE_PARTITIONS" -> "12", "SPARK_GRAFT_CPUS" -> "16"))
      === StreamWidth.Resolved(12, "env", 500000L))
    // the legacy CPU pin keeps its historical meaning (one env contract
    // across all CLIs) but yields to the explicit width env
    assert(StreamWidth.resolve(Some(500000L), Map("SPARK_GRAFT_CPUS" -> "16"))
      === StreamWidth.Resolved(16, "env-cpus", 500000L))
    assert(StreamWidth.resolve(None, Map("SPARK_GRAFT_CPUS" -> "6"))
      === StreamWidth.Resolved(6, "env-cpus", -1L))
    // the batch CLIs accept non-numeric values ("*" -> local[*]) for
    // this knob; those cannot name a width and must fall through to the
    // derivation instead of crashing the streaming CLIs
    assert(StreamWidth.resolve(Some(500000L), Map("SPARK_GRAFT_CPUS" -> "*"))
      === StreamWidth.Resolved(4, "derived", 500000L))
    // the PRIMARY width env gets the same graceful contract: a
    // non-numeric value falls through (with a note) instead of crashing
    assert(StreamWidth.resolve(Some(500000L),
      Map("SPARK_GRAFT_SHUFFLE_PARTITIONS" -> "lots"))
      === StreamWidth.Resolved(4, "derived", 500000L))
  }

  test("estimateTextDir pools heads across files: mixed line lengths stay within a knee notch") {
    val dir = java.nio.file.Files.createTempDirectory("swidth_mix")
    // one LARGE long-line file (the old single-file sample would let its
    // 300-char lines speak for the whole directory) + four short-line
    // files holding most of the LINES
    java.nio.file.Files.writeString(dir.resolve("big.log"),
      ("y" * 299 + "\n") * 200) // 60 KB, 200 lines
    for (i <- 0 until 4)
      java.nio.file.Files.writeString(dir.resolve(s"small$i.log"),
        ("x" * 19 + "\n") * 1000) // 20 KB, 1000 lines each
    val est = StreamWidth.estimateTextDir(dir.toString, None).get
    val truth = 200L + 4000L
    // pooled sampling recovers the true count almost exactly (all heads
    // fit in 64 KiB); the old estimator was ~9× under (≈ 466)
    assert(math.abs(est - truth) <= truth / 10,
      s"pooled estimate $est should be within 10% of $truth")
    assert(StreamWidth.derive(est) === StreamWidth.derive(truth))
  }

  test("estimateTextDir recovers a planted line count and scales by maxFilesPerTrigger") {
    val dir = java.nio.file.Files.createTempDirectory("swidth_txt")
    val line = "x" * 49 + "\n" // 50 bytes/line exactly
    for (i <- 0 until 4)
      java.nio.file.Files.writeString(dir.resolve(s"f$i.log"), line * 1000)
    // hidden/underscore files must not count
    java.nio.file.Files.writeString(dir.resolve("_SUCCESS"), "ignored")
    java.nio.file.Files.writeString(dir.resolve(".crc"), "ignored")
    val all = StreamWidth.estimateTextDir(dir.toString, None)
    assert(all === Some(4000L)) // exact: uniform lines sample perfectly
    val twoPerTrigger = StreamWidth.estimateTextDir(dir.toString, Some(2))
    assert(twoPerTrigger === Some(2000L))
    // maxFiles >= nFiles leaves the total untouched
    assert(StreamWidth.estimateTextDir(dir.toString, Some(99)) === Some(4000L))
    // missing / empty dirs → None (follow-mode cold start)
    assert(StreamWidth.estimateTextDir(dir.toString + "_missing", None).isEmpty)
    val empty = java.nio.file.Files.createTempDirectory("swidth_empty")
    assert(StreamWidth.estimateTextDir(empty.toString, None).isEmpty)
  }

  test("apply records width.json with truncate semantics across re-runs") {
    val spark = graft.SparkSpec.spark
    val priorWidth = spark.conf.get("spark.sql.shuffle.partitions")
    val outDir = java.nio.file.Files.createTempDirectory("swidth_rec").toString
    // a prior run's progress rows already occupy the file — the re-run's
    // width must NOT be read positionally from progress.jsonl
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outDir, "progress.jsonl"),
      "{\"batchId\":0}\n{\"batchId\":1}\n")
    val r1 = StreamWidth(spark, "spec", outDir, Some(500000L))
    val r2 = StreamWidth(spark, "spec", outDir, Some(1000000L))
    spark.conf.set("spark.sql.shuffle.partitions", priorWidth) // shared session
    val width = java.nio.file.Files.readString(
      java.nio.file.Paths.get(outDir, "width.json"))
    // width.json holds EXACTLY the latest decision (truncated, 1 line)
    assert(width.trim.linesIterator.size === 1)
    assert(width.contains(s""""width":${r2.width}"""))
    if (r1.width != r2.width) assert(!width.contains(s""""width":${r1.width}"""))
    // progress.jsonl keeps every record appended behind the prior rows
    val progress = java.nio.file.Files.readString(
      java.nio.file.Paths.get(outDir, "progress.jsonl"))
    assert(progress.linesIterator.count(_.contains("\"graft\":\"stream_width\"")) === 2)
  }

  test("estimateParquetDir scales the largest file's exact count by bytes") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("swidth_pq").toString
    (1L to 3000L).toDF("v").coalesce(1).write.mode("overwrite").parquet(dir)
    val est = StreamWidth.estimateParquetDir(spark, dir, None)
    // single data file → the footer count is exact
    assert(est === Some(3000L))
    assert(StreamWidth.estimateParquetDir(spark, dir + "_missing", None).isEmpty)
  }
}
