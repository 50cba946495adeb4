package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Pins the micro-batch-sized streaming width ([[StreamWidth]]):
  * the derive formula reproduces every r18 ladder sweep optimum
  * (`target/stream_ladder_r18.txt`), the text/parquet estimators
  * recover planted row counts, and the resolution order is
  * env → derived → fallback. */
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

  test("resolve: derived when an estimate exists, fallback 8 otherwise") {
    // (the env-override arm needs SPARK_GRAFT_SHUFFLE_PARTITIONS in the
    // JVM env — exercised by the ladder runs, not settable from a spec)
    if (!sys.env.contains("SPARK_GRAFT_SHUFFLE_PARTITIONS")) {
      assert(StreamWidth.resolve(Some(500000L)) ===
        StreamWidth.Resolved(4, "derived", 500000L))
      assert(StreamWidth.resolve(None) === StreamWidth.Resolved(8, "fallback", -1L))
    }
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
