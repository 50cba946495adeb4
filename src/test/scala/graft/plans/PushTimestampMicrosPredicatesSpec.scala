package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The floor-division inversion must be exact on boundaries, including
  * nanos that are NOT multiples of 1000 (truncation toward the µs). */
class PushTimestampMicrosPredicatesSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private val baseUs = 1704844800000000L // 2024-01-10 00:00:00 UTC in micros

  private def df = {
    import spark.implicits._
    PushTimestampMicrosPredicates.install(spark)
    val nanos = Seq(
      (baseUs - 1) * 1000L,      // 1µs before the bound
      baseUs * 1000L - 1,        // 1ns before (truncates to baseUs-1 µs)
      baseUs * 1000L,            // exactly on
      baseUs * 1000L + 999,      // same µs, later ns
      (baseUs + 1) * 1000L       // 1µs after
    )
    nanos.toDF("raw").withColumn("ts", timestamp_micros(expr("raw div 1000")))
  }

  private val bound = java.sql.Timestamp.from(
    java.time.Instant.ofEpochSecond(baseUs / 1000000L))

  test(">= bound keeps the on-boundary µs (both ns variants)") {
    assert(df.filter(col("ts") >= lit(bound)).count() == 3)
  }
  test("> bound drops the whole on-boundary µs") {
    assert(df.filter(col("ts") > lit(bound)).count() == 1)
  }
  test("< bound keeps everything before the µs") {
    assert(df.filter(col("ts") < lit(bound)).count() == 2)
  }
  test("<= bound includes the full on-boundary µs") {
    assert(df.filter(col("ts") <= lit(bound)).count() == 4)
  }
  test("mirrored literal-on-left forms") {
    assert(df.filter(lit(bound) <= col("ts")).count() == 3)
    assert(df.filter(lit(bound) > col("ts")).count() == 2)
  }
  /** Spark's `div` truncates toward zero, so for negative dividends
    * (pre-1970 nanos) the inversion boundary shifts by k-1: the rewrite
    * must agree with the unrewritten expression on every comparison, for
    * values straddling zero and both boundary roundings. */
  test("negative dividends (pre-1970) rewrite exactly") {
    import spark.implicits._
    PushTimestampMicrosPredicates.install(spark)
    val nanos = Seq(-2000L, -1500L, -1001L, -1000L, -999L, -500L, -1L, 0L,
      1L, 500L, 999L, 1000L, 1500L, 2000L)
    val d = nanos.toDF("raw").withColumn("ts", timestamp_micros(expr("raw div 1000")))
    val epoch = java.sql.Timestamp.from(java.time.Instant.EPOCH)
    val negUs = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(0).minusNanos(1000))
    for (b <- Seq(epoch, negUs)) {
      // expected counts straight from the truncation semantics, no Spark
      val bUs = b.toInstant.getEpochSecond * 1000000L + b.toInstant.getNano / 1000L
      def t(n: Long) = n / 1000L // Java / == truncation toward zero
      assert(d.filter(col("ts") >= lit(b)).count() == nanos.count(t(_) >= bUs), s">= $bUs")
      assert(d.filter(col("ts") > lit(b)).count() == nanos.count(t(_) > bUs), s"> $bUs")
      assert(d.filter(col("ts") < lit(b)).count() == nanos.count(t(_) < bUs), s"< $bUs")
      assert(d.filter(col("ts") <= lit(b)).count() == nanos.count(t(_) <= bUs), s"<= $bUs")
      assert(d.filter(lit(b) <= col("ts")).count() == nanos.count(t(_) >= bUs), s"m<= $bUs")
      assert(d.filter(lit(b) > col("ts")).count() == nanos.count(t(_) < bUs), s"m> $bUs")
    }
  }

  test("rewritten plan actually pushes a long comparison to the scan") {
    // materialize through parquet so a FileSourceScan exists to push into
    val dir = java.nio.file.Files.createTempDirectory("rule_spec").toString
    df.select("raw").write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
      .withColumn("ts", timestamp_micros(expr("raw div 1000")))
      .filter(col("ts") >= lit(bound))
    val physical = back.queryExecution.executedPlan.toString
    assert(physical.contains("GreaterThanOrEqual(raw"), physical)
    assert(back.count() == 3)
  }
}
