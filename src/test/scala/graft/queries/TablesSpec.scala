package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** The driver's generator has already changed the physical encoding of
  * `events.ts` between rounds (INT64 TIMESTAMP(NANOS) → µs TIMESTAMP with
  * isAdjustedToUTC=false). [[Tables]] must surface the SAME UTC
  * `TimestampType` column — identical `unix_micros` values — no matter
  * which encoding the parquet on disk carries. */
class TablesSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  // 2024-01-10 00:00:00 UTC and two neighbours, in epoch micros
  private val micros = Seq(1704844800000000L, 1704844800000001L, 1704931199999999L)

  private def writeFixture(writeTs: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tables_spec").toString
    micros.zipWithIndex
      .toDF("us", "event_id")
      .select($"event_id".cast("long"), writeTs.as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def loadedMicros(dir: String): Seq[Long] = {
    val df = Tables(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType, df.schema.treeString)
    df.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq.sorted
  }

  test("UTC-adjusted µs TIMESTAMP (plain Spark write) loads unchanged") {
    val dir = writeFixture(timestamp_micros(col("us")))
    assert(loadedMicros(dir) == micros)
  }

  test("TIMESTAMP_NTZ (µs, isAdjustedToUTC=false — the round-10 regeneration) is cast to UTC TimestampType") {
    // Spark writes TimestampNTZType as µs TIMESTAMP(isAdjustedToUTC=false),
    // the same physical shape pandas/pyarrow writes for naive timestamps.
    val dir = writeFixture(timestamp_micros(col("us")).cast(TimestampNTZType))
    assert(loadedMicros(dir) == micros)
  }

  test("legacy nanos-as-long ts column is rebuilt as µs TimestampType") {
    val dir = writeFixture((col("us") * 1000L).cast(LongType))
    assert(loadedMicros(dir) == micros)
  }

  test("real /root/testdata events loads as TimestampType with sane ts range") {
    val df = Tables(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType == TimestampType)
    val Array(lo, hi, n) = df
      .agg(unix_micros(min(col("ts"))), unix_micros(max(col("ts"))), count(lit(1)))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    assert(n > 0)
    // the generated events live in 2024 (TESTDATA.md); any encoding slip
    // (ns↔µs, tz shift) throws this off by orders of magnitude or hours
    assert(lo >= 1704067200000000L && hi < 1735689600000000L, s"[$lo, $hi]")
  }

  test("time-range predicate reaches the parquet scan (PushedFilters) on real events") {
    val bound = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val plan = Tables(spark, "/root/testdata/sf0.001", "events")
      .filter(col("ts") >= lit(bound))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThanOrEqual(ts") || plan.contains("GreaterThanOrEqual(raw")),
      plan)
  }
}
