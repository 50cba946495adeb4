package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Testdata table access (TESTDATA.md): one parquet file per table under a
  * scale-factor directory.
  *
  * The `events` table carries INT64 TIMESTAMP(NANOS), which Spark's parquet
  * reader rejects by default; we read nanos as long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and rebuild a microsecond
  * TimestampType column (the data is µs-grained — verified all values are
  * multiples of 1000 ns). */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // make ts-range predicates written against the rebuilt column reach
      // the parquet scan (see the rule's scaladoc)
      graft.plans.PushTimestampMicrosPredicates.install(spark)
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
