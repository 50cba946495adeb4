package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Testdata table access (TESTDATA.md): one parquet file per table under a
  * scale-factor directory.
  *
  * The driver's generator has shipped the `events.ts` column under several
  * physical parquet encodings across rounds, so the loader normalizes all of
  * them to a session-TZ (UTC) `TimestampType` column with identical
  * `unix_micros` semantics:
  *
  *   - INT64 TIMESTAMP(NANOS): Spark's reader rejects it by default; we read
  *     nanos as long (`spark.sql.legacy.parquet.nanosAsLong`) and rebuild a
  *     microsecond timestamp (the data is µs-grained — all values are
  *     multiples of 1000 ns). [[graft.plans.PushTimestampMicrosPredicates]]
  *     keeps time-range pruning alive for this rebuilt column.
  *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
  *     `TIMESTAMP_NTZ` by default, which `unix_micros` rejects. We disable
  *     `spark.sql.parquet.inferTimestampNTZ.enabled` so the scan surfaces a
  *     plain `TimestampType` (wall-clock read in the UTC session ⇒ the same
  *     instants DuckDB's `epoch_us` sees) — predicates then push into the
  *     scan natively, with no cast in the way.
  *   - TIMESTAMP(MICROS, adjusted) / already-normalized inputs: passthrough.
  *
  * The `TimestampNTZType` branch below is a belt-and-braces fallback for a
  * pre-resolved schema (e.g. a caller supplying its own reader): a cast to
  * `TimestampType` under the UTC session preserves every wall-clock value.
  */
object Tables {
  /** Normalize any timestamp-carrying column to UTC `TimestampType`. */
  private def normalizeTs(df: DataFrame): DataFrame = {
    val fixes: Seq[(String, Column)] = df.schema.fields.toSeq.collect {
      case f if f.dataType == TimestampNTZType =>
        f.name -> col(f.name).cast(TimestampType)
      case f if f.name == "ts" && f.dataType == LongType =>
        // legacy nanos-as-long encoding; µs-grained by construction
        f.name -> timestamp_micros(expr(s"${f.name} div 1000"))
    }
    fixes.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
  }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // make ts-range predicates written against a rebuilt column reach
      // the parquet scan (see the rule's scaladoc)
      graft.plans.PushTimestampMicrosPredicates.install(spark)
      // Both confs are schema-resolution switches with no per-read
      // DataFrameReader option in Spark 4.1 (ParquetOptions carries only
      // rebase/compression/mergeSchema), so they are scoped by
      // save-set-restore around the EAGER schema resolution below —
      // leaving them set session-wide would silently strip
      // TIMESTAMP_NTZ inference from every later non-Tables parquet
      // read in the same session (order-dependent state leak).
      val ntzKey = "spark.sql.parquet.inferTimestampNTZ.enabled"
      val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
      val prior = Seq(ntzKey, nanosKey).map(k => k -> spark.conf.getOption(k))
      spark.conf.set(nanosKey, "true")
      spark.conf.set(ntzKey, "false")
      try normalizeTs(spark.read.parquet(s"$sfDir/$name.parquet"))
      finally prior.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    } else normalizeTs(spark.read.parquet(s"$sfDir/$name.parquet"))
  }
}
