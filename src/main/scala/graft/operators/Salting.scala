package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — for the aggregation shapes AQE and
  * map-side partial aggregation do NOT already cover.
  *
  * When you don't need this (most of the time):
  *  - `groupBy.agg(sum/count/min/max...)` — Spark's partial aggregation
  *    combines per-partition before the shuffle; a hot key ships one
  *    pre-aggregated row per map task.
  *  - skewed joins — AQE's skew-join handling splits oversized partitions
  *    at runtime (`spark.sql.adaptive.skewJoin.enabled`, on by default).
  *
  * When you do: holistic aggregates over a hot key whose per-key state is
  * large (collect_list/collect_set, exact percentile buffers), where one
  * reducer would receive the whole key. Two-phase salting bounds any
  * single task at 1/`salts` of the hot key's data.
  */
object Salting {

  /** Deterministic salt in [0, salts) derived from arbitrary extra
    * columns (e.g. a row id) — reproducible, unlike rand(). */
  def saltCol(salts: Int, from: Column*): Column =
    pmod(xxhash64(from: _*), lit(salts.toLong)).cast("int")

  /** Two-phase collect_set: per-(key, salt) partial sets, then a final
    * merge per key. Any single task's buffer is bounded by the salt
    * fan-out even if one key dominates the table. */
  def saltedCollectSet(df: DataFrame, key: String, value: String,
                       salts: Int = 16): DataFrame =
    df.withColumn("_salt", saltCol(salts, col(value)))
      .groupBy(col(key), col("_salt"))
      .agg(collect_set(col(value)).as("_partial"))
      .groupBy(col(key))
      .agg(array_distinct(flatten(collect_list(col("_partial")))).as(s"${value}_set"))
}
