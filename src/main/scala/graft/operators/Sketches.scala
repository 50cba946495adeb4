package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality-sketch cube over Spark's Apache DataSketches
  * HLL functions (`hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate`, SQL-standard since Spark 3.5).
  *
  * The 100 TB shape this enables: scan the raw fact table ONCE into
  * per-(dims, shard) sketch rows — bytes ~ groups × 2^lgK, never rows —
  * persist that cube as parquet, and answer every later distinct-count
  * roll-up by unioning sketches, without touching raw data again. New
  * data appends new shard rows; a daily job sketches only the new day.
  * `approx_count_distinct` (HLL++) gives one-shot estimates but its
  * sketch state is not exposed; the DataSketches column IS the state,
  * so pre-aggregation composes across jobs, days and tables.
  *
  * Accuracy contract: same-lgK register state merges losslessly, so a
  * rolled-up cube carries the SAME error bound as a single-pass sketch
  * of the unsharded data — pre-aggregation costs no accuracy. The
  * point estimate itself is NOT bit-stable across merge topologies
  * (DataSketches' HIP estimator is update-history-dependent and a
  * union falls back to the composite estimator), so the pinned
  * contract is the bound, not estimate equality: every roll-up —
  * direct, re-sharded, incrementally merged — stays within the HLL
  * bound (~1.04/√2^lgK relative standard error; lgK 12 → ~1.6%),
  * gated at 5% against the exact twin in
  * `events_distinct_hll_violations` and SketchesSpec.
  */
object Sketches {

  /** Per-(dims, `_shard`) HLL sketches of `countCol`'s distinct values.
    * The shard key is a stand-in for whatever natural ingest partition a
    * real pipeline has (day, source file, kafka partition) — sketch
    * correctness needs no particular row-to-shard assignment, only that
    * the roll-up unions all of a group's shards. One map-side-combined
    * exchange on (dims, shard); the sketch buffer replaces the row set,
    * so a hot group costs 2^lgK bytes per map task, not its row count. */
  def hllCube(df: DataFrame, dims: Seq[String], countCol: String,
              shards: Int = 32, lgK: Int = 12): DataFrame = {
    require(dims.nonEmpty, "need at least one dimension column")
    require(shards >= 1, "shards must be >= 1")
    require(!dims.contains("_shard") && countCol != "_shard",
      "_shard is reserved")
    val keys = dims.map(col) :+
      pmod(xxhash64(col(countCol)), lit(shards.toLong)).cast("int").as("_shard")
    df.groupBy(keys: _*)
      .agg(hll_sketch_agg(col(countCol), lit(lgK)).as("hll"))
  }

  /** Roll a cube up to `dims`: union each group's shard sketches and
    * estimate. `dims` may be any subset of the cube's dimensions —
    * coarser roll-ups union more sketches, never rescan rows. */
  def hllRollup(cube: DataFrame, dims: Seq[String],
                estimateCol: String = "approx_distinct"): DataFrame =
    cube.groupBy(dims.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("hll"))).as(estimateCol))

  /** Merge two cubes with identical (dims, _shard) grammar — e.g.
    * yesterday's persisted cube with today's increment — into one cube
    * of the same shape. Sketches for the same group+shard union without
    * accuracy loss; disjoint groups pass through. */
  def hllMergeCubes(a: DataFrame, b: DataFrame, dims: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((dims :+ "_shard").map(col): _*)
      .agg(hll_union_agg(col("hll")).as("hll"))
}
