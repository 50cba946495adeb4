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

  // ------------------------------------------------- theta set algebra ----

  /** Per-`dims` Theta sketches of `countCol`'s distinct values. Theta
    * (unlike HLL) supports INTERSECTION and DIFFERENCE, so one sketch
    * row per group answers every audience-overlap question between
    * groups — |A∩B|, |A∖B| — without a pairwise self-join of raw rows.
    * A pairwise exact answer at 100 TB is a self-join of the fact table
    * per pair; from this table it is set algebra over KB-sized sketch
    * blobs. Accuracy: ~1/√2^lgK rsd on unions; intersection error
    * grows when |A∩B| is small relative to the union (the standard
    * Theta caveat) — the violations gate prices both. */
  def thetaSketches(df: DataFrame, dims: Seq[String],
                    countCol: String): DataFrame =
    df.groupBy(dims.map(col): _*)
      .agg(call_function("theta_sketch_agg", col(countCol)).as("theta"))

  /** All ordered pairs of groups with their set-algebra estimates:
    * (left dims, right dims, n_left, n_right, n_intersect, n_only_left).
    * The sketch table is tiny (one row per group) — the pair join is a
    * broadcast cross of sketch blobs, never a row self-join. */
  def thetaOverlap(sketches: DataFrame, dim: String): DataFrame = {
    val l = sketches.select(col(dim).as("a"), col("theta").as("ta"))
    val r = sketches.select(col(dim).as("b"), col("theta").as("tb"))
    l.crossJoin(r).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        call_function("theta_sketch_estimate", col("ta")).as("n_a"),
        call_function("theta_sketch_estimate", col("tb")).as("n_b"),
        call_function("theta_sketch_estimate",
          call_function("theta_intersection", col("ta"), col("tb")))
          .as("n_intersect"),
        call_function("theta_sketch_estimate",
          call_function("theta_difference", col("ta"), col("tb")))
          .as("n_only_a"))
  }

  /** Merge a theta table that holds MULTIPLE sketch rows per group —
    * e.g. one per ingest micro-batch ([[graft.streaming
    * .StreamingAnalytics.thetaCubeIntake]]) or per appended increment —
    * back to one sketch per `dims` group, unioning without accuracy
    * loss. The result feeds [[thetaOverlap]] unchanged. */
  def thetaRollup(cube: DataFrame, dims: Seq[String]): DataFrame =
    cube.groupBy(dims.map(col): _*)
      .agg(call_function("theta_union_agg", col("theta")).as("theta"))

  // ---------------------------------------------- kll quantile sketches ----

  /** Per-(dims, `_shard`) KLL quantile sketches of a double `valueCol` —
    * the order-statistics sibling of [[hllCube]]: the cube persists as
    * parquet and any later roll-up answers arbitrary quantiles via a
    * rank-error-bounded merge, never a re-sort of raw rows. KLL rank
    * error at the default k=200 is ~1.65% (±ε of the RANK, so the
    * returned value lies between the exact (p−ε) and (p+ε) quantiles —
    * that value-between-rank-bounds form is what the gate checks). */
  def kllCube(df: DataFrame, dims: Seq[String], valueCol: String,
              shards: Int = 32): DataFrame = {
    require(dims.nonEmpty, "need at least one dimension column")
    require(shards >= 1, "shards must be >= 1")
    val keys = dims.map(col) :+
      pmod(xxhash64(col(valueCol)), lit(shards.toLong)).cast("int").as("_shard")
    df.groupBy(keys: _*)
      .agg(call_function("kll_sketch_agg_double", col(valueCol)).as("kll"))
  }

  /** Roll a KLL cube up to `dims` and extract quantiles `ps`, one
    * `p<percent>` column per requested quantile. */
  def kllRollup(cube: DataFrame, dims: Seq[String],
                ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty, "need at least one quantile")
    val labels = ps.map(p => s"p${(p * 100).round}")
    require(labels.distinct.size == labels.size,
      s"quantiles collide after rounding to integer labels: $labels")
    val merged = cube.groupBy(dims.map(col): _*)
      .agg(call_function("kll_merge_agg_double", col("kll")).as("kll"))
    val qs = ps.zip(labels).map { case (p, label) =>
      call_function("kll_sketch_get_quantile_double", col("kll"), lit(p))
        .as(label)
    }
    merged.select(dims.map(col) ++ qs: _*)
  }
}
