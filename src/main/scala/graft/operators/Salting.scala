package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Attach a positional per-row token `_row_token` =
    * (partition_id << 40) | row_index_within_partition — the
    * identical-row spreader for salting when no stable row id column
    * exists. Positional, so byte-identical rows in a hot-key flood
    * still fan out across salts (a content hash would collapse them
    * onto ONE salt and silently disable the spread).
    *
    * Determinism contract: recomputation yields the same token exactly
    * when the input stage recomputes its partitions in the same order —
    * true of file scans (splits are fixed), NOT guaranteed downstream
    * of a shuffle (fetch order varies across attempts). Callers whose
    * salted frame is shuffle-derived should pass their stable row id
    * via `rowId` instead; this is why the salt is never derived from
    * `monotonically_increasing_id` used directly as a join key — a
    * stage retry re-salting rows differently can duplicate or drop
    * join output. One narrow pass; no shuffle. */
  private[operators] def withRowToken(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val schema = df.schema.add("_row_token", org.apache.spark.sql.types.LongType,
      nullable = false)
    df.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      it.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ ((pid << 40) | i.toLong))
      }
    }(Encoders.row(schema))
  }

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

  /** Two-phase collect_list with a deterministic (sorted-multiset)
    * result: per-(key, salt) partial lists, then flatten + sort in the
    * final merge. Unlike [[saltedCollectSet]] the salt must spread
    * DUPLICATE values too (a key flooded with one repeated value is
    * exactly the skew case), so it derives from a synthetic per-row id
    * rather than the value; the output is salt-assignment-invariant
    * because the sorted multiset doesn't depend on which partial each
    * row landed in.
    *
    * Each aggregation BUFFER is bounded at ~1/salts of the hot key; the
    * final merged array is still the key's whole multiset (that's the
    * operator's contract). When only an order statistic of that multiset
    * is needed, use [[exactPercentile]] instead — it never materializes
    * the multiset anywhere.
    *
    * @param rowId stable per-row id column for the salt — pass it when
    *              `df` is shuffle-derived (see [[withRowToken]]'s
    *              determinism contract); defaults to the positional
    *              row token. */
  def saltedSortedList(df: DataFrame, key: String, value: String,
                       salts: Int = 16,
                       rowId: Option[String] = None): DataFrame =
    rowId.map(id => df.withColumn("_salt", saltCol(salts, col(id))))
      .getOrElse(withRowToken(df)
        .withColumn("_salt", saltCol(salts, col("_row_token")))
        .drop("_row_token"))
      .groupBy(col(key), col("_salt"))
      .agg(collect_list(col(value)).as("_partial"))
      .groupBy(col(key))
      .agg(array_sort(flatten(collect_list(col("_partial")))).as(s"${value}_list"))

  /** EXACT percentile per key with NO holistic buffer at all — the
    * decomposition that makes "exact p50 over a 100 TB hot key" viable:
    *
    *  1. `groupBy(key, value).count()` — map-side partial aggregation
    *     collapses a hot key to its distinct values before the shuffle,
    *     so the exchange carries (key, value, partial count) rows, never
    *     raw rows;
    *  2. a per-key cumulative sum over the (sorted) distinct values
    *     picks the element of rank `floor((n-1)*p) + 1` (the
    *     lower-interpolation discrete percentile — an actual data value,
    *     bit-comparable across engines, no float interpolation).
    *
    * Per-task state is bounded by the key's DISTINCT-value cardinality
    * (the window sort spills; there is no aggregation buffer), versus
    * collect_list-then-sort whose merge task holds the key's full row
    * multiset. Rows with a NULL value are ignored (SQL aggregate
    * convention).
    *
    * @return one row per key: (key, p<pct> value), e.g. `p50`. */
  def exactPercentile(df: DataFrame, key: String, value: String,
                      p: Double): DataFrame =
    exactPercentileWeighted(df, key, value, p, weight = None)

  /** [[exactPercentile]] with per-row integer weights (ClickHouse
    * `quantileExactWeighted`): the element whose cumulative weight first
    * reaches `floor((W−1)·p)+1` of the total weight W — identical to
    * replicating each row `weight` times and taking the unweighted
    * percentile, without materializing a single replica. Same
    * no-holistic-buffer decomposition: the groupBy collapses to distinct
    * values with SUMMED weights map-side, so the hot-key exchange still
    * carries (key, value, partial sum) rows. Rows with NULL or
    * non-positive weight are ignored. */
  def exactPercentileWeighted(df: DataFrame, key: String, value: String,
                              p: Double, weight: Option[String]): DataFrame =
    exactPercentileWeighted(df, key, value, p, weight, distributed = None)

  /** @param distributed Some(true) forces the two-level distributed
    *   cumulative sum, Some(false) the single per-key window; None (the
    *   default) decides from the input's estimated size
    *   ([[distributedCumThresholdBytes]]). Results are identical either
    *   way (asserted differentially in SaltingSpec). */
  def exactPercentileWeighted(df: DataFrame, key: String, value: String,
                              p: Double, weight: Option[String],
                              distributed: Option[Boolean]): DataFrame = {
    require(p >= 0.0 && p <= 1.0, s"percentile out of range: $p")
    val outCol = s"p${math.round(p * 100)}"
    val weighted = weight.fold(df.withColumn("_w", lit(1L))) { w =>
      df.withColumn("_w", col(w).cast("long")).filter(col("_w") > 0)
    }
    val counts = weighted.filter(col(value).isNotNull)
      .groupBy(col(key), col(value).as("_v"))
      .agg(sum(col("_w")).as("_c"))
    val rank = floor((col("_n") - 1) * lit(p)) + 1
    cumFrame(counts, key, distributed.getOrElse(useDistributedCum(df)))
      .filter(col("_cum") - col("_c") < rank && rank <= col("_cum"))
      .select(col(key), col("_v").as(outCol))
  }

  /** Byte threshold above which the percentile family switches to the
    * distributed cumulative sum. 4 GiB of input is far past anything the
    * per-key window regime strains on, far under anything the
    * distributed regime's extra exchange hurts; gate/bench scale dirs
    * stay on the window plan, so driver measurements remain comparable.
    * SPARK_GRAFT_PCT_DIST_BYTES overrides for probes. */
  private def distributedCumThresholdBytes: Long =
    sys.env.get("SPARK_GRAFT_PCT_DIST_BYTES").map(_.toLong).getOrElse(4L << 30)

  private def useDistributedCum(df: DataFrame): Boolean =
    try df.queryExecution.optimizedPlan.stats.sizeInBytes >
      BigInt(distributedCumThresholdBytes)
    catch { case _: Throwable => false }

  /** Per-key cumulative weight over value order — the shared core of the
    * exact-percentile family. Input: one row per (key, _v) with weight
    * `_c`; output adds `_cum` (running sum of `_c` in `_v` order within
    * the key) and `_n` (the key's total).
    *
    * The single-window form partitions by KEY: one task per key, whose
    * sort state is the key's distinct-value count — fine until a key's
    * value cardinality outgrows a task (the 100 TB straggler: 3 return
    * flags over billions of distinct prices = 3 tasks doing everything).
    * The distributed form range-partitions by (key, _v) so every task
    * holds a bounded slice, computes per-slice prefix sums, and shifts
    * each slice by the sum of its key's earlier slices — the offsets
    * frame is O(slices + keys) rows and its own window state is bounded
    * by the slice count. Bit-identical output: longs add associatively
    * and the range order equals the window order. */
  private def cumFrame(counts: DataFrame, key: String,
                       distributed: Boolean): DataFrame =
    if (!distributed) {
      val wCum = Window.partitionBy(key).orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(key)
      counts
        .withColumn("_cum", sum(col("_c")).over(wCum))
        .withColumn("_n", sum(col("_c")).over(wAll))
    } else {
      val spark = counts.sparkSession
      val parts = spark.sessionState.conf.numShufflePartitions
      // checkpoint BEFORE the range exchange: the range partitioner's
      // sampling pass and the real pass must see one materialization of
      // the aggregate (and identical boundaries), not recompute it
      val ranged = counts.localCheckpoint()
        .repartitionByRange(parts, col(key), col("_v"))
        .withColumn("_pid", spark_partition_id())
        .localCheckpoint()
      val sliceTot = ranged.groupBy(col("_pid"), col(key))
        .agg(sum(col("_c")).as("_st"))
      val wOff = Window.partitionBy(key).orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = sliceTot
        .withColumn("_off", coalesce(sum(col("_st")).over(wOff), lit(0L)))
        .withColumn("_n", sum(col("_st")).over(Window.partitionBy(key)))
        .drop("_st")
      val wSlice = Window.partitionBy(col("_pid"), col(key)).orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ranged
        .withColumn("_slicecum", sum(col("_c")).over(wSlice))
        .join(offs, Seq("_pid", key))
        .withColumn("_cum", col("_slicecum") + col("_off"))
        .drop("_pid", "_slicecum", "_off")
    }

  /** Multi-percentile sibling of [[exactPercentile]] (ClickHouse
    * `quantilesExact(p…)(x)`): ALL requested percentiles from the ONE
    * (key, value, count) histogram + cumulative-sum frame — the whole
    * point of the decomposition is that extra percentiles are extra
    * FILTERS, not extra scans or shuffles. Emits one row per key with a
    * `p<pct>` column per requested percentile (lower-interpolation
    * discrete values, like the single-p operator). */
  def exactPercentiles(df: DataFrame, key: String, value: String,
                       ps: Seq[Double]): DataFrame =
    exactPercentiles(df, key, value, ps, distributed = None)

  /** @param distributed see [[exactPercentileWeighted]]. */
  def exactPercentiles(df: DataFrame, key: String, value: String,
                       ps: Seq[Double],
                       distributed: Option[Boolean]): DataFrame = {
    require(ps.nonEmpty, "need at least one percentile")
    require(ps.forall(p => p >= 0.0 && p <= 1.0), s"percentile out of range: $ps")
    val labels = ps.map(p => s"p${math.round(p * 100)}")
    require(labels.distinct.size == labels.size,
      s"percentiles collide after rounding to integer labels: $labels")
    val counts = df.filter(col(value).isNotNull)
      .groupBy(col(key), col(value).as("_v"))
      .agg(count(lit(1)).as("_c"))
    val cum = cumFrame(counts, key, distributed.getOrElse(useDistributedCum(df)))
    val picks = ps.zip(labels).map { case (p, label) =>
      val rank = floor((col("_n") - 1) * lit(p)) + 1
      max(when(col("_cum") - col("_c") < rank && rank <= col("_cum"),
        col("_v"))).as(label)
    }
    cum.groupBy(col(key)).agg(picks.head, picks.tail: _*)
  }

  /** Salted inner equi-join for EXTREME key skew — the manual fallback
    * when AQE's skew-join split (which only splits oversized partitions
    * of a sort-merge join after the fact) isn't enough: a hot key whose
    * rows outnumber an executor's memory still lands on `salts` tasks
    * here, because the salt is part of the join key from the start.
    *
    * Two-phase: a count pre-pass finds keys with more than
    * `hotThreshold` fact rows (map-side partial aggregation collapses
    * the hot keys before the exchange, so the pre-pass shuffles at most
    * one row per distinct key; the resulting hot set is tiny by the
    * nature of skew and is broadcast). Hot fact rows get a salt in
    * [0, salts) derived from a per-row id — NOT from the row's
    * contents, because the canonical hot-key flood is byte-identical
    * rows, which a content hash would collapse onto ONE salt, silently
    * disabling the spread (same reasoning as [[saltedSortedList]]).
    * The id is the caller's `rowId` column when given (fully
    * deterministic under any retry), else the positional
    * [[withRowToken]] (deterministic for scan-stage inputs; see its
    * contract — the salt is a JOIN KEY here, so a retry-unstable salt
    * could duplicate or drop matches, which is why
    * `monotonically_increasing_id` is not used). Cold rows keep salt 0.
    * Each right (dim) row replicates to all `salts` ONLY for hot keys —
    * cold keys pay nothing — and the join runs on keys + salt. Result
    * is EXACTLY the plain inner join for any salt assignment (each
    * (l, r) match pairs once, under l's salt) — asserted differentially
    * in SaltingSpec with dim duplicates across thresholds and salt
    * counts.
    *
    * The hot set stays DISTRIBUTED (persisted + broadcast into both
    * sides; [[CacheRegistry]]-released by the caller) — it is
    * broadcast-sized by construction (at most |fact| / hotThreshold
    * keys), but it never lands on the driver as rows: the only eager
    * driver-side decision is an `isEmpty` probe. When the hot set is
    * empty — skew insurance on an input that turned out unskewed — the
    * whole salting apparatus is skipped and the plan IS the plain join;
    * the insurance premium is exactly the one map-side-combined
    * detection scan.
    *
    * Use for fact⨝dim with a skewed fact; for two huge tables bucket
    * both sides instead. */
  def skewJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               salts: Int = 16, hotThreshold: Long = 1000000L,
               rowId: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "need at least one join key")
    require(salts >= 1, "salts must be >= 1")
    require(hotThreshold >= 1, "hotThreshold must be >= 1")
    val hot = CacheRegistry.track(hotKeys(left, keys, hotThreshold).persist())
    if (hot.isEmpty) {
      left.join(right, keys)
    } else {
      val l = saltedLeft(left, keys, salts, hot, rowId)
      val r = right.join(broadcast(hot), keys, "left_outer")
        .withColumn("_salt", explode(
          when(col("_hot").isNotNull,
            sequence(lit(0), lit(salts - 1)).cast("array<int>"))
            .otherwise(array(lit(0)))))
        .drop("_hot")
      l.join(r, keys :+ "_salt").drop("_salt")
    }
  }

  /** Keys with more than `hotThreshold` rows, as a tiny broadcastable
    * frame marked `_hot = true`. */
  private[operators] def hotKeys(left: DataFrame, keys: Seq[String],
                                 hotThreshold: Long): DataFrame = {
    val keyCols = keys.map(col)
    left.groupBy(keyCols: _*).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > hotThreshold)
      .select(keyCols: _*)
      .withColumn("_hot", lit(true))
  }

  /** The fact side with its `_salt` assignment — separate so tests can
    * assert the spread directly (identical-row floods MUST still fan out
    * across salts, which the per-row-id salt guarantees).
    *
    * Without a caller row id, the positional token pass costs a full
    * row serde (mapPartitions leaves whole-stage codegen), so it is
    * applied to the HOT subset only: cold rows take a broadcast
    * anti-join branch that stays entirely in codegen with `_salt = 0`,
    * hot rows take the semi-join branch through [[withRowToken]]. The
    * serde premium therefore scales with the skewed fraction, not the
    * table — at 100 TB with a handful of hot keys, the cold 99% never
    * leaves the vectorized path. (The fact scans twice, but both
    * branches are pruned, pushed-down parquet scans; cheaper than one
    * full-width row serde of everything.) */
  private[operators] def saltedLeft(left: DataFrame, keys: Seq[String],
                                    salts: Int, hot: DataFrame,
                                    rowId: Option[String] = None): DataFrame =
    rowId match {
      case Some(c) =>
        left.join(broadcast(hot), keys, "left_outer")
          .withColumn("_salt",
            when(col("_hot").isNotNull, saltCol(salts, col(c))).otherwise(0))
          .drop("_hot")
      case None =>
        val hotKeysOnly = hot.drop("_hot")
        val cold = left.join(broadcast(hotKeysOnly), keys, "left_anti")
          .withColumn("_salt", lit(0))
        val hotRows = withRowToken(
            left.join(broadcast(hotKeysOnly), keys, "left_semi"))
          .withColumn("_salt", saltCol(salts, col("_row_token")))
          .drop("_row_token")
        cold.unionByName(hotRows)
    }
}
