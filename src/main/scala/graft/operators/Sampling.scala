package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable corpus splitting — train/val/test
  * assignment that is (a) a pure function of the row id (stable under
  * re-partitioning, re-runs, incremental appends: a document NEVER
  * migrates between splits when the corpus grows), and (b) reproducible
  * in any engine, because the hash is md5 — not an engine-private hash
  * like xxhash64's seed variant or `rand()`.
  *
  * Mechanism: the first 8 hex chars of `md5(id)` are a uniform draw
  * from [0, 2^32) in hex; comparing that STRING against fixed hex
  * thresholds (lexicographic = numeric for fixed-width lowercase hex)
  * needs no hex-to-int parsing, which not every engine can express.
  * Scan-speed, shuffle-free, codegen'd.
  */
object Sampling {

  /** 8-hex-char bucket of an id column, uniform over [0, 2^32). */
  def hashBucket(id: Column): Column =
    substring(md5(id.cast("string")), 1, 8)

  /** Threshold of a cumulative fraction as fixed-width lowercase hex.
    * Exactly 1.0 → "g", which sorts above every hex bucket so a strict
    * `<` keeps ALL rows with no keep-all special case downstream; rates
    * within 2^-32 of 1.0 floor to "ffffffff" and drop that one bucket —
    * the strict-threshold semantics, uniformly. */
  private[operators] def hexThreshold(cumFraction: Double): String =
    if (cumFraction >= 1.0) "g"
    else f"${math.floor(cumFraction * 4294967296.0).toLong}%08x"

  /** Split assignment: `splits` are (name, fraction) in priority order,
    * fractions summing to ≤ 1 (any remainder falls into the last split).
    *
    * @return `df` with an extra `split` column. */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.map(_._2).sum <= 1.0 + 1e-9, "fractions must sum to <= 1")
    val bucket = hashBucket(col(idCol))
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val assign = splits.init.zip(cum.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), c)) =>
        val cond = bucket < lit(hexThreshold(c))
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
    }.fold(lit(splits.last._1))(_.otherwise(splits.last._1))
    df.withColumn("split", assign)
  }

  /** Mixture-weight downsampling: keep each row with a per-group rate
    * (e.g. web 0.3, wiki 1.0) decided by the same md5 draw as
    * [[hashSplit]] — a pure function of the row id, so the sample is
    * stable under re-partitioning and appends, and a row kept at rate r
    * stays kept at any rate ≥ r (nested samples, the property mixture
    * re-weighting sweeps rely on). Rates ride the plan as a chained
    * literal CASE (the rate table is pipeline config, not data): pure
    * scan-speed filter, no join, no shuffle.
    *
    * Rows with a NULL id are always dropped, at every rate including
    * 1.0: they have no hash draw, so keeping them would make the sample
    * depend on the rate boundary instead of being a pure function of the
    * id (and would break the nested-samples property at r = 1.0).
    *
    * @param rates (group value, keep fraction in [0,1]); groups absent
    *              from the list fall back to `defaultRate`. */
  def weightedSample(df: DataFrame, idCol: String, groupCol: String,
                     rates: Seq[(String, Double)],
                     defaultRate: Double = 1.0): DataFrame = {
    require(rates.forall { case (_, r) => r >= 0.0 && r <= 1.0 },
      "rates must be in [0,1]")
    val rate = rates.foldLeft(Option.empty[Column]) {
      case (acc, (g, r)) =>
        val t = lit(hexThreshold(r))
        Some(acc.fold(when(col(groupCol) === g, t))(_.when(col(groupCol) === g, t)))
    }.fold(lit(hexThreshold(defaultRate)))(_.otherwise(hexThreshold(defaultRate)))
    // rate 1.0 thresholds at "g" > every hex bucket (hexThreshold), so
    // one strict `<` covers keep-all and fractional rates alike
    df.filter(col(idCol).isNotNull && hashBucket(col(idCol)) < rate)
  }

  /** Epoch-weighted repetition (UPsampling) — the materialized
    * counterpart of [[weightedSample]] for rates ABOVE 1: every non-null
    * row yields `floor(rate)` copies, plus one more when its md5 draw
    * falls under the fractional remainder, so a source at rate 2.6 is
    * seen ~2.6× per epoch (the standard small-source repeat factor).
    * Rates < 1 degrade to exactly [[weightedSample]]'s keep decision
    * (floor 0 + the same threshold draw), so one operator serves a whole
    * mixture spec. Pure function of (id, group): append-stable,
    * partition-invariant, monotone in rate (the copy set at a lower rate
    * is a prefix of the copy set at a higher rate). NULL ids are dropped
    * at every rate ([[weightedSample]] contract).
    *
    * Scale shape: scan-speed literal CASE + `array_repeat` explode — no
    * join, no shuffle; output size is Σ rate_g·|g| by construction.
    *
    * @return input columns + `copy_idx` (0-based). */
  def upsample(df: DataFrame, idCol: String, groupCol: String,
               rates: Seq[(String, Double)],
               defaultRate: Double = 1.0): DataFrame = {
    require((defaultRate +: rates.map(_._2)).forall(r => r >= 0.0 && r <= 1000.0),
      "rates must be in [0, 1000]")
    // `pos`/`col` are posexplode's fixed output names and `_n_copies` is
    // the internal counter — an input column with any of these names
    // would be silently renamed or dropped by the plumbing below.
    val reserved = Seq("copy_idx", "pos", "col", "_n_copies")
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"input must not have columns named ${reserved.mkString("/")}; found: ${clash.mkString(", ")}")
    def whole(r: Double): Int = math.floor(r).toInt
    def fracThr(r: Double): String = hexThreshold(r - math.floor(r))
    val wholeCol = rates.foldLeft(Option.empty[Column]) {
      case (acc, (g, r)) =>
        Some(acc.fold(when(col(groupCol) === g, whole(r)))(
          _.when(col(groupCol) === g, whole(r))))
    }.fold(lit(whole(defaultRate)))(_.otherwise(whole(defaultRate)))
    val thrCol = rates.foldLeft(Option.empty[Column]) {
      case (acc, (g, r)) =>
        Some(acc.fold(when(col(groupCol) === g, fracThr(r)))(
          _.when(col(groupCol) === g, fracThr(r))))
    }.fold(lit(fracThr(defaultRate)))(_.otherwise(fracThr(defaultRate)))
    val n = wholeCol + when(hashBucket(col(idCol)) < thrCol, 1).otherwise(0)
    df.filter(col(idCol).isNotNull)
      .withColumn("_n_copies", n)
      .select(col("*"), posexplode(array_repeat(lit(true), col("_n_copies"))))
      .withColumnRenamed("pos", "copy_idx")
      .drop("col", "_n_copies")
  }

  /** Deterministic engine-portable shuffle key for training-order
    * randomization: `md5(seed ":" id)` — a new seed is a new global
    * order, the same seed reproduces it anywhere. */
  def shuffleKey(id: Column, seed: Long): Column =
    md5(concat(lit(s"$seed:"), id.cast("string")))

  /** Globally shuffled corpus WITHOUT a single-task global sort: range
    * partition on the [[shuffleKey]], sort within partitions — reading
    * partition files in index order yields the exact global md5 order,
    * but the sort work is distributed (each task sorts ~|corpus|/P
    * rows). The standard pre-training data-order shuffle at corpus
    * scale. */
  def shuffled(df: DataFrame, idCol: String, seed: Long,
               numPartitions: Int = 0): DataFrame = {
    val keyed = df.filter(col(idCol).isNotNull)
      .withColumn("shuffle_key", shuffleKey(col(idCol), seed))
    val ranged =
      if (numPartitions > 0)
        keyed.repartitionByRange(numPartitions, col("shuffle_key"), col(idCol))
      else keyed.repartitionByRange(col("shuffle_key"), col(idCol))
    ranged.sortWithinPartitions(col("shuffle_key"), col(idCol))
  }

  /** Per-source keep rates for a token budget with temperature-weighted
    * mixing — the arithmetic between a corpus profile
    * (`corpus_source_profile`) and [[weightedSample]]. Target share of
    * source s is `tokens_s^alpha / Σ tokens^alpha` (alpha = 1: keep
    * natural proportions; alpha < 1: flatten toward uniform, the
    * standard multilingual-LM upsampling curve; alpha = 0: uniform).
    * Rates are capped at 1.0 — this operator only downsamples — and the
    * budget a capped source cannot absorb is redistributed over the
    * uncapped ones (waterfilling, ≤ |sources| rounds), so the expected
    * kept-token total meets `tokenBudget` whenever the corpus can supply
    * it. Driver-side pure function of the (small) profile — the profile
    * frame is per-source, never corpus-sized.
    *
    * @return (source, rate) with Σ tokens_s·rate_s = min(budget,
    *         Σ tokens_s) up to float rounding, rates in [0, 1]. */
  def ratesForTokenBudget(profile: Seq[(String, Long)], tokenBudget: Long,
                          alpha: Double = 1.0): Seq[(String, Double)] = {
    require(alpha >= 0.0, "alpha must be >= 0")
    require(profile.forall(_._2 >= 0), "token counts must be >= 0")
    val live = profile.filter(_._2 > 0)
    if (live.isEmpty || tokenBudget <= 0) return profile.map(_._1 -> 0.0)
    var uncapped = live
    var capped = Map.empty[String, Double]
    var budget = math.min(tokenBudget.toDouble, live.map(_._2.toDouble).sum)
    val tMax = live.map(_._2.toDouble).max
    // Per-round weights: pow(t/tMax, α) is scale-invariant (only ratios
    // matter) and stays in (0, 1], so an extreme α cannot overflow pow
    // to Infinity. The opposite corner — every remaining weight
    // UNDERFLOWS to 0.0 (a tiny source at α ≫ 1 after the big ones
    // capped) — falls back to proportional weights rather than dividing
    // by a zero wSum into NaN.
    def weights(us: Seq[(String, Long)]): Seq[(String, Long, Double)] = {
      val w = us.map { case (s, t) => (s, t, math.pow(t.toDouble / tMax, alpha)) }
      if (w.map(_._3).sum > 0) w
      else us.map { case (s, t) => (s, t, t.toDouble / tMax) }
    }
    // waterfill: hand each capped source its whole mass (rate 1.0) and
    // re-split the remaining budget over the rest by temperature weight
    var done = false
    while (!done) {
      val ws = weights(uncapped)
      val wSum = ws.map(_._3).sum
      val over = ws.filter { case (_, t, w) => budget * w / wSum >= t.toDouble }
      if (over.isEmpty) done = true
      else {
        capped ++= over.map(_._1 -> 1.0)
        budget -= over.map(_._2.toDouble).sum
        uncapped = uncapped.filterNot { case (s, _) => capped.contains(s) }
        done = uncapped.isEmpty
      }
    }
    val ws = weights(uncapped)
    val wSum = ws.map(_._3).sum
    val open = ws.map { case (s, t, w) =>
      s -> (budget * w / wSum / t.toDouble)
    }.toMap
    profile.map { case (s, t) =>
      s -> (if (t <= 0) 0.0 else capped.getOrElse(s, open.getOrElse(s, 0.0)))
    }
  }

  /** Exact uniform sample of `n` rows from the whole frame — "give me
    * exactly 100k held-out documents", deterministic and engine-portable
    * (same md5 priority as [[hashSplit]]). Runs as [[capPerGroup]] on a
    * constant group: two salted window phases, so no driver-side merge of
    * n rows (a bare `orderBy(md5).limit(n)` is TakeOrdered — fine for
    * thousands, driver-bound for millions) and no single-task global
    * sort. Returns `rank_in_sample` (1 = smallest draw).
    *
    * `salts` bounds phase-2 input at salts×n rows in ONE task — pick
    * salts so that slice sorts stay comfortable (default 64 ⇒ phase 1
    * sorts ~|df|/64 per task). */
  def takeUniform(df: DataFrame, idCol: String, n: Int,
                  salts: Int = 64): DataFrame = {
    // improbable constant-group name: a user column named "all" must
    // survive the round trip untouched
    val g = "__graft_take_uniform_group"
    capPerGroup(df.withColumn(g, lit(1)), idCol, g, n, salts)
      .withColumnRenamed("rank_in_group", "rank_in_sample")
      .drop(g)
  }

  /** Exact per-group cap: keep the `k` highest-priority rows of each
    * group, priority = (md5(id), id) — i.e. a deterministic uniform
    * without-replacement sample of size ≤ k per group (the per-domain /
    * per-source cap every crawl pipeline runs).
    *
    * Two-phase so a mega-group cannot serialize into one task: rows are
    * first split into `salts` pseudo-random slices (a pure function of
    * the id — no rand()), each slice takes its local top-k, and the
    * final top-k runs over the ≤ salts×k per-group survivors. Both
    * phases are windows, but phase 1 sorts groups of ~|group|/salts and
    * phase 2 sorts ≤ salts×k rows — bounded regardless of skew. Exact:
    * the group's true top-k is a subset of the union of slice top-ks. */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String,
                  k: Int, salts: Int = 16): DataFrame = {
    require(k >= 1 && salts >= 1)
    val prio = md5(col(idCol).cast("string"))
    val slice = pmod(xxhash64(col(idCol)), lit(salts))
    val w1 = Window.partitionBy(col(groupCol), slice)
      .orderBy(prio, col(idCol))
    val w2 = Window.partitionBy(col(groupCol)).orderBy(prio, col(idCol))
    // null ids have no hash draw and would sort FIRST (nulls-first md5,
    // arbitrary tie order) — dropped, same policy as [[weightedSample]]
    df.filter(col(idCol).isNotNull)
      .withColumn("rn_slice", row_number().over(w1))
      .filter(col("rn_slice") <= k)
      .withColumn("rank_in_group", row_number().over(w2).cast("long"))
      .filter(col("rank_in_group") <= k)
      .drop("rn_slice")
  }
}
