package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * - [[cosine]]: sequential double fold over the arrays (zip_with +
  *   aggregate) — element order fixed, so the result is bit-deterministic
  *   and matches an oracle computing the same fold.
  * - [[bruteForceTopK]]: exact baseline — broadcast the (small) query set
  *   against the corpus, per-query top-k via window. Scales linearly in
  *   corpus size: the corpus is never shuffled, only scanned.
  * - [[lshTopK]]: scale path — deterministic random-hyperplane signatures;
  *   candidates must share one of `tables` sub-signatures, then exact
  *   re-rank. Turns the all-pairs product into bucket-local work.
  */
object Similarity {

  import graft.functions.VectorExpressions.vecDot

  /** Deterministic double-precision cosine similarity of two float array
    * columns (sequential codegen'd fold ⇒ reproducible bit-for-bit). */
  def cosine(a: Column, b: Column): Column =
    vecDot(a, b) / (sqrt(vecDot(a, a)) * sqrt(vecDot(b, b)))

  /** Euclidean norm of a float array column. */
  def vecNorm(a: Column): Column = sqrt(vecDot(a, a))

  /** Exact top-k cosine neighbors for each query vector.
    * `queries` is expected to be small (broadcast side). Norms are
    * precomputed per vector — one dot per pair instead of three.
    *
    * ZERO-NORM CONTRACT (whole cosine family: this, [[lshTopK]],
    * [[ivfTopK]], [[cosineDedup]], [[semanticDedup]],
    * [[semanticContamination]]): an all-zero vector has no direction, so
    * cosine against it is 0/0 = NaN — and Spark orders NaN ABOVE every
    * double and passes `NaN >= threshold`, so one failed-encoder vector
    * would flood every report (and diverge from engines that yield
    * NULL). Zero-norm vectors are therefore excluded from cosine
    * scoring up front on both sides. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     qId: String = "vec_id", qVec: String = "embedding",
                     cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).as("query_id"), col(qVec).as("qv"),
      vecNorm(col(qVec)).as("qn")).filter(col("qn") > 0)
    val c = graft.operators.Par.widen(corpus)
      .select(col(cId).as("cand_id"), col(cVec).as("cv"),
        vecNorm(col(cVec)).as("cn")).filter(col("cn") > 0)
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("sim", vecDot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** Scale-aware LSH multi-probe budget: the query-side probe width a
    * corpus of `n` vectors needs to hold recall as its auto bucket code
    * ([[lshProbeFrames]] bitsPerTable = 0) deepens. Calibrated on the
    * measured decay/recovery curve (tools.AnnScaleProbe, BASELINE.md
    * third-decade ladder): at 2M vectors the fixed probes=32 cap decays
    * to 0.64 recall@5 while 128→0.92 and 512→1.00 at FLAT wall clock
    * (multi-probe is query-side only; the corpus still inserts once per
    * table). `n >> 12` lands at 488 ≈ the measured 1.00 point for 2M and
    * keeps every gate-scale corpus (n ≤ 131k) at the floor of 32 — the
    * exact geometry the sf0.01 oracles replay. Clamped to 4096 — and
    * the clamp region is MEASURED, not extrapolated: at 20M vectors
    * (r17 probe, target/ann_probe_r17_20M.txt) the clamped 4096 width
    * recalls 1.000 at wall flat against the smaller budgets (the
    * corpus-side candidate join dominates there). Same discipline as
    * the SimHash width derivation in [[Dedup]]: budgets derive from
    * index size, not from a constant tuned at test scale. */
  def autoLshProbes(n: Long): Int =
    math.max(32L, math.min(4096L, n >> 12)).toInt

  /** Scale-aware PQ exact-rerank frontier: keepR grows with the corpus
    * because ADC quantization noise displaces true top-k items by a
    * rank margin that widens with the number of distractors inside the
    * noise band — but only until the displacement SATURATES; past that
    * the binder is the IVF cell-recall ceiling, which no rerank budget
    * can buy back. ⌈√n⌉ fits the measured sub-saturation plateaus
    * (tools.AnnScaleProbe): n=500 plateaus at keepR ≤ 40 (the 8·k
    * floor binds for n ≤ (8k)² — 1,600 at k=5 — which covers the
    * sf0.01 oracle corpus, so the gate replays the old fixed-40
    * geometry), n=20k at ~100 (√n = 142), n=200k at ~100 (√n = 448).
    * The saturation cap is 160·k — 20× the floor — the measured point
    * past which recall improves at NO decade up to 20M vectors:
    * n=2M needs exactly 800 for the 0.960 cell ceiling (600→0.940,
    * r18 sweep, target/ann_probe_r18_2M.txt), n=20M is at the ceiling
    * from 400 (r17+r18 probes). The uncapped √n term overspent wall
    * linearly past the ceiling — 161.4 s at AUTO=4473 vs 15.9 s at 400
    * for identical 0.960 recall at 20M (r17 finding) — and would reach
    * 31,623 per query at 1B vectors; the cap keeps per-query rerank
    * O(k) at every scale beyond 2.56M·(k/5)². Every term is a pure
    * integer function of count(*) and k (√ is IEEE-correctly-rounded
    * in any engine), so the DuckDB oracle re-derives the same budget
    * from the replayed list rows. Calibrated at k=5 on nlist=16/
    * nprobe=12, and RE-VALIDATED at nlist=64 in both ceiling regimes
    * (r19, `target/ann_probe_r19_nlist64.txt`, 2M vectors): at
    * nprobe=48 (75% of cells) recall saturates at exactly 160·k
    * (0.920/0.940 below 800, 0.960 at it, flat to 8× beyond), and at
    * nprobe=12 (18.75%) the cell ceiling binds at 0.600 with rerank
    * flat 200→3200 — the saturation is a property of the ADC noise
    * band (m/ksub), not the coarse geometry. The k-proportional shape
    * of the cap extrapolates the floor's; callers whose store needs a
    * larger budget pass `rerank` explicitly (every serve path treats
    * rerank ≠ 0 as authoritative and skips AUTO). */
  def autoPqRerank(n: Long, k: Int): Int =
    math.max(8L * k,
      math.min(160L * k, math.ceil(math.sqrt(n.toDouble)).toLong)).toInt

  /** `nBits`-bit random-hyperplane signature of a float-array column:
    * bit p = sign of the dot product with a hyperplane whose components
    * are `xxhash64-derived uniforms in [-1, 1)` — no RNG state, so
    * signatures are reproducible across runs and executors. Codegen'd
    * ([[graft.functions.VectorExpressions.RhpSignature]]). */
  def rhpSignature(vec: Column, nBits: Int): Column =
    graft.functions.VectorExpressions.rhpSig(vec, nBits)

  /** `tables` LSH bucket keys of a vector column as slim
    * (id, table, bucket) rows — the ONLY columns that ride the ×`tables`
    * explode and the bucket join; full float arrays are re-attached after
    * candidate dedup (same discipline as [[Dedup.minhashLsh]]'s
    * shingle-free join sides). Buckets come from the per-table code
    * array ([[graft.functions.VectorExpressions.RhpTableBuckets]] —
    * bit-identical to the old packed-signature extraction within 64
    * total bits, and CORRECT beyond it, where the packed long silently
    * OR-folded planes ≥ 64 onto earlier bits). */
  private def slimBuckets(df: DataFrame, id: String, vec: String,
                          outId: String, tables: Int, bitsPerTable: Int): DataFrame =
    df.select(col(id).as(outId),
        posexplode(graft.functions.VectorExpressions.rhpTableBuckets(
          col(vec), tables, bitsPerTable)))
      .withColumnRenamed("col", "bucket").withColumnRenamed("pos", "table")

  /** ANN top-k: candidates share at least one of `tables` sub-signatures
    * (bitsPerTable bits each), exact cosine re-rank within candidates.
    *
    * @param maxBucket skew guard for degenerate corpus buckets (a large
    *   cluster of identical/near-zero embeddings lands whole in one RHP
    *   bucket — exactly what a dirty corpus contains). Corpus rows are
    *   ranked per (table, bucket) and grouped into blocks of `maxBucket`;
    *   each query probes the block addressed by `xxhash64(query_id)` and
    *   its successor, so per-bucket work is |Q|×2·maxBucket instead of
    *   |Q|×|bucket|. Buckets of ≤ maxBucket corpus rows have one block —
    *   the query meets the WHOLE bucket and results are identical to the
    *   unguarded join; only oversized buckets degrade, to a deterministic
    *   2·maxBucket-candidate sample per query (ANN contract: misses are
    *   allowed, emitted rows stay exact).
    * @param bitsPerTable bucket-code depth; 0 = AUTO — size the code to
    *   the corpus (⌈log2(n / (maxBucket/2))⌉) so expected occupancy
    *   stays ~maxBucket/2 and the block guard is inactive in the
    *   non-degenerate regime AT ANY SCALE. A fixed shallow code's
    *   buckets grow with the corpus until the guard samples them
    *   (recall decays — measured 0.16 @5 at the 20k-row probe for the
    *   fixed 3-bit geometry); a fixed deep code starves small corpora.
    *   Auto + multi-probe is the scale-stable pairing.
    * @param probes multi-probe width: each query additionally inspects
    *   the probes−1 buckets reachable by flipping its least-confident
    *   signature bits per table ([[graft.functions.VectorExpressions
    *   .RhpMultiProbe]], query-directed Lv et al. ordering) — recall at
    *   deep codes for query-side-only cost (the corpus still inserts
    *   once per table). 1 = exact-bucket behavior; 0 = AUTO — derive
    *   the width from the corpus size ([[autoLshProbes]]) so the
    *   default budget holds recall as the auto bucket code deepens
    *   with corpus growth, instead of decaying like any constant. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              tables: Int = 8, bitsPerTable: Int = 8,
              maxBucket: Int = 64, probes: Int = 0): DataFrame = {
    val f = lshProbeFrames(queries, corpus, tables, bitsPerTable,
      maxBucket, probes)
    lshRerankTopK(queries, corpus, f.qProbes, f.cBuckets, k)
  }

  /** The probe-geometry frames of [[lshTopK]] — (qProbes, cBuckets). */
  final case class LshFrames(qProbes: DataFrame, cBuckets: DataFrame)

  /** The signature/addressing stage of [[lshTopK]], exposed so callers
    * can PERSIST both frames and replay the exact probe geometry later
    * (incremental serving, and an engine-independent oracle: everything
    * DOWNSTREAM — the (table, bucket, blk) candidate join, pair dedup,
    * exact cosine re-rank, top-k — is plain relational algebra over the
    * raw embeddings, while the RHP signature and block-addressing
    * xxhash64 kernels live only here).
    *
    *  - `cBuckets`: (table, bucket, cand_id, blk) — one row per corpus
    *    vector per table; `blk` is the rank-block within the bucket
    *    (skew guard, see [[lshTopK]] @maxBucket).
    *  - `qProbes`: (table, bucket, query_id, blk) — one row per
    *    (query, probed bucket, addressed block). */
  def lshProbeFrames(queries: DataFrame, corpus: DataFrame,
                     tables: Int, bitsPerTable: Int,
                     maxBucket: Int, probes: Int): LshFrames = {
    require(probes >= 0, "probes must be >= 0 (0 = AUTO)")
    val qBase = queries.select(col("vec_id").as("query_id"), col("embedding").as("queryv"),
      vecNorm(col("embedding")).as("queryn")).filter(col("queryn") > 0)
    val cBase = Par.widen(corpus)
      .select(col("vec_id").as("cand_id"), col("embedding").as("candv"),
        vecNorm(col("embedding")).as("candn")).filter(col("candn") > 0).persist()
    CacheRegistry.track(cBase)
    // one count serves both derivations (bucket depth + probe budget);
    // skipped entirely when the caller pins both knobs
    val n = if (bitsPerTable > 0 && probes > 0) -1L else cBase.count()
    val bpt = if (bitsPerTable > 0) bitsPerTable
      else math.max(1, math.ceil(math.log(
        math.max(1.0, n.toDouble / math.max(1, maxBucket / 2)))
        / math.log(2.0)).toInt)
    val probesEff = if (probes > 0) probes else autoLshProbes(n)

    val wBucket = Window.partitionBy("table", "bucket").orderBy("cand_id")
    // persisted: consumed by both the block-count aggregate and the
    // candidate join — otherwise the signature explode + bucket window
    // sort over |corpus|×tables rows runs twice (cf. cosineDedup)
    val cBuckets = slimBuckets(cBase, "cand_id", "candv", "cand_id", tables, bpt)
      .withColumn("blk", floor((row_number().over(wBucket) - 1) / lit(maxBucket)))
      .persist()
    CacheRegistry.track(cBuckets)
    // per-(table, bucket) block count — at most tables × 2^bpt
    // rows, broadcast onto the query side to address a block
    val nBlks = cBuckets.groupBy("table", "bucket")
      .agg((max(col("blk")) + 1).as("nblk"))
    LshFrames(lshQueryProbes(qBase, tables, bpt, probesEff, nBlks), cBuckets)
  }

  /** The QUERY side of the LSH probe geometry — per (query, table):
    * probesEff buckets (multi-probe bit flips), each addressed to two
    * rank blocks. Shared by the one-workload path ([[lshProbeFrames]])
    * and the standing-index serve path ([[lshTopKPrepared]]); `qBase`
    * is the (query_id, queryv, queryn)-shaped frame. */
  private def lshQueryProbes(qBase: DataFrame, tables: Int, bpt: Int,
                             probesEff: Int, nBlks: DataFrame): DataFrame = {
    val qBuckets =
      if (probesEff <= 1)
        slimBuckets(qBase, "query_id", "queryv", "query_id", tables, bpt)
      else qBase.select(col("query_id"),
          posexplode(graft.functions.VectorExpressions.rhpMultiProbe(
            col("queryv"), tables, bpt, probesEff)))
        .select(col("query_id"),
          floor(col("pos") / lit(probesEff)).cast("int").as("table"),
          col("col").as("bucket"))
        // duplicate probe buckets appear when 2^bpt < probes (pad) — a
        // dup would double-join its bucket's rows
        .dropDuplicates("query_id", "table", "bucket")
    qBuckets
      .join(broadcast(nBlks), Seq("table", "bucket"))
      .select(col("table"), col("bucket"), col("query_id"),
        explode(array(
          pmod(xxhash64(col("query_id")), col("nblk")),
          pmod(xxhash64(col("query_id")) + 1, col("nblk")))).as("blk"))
  }

  /** The candidate-join + exact-rerank stage of [[lshTopK]] over
    * [[lshProbeFrames]]-shaped frames: join probes to corpus blocks on
    * (table, bucket, blk), dedup pairs, exact cosine, per-query top-k. */
  def lshRerankTopK(queries: DataFrame, corpus: DataFrame,
                    qProbes: DataFrame, cBuckets: DataFrame,
                    k: Int): DataFrame = {
    val qBase = queries.select(col("vec_id").as("query_id"), col("embedding").as("queryv"),
      vecNorm(col("embedding")).as("queryn")).filter(col("queryn") > 0)
    // constructed EXACTLY like lshProbeFrames' persisted cBase (incl.
    // Par.widen) so that when the two run in one job the cache manager
    // substitutes the cached frame instead of re-scanning the corpus
    // for the rerank join; standalone (persisted-geometry) callers get
    // the same widened scan the family uses everywhere
    val cBase = Par.widen(corpus)
      .select(col("vec_id").as("cand_id"), col("embedding").as("candv"),
        vecNorm(col("embedding")).as("candn")).filter(col("candn") > 0)
    val cands = qProbes.join(cBuckets, Seq("table", "bucket", "blk"))
      .filter(col("query_id") =!= col("cand_id"))
      .select("query_id", "cand_id")
      .dropDuplicates("query_id", "cand_id")
      .join(broadcast(qBase), "query_id")
      .join(cBase, "cand_id")
      .withColumn("sim", vecDot(col("queryv"), col("candv")) / (col("queryn") * col("candn")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    cands.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** A STANDING LSH index — the escape hatch for the measured
    * third-decade LSH wall (BASELINE.md): the corpus-side geometry
    * build (signature explode ×tables + bucket rank window — 480M rows
    * and 200-290 s at 20M vectors, the dominant term) is a pure
    * function of (corpus, tables, bitsPerTable, maxBucket) and belongs
    * in a persisted artifact like `ivfPrepare`'s lists, built once per
    * corpus instead of once per workload. Serving against it pays only
    * the query-side probes plus the candidate join + rerank floor.
    *
    *  - `cBuckets`: (table, bucket, cand_id, blk) — slim index rows
    *    (the ×tables explosion holds 20 B/row, never the vectors);
    *  - `nBlks`: (table, bucket, nblk) block counts — ≤ tables·2^bpt
    *    rows, broadcast at serve so no per-serve aggregate rescans the
    *    index;
    *  - the frozen geometry (tables, bitsPerTable, maxBucket) and the
    *    indexed-corpus count, from which the serve-side AUTO probe
    *    budget re-derives ([[autoLshProbes]]).
    *
    * Guidance unchanged: for NEW stores beyond ~10M vectors prefer
    * IVF/PQ — their candidate scan prunes by cent_id instead of
    * scanning a ×tables-exploded index. The standing index is for
    * corpora already committed to LSH geometry (repeated batch
    * workloads over one corpus). */
  final case class LshIndex(cBuckets: DataFrame, nBlks: DataFrame,
                            tables: Int, bitsPerTable: Int,
                            maxBucket: Int, nCorpus: Long)

  /** Build the corpus side of the LSH geometry as reusable frames (the
    * [[lshProbeFrames]] corpus half, without the per-workload persist).
    * bitsPerTable 0 = AUTO from the corpus size, frozen into the
    * index. */
  def lshPrepare(corpus: DataFrame, tables: Int = 24,
                 bitsPerTable: Int = 0, maxBucket: Int = 64): LshIndex = {
    val cBase = Par.widen(corpus)
      .select(col("vec_id").as("cand_id"), col("embedding").as("candv"),
        vecNorm(col("embedding")).as("candn")).filter(col("candn") > 0)
    val n = cBase.count()
    val bpt = if (bitsPerTable > 0) bitsPerTable
      else math.max(1, math.ceil(math.log(
        math.max(1.0, n.toDouble / math.max(1, maxBucket / 2)))
        / math.log(2.0)).toInt)
    val wBucket = Window.partitionBy("table", "bucket").orderBy("cand_id")
    val cBuckets = slimBuckets(cBase, "cand_id", "candv", "cand_id", tables, bpt)
      .withColumn("blk", floor((row_number().over(wBucket) - 1) / lit(maxBucket)))
    val nBlks = cBuckets.groupBy("table", "bucket")
      .agg((max(col("blk")) + 1).as("nblk"))
    LshIndex(cBuckets, nBlks, tables, bpt, maxBucket, n)
  }

  /** Persist an LSH index: bucket rows first, block counts derived from
    * the WRITTEN frame (the signature kernel runs exactly once), the
    * one-row meta frame LAST as the completion marker — a crashed save
    * never loads. */
  def saveLshIndex(spark: SparkSession, path: String, corpus: DataFrame,
                   tables: Int = 24, bitsPerTable: Int = 0,
                   maxBucket: Int = 64): Unit = {
    val idx = lshPrepare(corpus, tables, bitsPerTable, maxBucket)
    idx.cBuckets.write.mode("overwrite").parquet(s"$path/buckets")
    spark.read.parquet(s"$path/buckets").groupBy("table", "bucket")
      .agg((max(col("blk")) + 1).as("nblk"))
      .write.mode("overwrite").parquet(s"$path/blocks")
    import spark.implicits._
    Seq((idx.tables, idx.bitsPerTable, idx.maxBucket, idx.nCorpus))
      .toDF("tables", "bits_per_table", "max_bucket", "n_corpus")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** True when a completed [[saveLshIndex]] artifact exists. */
  def lshIndexExists(spark: SparkSession, path: String): Boolean =
    Artifacts.exists(spark, s"$path/meta")

  def loadLshIndex(spark: SparkSession, path: String): LshIndex = {
    val m = spark.read.parquet(s"$path/meta").head()
    LshIndex(spark.read.parquet(s"$path/buckets"),
      spark.read.parquet(s"$path/blocks"),
      m.getAs[Int]("tables"), m.getAs[Int]("bits_per_table"),
      m.getAs[Int]("max_bucket"), m.getAs[Long]("n_corpus"))
  }

  /** [[lshTopK]] against a standing index (the `ivfTopKPrepared`
    * discipline): identical results to the monolithic call at the same
    * geometry — the query side re-derives its AUTO probe budget from
    * the INDEXED corpus count, so a pinned index serves the same
    * geometry forever. `corpus` is the raw (vec_id, embedding) frame
    * the index was built from (vectors live there, never in the
    * index). */
  def lshTopKPrepared(idx: LshIndex, queries: DataFrame, corpus: DataFrame,
                      k: Int, probes: Int = 0): DataFrame = {
    require(probes >= 0, "probes must be >= 0 (0 = AUTO)")
    val probesEff = if (probes > 0) probes else autoLshProbes(idx.nCorpus)
    val qBase = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("queryv"),
      vecNorm(col("embedding")).as("queryn")).filter(col("queryn") > 0)
    lshRerankTopK(queries, corpus,
      lshQueryProbes(qBase, idx.tables, idx.bitsPerTable, probesEff,
        idx.nBlks),
      idx.cBuckets, k)
  }

  /** IVF (inverted-file) ANN: coarse-quantize the corpus into `nlist`
    * centroid cells, search only the `nprobe` cells nearest each query,
    * exact cosine re-rank inside them — the classic
    * cluster-prune-then-rerank scale path (complements [[lshTopK]]).
    *
    * Centroids start as a deterministic pseudo-random corpus sample — the
    * `nlist` vectors with the smallest `xxhash64(vec_id)` — fetched with
    * one `TakeOrderedAndProject` pass (per-partition top-k, driver merge:
    * no count() job, no shuffle), then refined with `trainIters` Lloyd
    * (k-means) iterations whose shuffles carry only (cell, dim,
    * fixed-point partial sum) rows, and carried into the assignment
    * expression the way a broadcast var rides into a task. Assignment of
    * every corpus vector to its cell is MAP-SIDE
    * ([[graft.functions.VectorExpressions.NearestCentroids]]): at 100 TB
    * the corpus is scanned once and never shuffled by the assignment —
    * the only corpus-wide movement left is the final per-query top-k
    * window over candidates inside probed cells, which `nprobe/nlist`
    * bounds.
    *
    * CONTRACT: `queries` is the small side (an online query batch /
    * evaluation set — thousands, not a corpus). With the default
    * `broadcastProbes=true` the probes (queries × nprobe rows) are
    * broadcast so the corpus streams past them without shuffling; a query
    * set too large to broadcast would OOM, so for corpus-scale query sets
    * pass `broadcastProbes=false` to let AQE pick the join strategy (the
    * corpus side then shuffles on cent_id — graceful, not wrong). */
  /** Deterministic distributed k-means: seed centroids are the `nlist`
    * corpus vectors with the smallest `xxhash64(vec_id)` (one
    * `TakeOrderedAndProject` pass — per-partition top-k, driver merge: no
    * count() job, no shuffle), refined with `trainIters` Lloyd
    * iterations. Assignment stays MAP-SIDE (NearestCentroids rides into
    * the scan); the mean recompute explodes to (cell, dim, value) and
    * partial-aggregates before the shuffle, so the exchange carries one
    * (cell, dim, partial-sum, count) row per task — corpus bytes never
    * shuffle. Sums are fixed-point decimal(38,0) (order-independent
    * exact integer adds with ~2^126 headroom — a long would silently
    * wrap for hot cells of unnormalized embeddings at corpus scale), so
    * the trained centroids — and therefore cell assignments — are
    * bit-deterministic across runs/partitionings. Driver holds only
    * nlist ids + nlist×dim floats.
    *
    * Shared by [[ivfTopK]] (coarse quantizer) and [[semanticDedup]]
    * (cluster stage); public so callers issuing several queries over the
    * same corpus can train once and pass the artifact back in via those
    * operators' `pretrained` parameter (a centroid set is corpus
    * metadata, like a BPE merge table — retraining it per query
    * double-charges the trainer). */
  /** Cell-assignment strategy boundary: up to this many centroids the
    * per-row dense scan (O(nlist × dim),
    * [[graft.functions.VectorExpressions.NearestCentroids]]) is cheap;
    * beyond it assignment goes through the two-level coarse → children
    * index ([[coarseIndex]] +
    * [[graft.functions.VectorExpressions.TwoLevelNearestCentroid]]),
    * O((√nlist·probes + probed children) × dim) — map-side either way. */
  val DenseAssignLimit: Int = 4096

  /** Driver-side deterministic Lloyd over the FINE centroids (nlist rows —
    * driver-sized by construction): √nlist coarse centroids + the fine
    * indices hanging under each. Seeds follow [[trainCentroids]]'
    * discipline (smallest xxhash64(cent_id) first) so the index is
    * bit-deterministic for a given centroid set. */
  private[graft] def coarseIndex(centIds: Array[Long],
      cents: Array[Array[Float]]): (Array[Array[Float]], Array[Array[Int]]) = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val nlist = cents.length
    val ncoarse = math.max(1, math.ceil(math.sqrt(nlist.toDouble)).toInt)
    val dim = cents(0).length
    def norm(c: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    def cosTo(f: Int, coarse: Array[Float], fn: Double, cn: Double): Double = {
      var d = 0.0; var i = 0
      while (i < dim) { d += cents(f)(i).toDouble * coarse(i).toDouble; i += 1 }
      d / (fn * cn)
    }
    val fineNorm = cents.map(norm)
    var coarse = centIds.indices
      .sortBy(i => (XXH64.hashLong(centIds(i), 42L), centIds(i)))
      .take(ncoarse).map(i => cents(i).clone()).toArray
    val assign = new Array[Int](nlist)
    def assignAll(): Unit = {
      val cn = coarse.map(norm)
      var f = 0
      while (f < nlist) {
        var best = 0
        var bs = Double.NegativeInfinity
        var c = 0
        while (c < coarse.length) {
          val s = cosTo(f, coarse(c), fineNorm(f), cn(c))
          if (s > bs) { bs = s; best = c }
          c += 1
        }
        assign(f) = best
        f += 1
      }
    }
    for (_ <- 1 to 3) {
      assignAll()
      val sums = Array.fill(coarse.length)(new Array[Double](dim))
      val cnt = new Array[Int](coarse.length)
      var f = 0
      while (f < nlist) {
        val c = assign(f); cnt(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += cents(f)(i).toDouble; i += 1 }
        f += 1
      }
      coarse = coarse.indices.map { c =>
        if (cnt(c) == 0) coarse(c)
        else sums(c).map(x => (x / cnt(c)).toFloat)
      }.toArray
    }
    assignAll()
    val groups = assign.zipWithIndex.groupBy(_._1)
    val nonEmpty = groups.keys.toArray.sorted
    (nonEmpty.map(coarse), nonEmpty.map(c => groups(c).map(_._2).sorted))
  }

  /** Map-side top-`keep` cell assignment against a trained centroid set:
    * dense scan up to [[DenseAssignLimit]] cells, two-level index beyond
    * (max(2, keep) coarse probes). Null on dim mismatch either way. */
  private[operators] def cellsAssign(vec: Column, centIds: Array[Long],
      cents: Array[Array[Float]], keep: Int): Column =
    if (centIds.length <= DenseAssignLimit)
      graft.functions.VectorExpressions.nearestCentroids(vec, centIds, cents, keep)
    else {
      val (coarse, children) = coarseIndex(centIds, cents)
      graft.functions.VectorExpressions.twoLevelNearestCentroids(
        vec, coarse, children, centIds, cents,
        coarseProbes = math.max(2, keep), keep = keep)
    }

  /** Single-cell variant of [[cellsAssign]]. */
  private[operators] def cellAssign(vec: Column, centIds: Array[Long],
      cents: Array[Array[Float]]): Column =
    element_at(cellsAssign(vec, centIds, cents, keep = 1), 1)

  /** Rows Lloyd iterates over: training beyond this cap is a full-corpus
    * scan per iteration for no centroid-quality gain — a quantizer is
    * trained on a bounded deterministic sample (standard IVF practice)
    * and ASSIGNMENT still covers every vector. At test scale (≤ cap)
    * training is exact and unchanged. */
  val TrainSampleCap: Long = 100000L

  def trainCentroids(corpus: DataFrame, nlist: Int,
      trainIters: Int): (Array[Long], Array[Array[Float]]) = {
    // deterministic hash-gate sample, no sort/shuffle: keep vec_ids in
    // the smallest 1/k hash stratum (the seed order below stays a
    // subset of it, so seeds are sample members)
    val n = corpus.count()
    val train0 = if (n <= TrainSampleCap) corpus
      else {
        val k = math.max(1L, n / TrainSampleCap)
        corpus.filter(pmod(xxhash64(col("vec_id")), lit(k)) === 0)
      }
    val train = train0.select(col("vec_id"), col("embedding"))
    val centroidRows = train
      .select(col("vec_id").cast("long").as("cent_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nlist)
      .collect()
    val centIds = centroidRows.map(_.getLong(0))
    var cents = centroidRows.map(_.getSeq[Float](1).toArray)

    for (_ <- 1 to trainIters)
      cents = lloydStep(train, centIds, cents)
    (centIds, cents)
  }

  /** One Lloyd update: assign every `embedding` row to its nearest
    * centroid, recompute cell means. Cells with no members keep their
    * previous centroid. Driver traffic is nlist×dim aggregate rows —
    * model-sized, never corpus-sized. */
  private[operators] def lloydStep(train: DataFrame, centIds: Array[Long],
      cents: Array[Array[Float]]): Array[Array[Float]] = {
    // cell is computed in its OWN projection, once per vector — a
    // combined select(cellAssign, posexplode) re-evaluates the
    // nlist×dim assignment scan per EXPLODED row (dim× the work;
    // measured 76 s → 4 s at 20k×157)
    val assigned = train.select(
      cellAssign(col("embedding"), centIds, cents).as("cell"),
      col("embedding"))
      .select(col("cell"), posexplode(col("embedding")))
      // dim-mismatched vectors assign to a null cell by contract
      // (NearestCentroids) — drop them from training like the inverted
      // lists drop them at query time
      .where(col("cell").isNotNull)
    val meanRows = assigned
      .groupBy(col("cell"), col("pos"))
      .agg(sum(floor(col("col").cast("double") * (1L << 24))
        .cast("decimal(38,0)")).as("s"),
        count(lit(1)).as("n"))
      .collect()
    val byCell = meanRows.groupBy(_.getLong(0))
    val idIndex = centIds.zipWithIndex.toMap
    val next = cents.map(_.clone())
    byCell.foreach { case (cell, rows) =>
      val ci = idIndex(cell)
      rows.foreach { r =>
        val pos = r.getInt(1)
        next(ci)(pos) =
          (r.getDecimal(2).doubleValue() / (1L << 24) / r.getLong(3)).toFloat
      }
    }
    next
  }

  /** Corpus side of the IVF index, computed ONCE: each vector assigned
    * to its single nearest cell, norm precomputed, zero-norm vectors
    * excluded (cosine family contract — bruteForceTopK). Persist (or
    * parquet) the result and serve many query batches against it via
    * [[ivfTopKPrepared]] — the ANN sibling of [[Dedup.minhashPrepare]]:
    * at 100 TB each corpus vector is assigned exactly once, at index
    * build, never re-assigned per query batch. */
  def ivfPrepare(corpus: DataFrame,
                 quantizer: (Array[Long], Array[Array[Float]])): DataFrame = {
    val (centIds, cents) = quantizer
    Par.widen(corpus)
      .select(col("vec_id").as("cand_id"), col("embedding").as("candv"),
        vecNorm(col("embedding")).as("candn"),
        element_at(cellsAssign(col("embedding"), centIds, cents, 1), 1)
          .as("cent_id"))
      .filter(col("candn") > 0)
  }

  /** Append a new vector batch to a PERSISTED inverted-list store
    * ([[ivfPrepare]] output written as parquet) without retraining or
    * rebuilding: the batch is assigned under the SAME frozen quantizer
    * and its list rows appended. A growing corpus pays one assignment
    * scan per batch — not a full index rebuild — until
    * [[ivfDriftProbe]] signals that the quantizer no longer fits the
    * incoming distribution and a retrain is worth the rebuild.
    *
    * Parquet append is atomic at file granularity and each appended
    * file carries only new `cand_id`s, so readers mid-append see a
    * consistent (if slightly stale) index. Caller owns id-uniqueness,
    * same as [[ivfPrepare]]. */
  def ivfAppend(listsPath: String, batch: DataFrame,
                quantizer: (Array[Long], Array[Array[Float]])): Unit = {
    ivfPrepare(batch, quantizer)
      .write.mode("append").parquet(listsPath)
    batch.sparkSession.catalog.refreshByPath(listsPath)
  }

  /** The trained centroid set as a (cent_id, centv, centn) frame —
    * nlist rows, broadcast-sized by construction. */
  private def centroidFrame(spark: SparkSession,
      quantizer: (Array[Long], Array[Array[Float]])): DataFrame = {
    import spark.implicits._
    val (ids, cents) = quantizer
    ids.indices.map(i => (ids(i), cents(i).toSeq))
      .toDF("cent_id", "centv")
      .withColumn("centn", vecNorm(col("centv")))
  }

  /** Per-cell occupancy and mean assignment similarity of prepared
    * inverted lists: (cent_id, n, mean_sim, share). One broadcast join
    * against the nlist-row centroid frame + one groupBy — the store's
    * health dashboard, and [[ivfDriftProbe]]'s baseline. */
  def ivfCellStats(lists: DataFrame,
      quantizer: (Array[Long], Array[Array[Float]])): DataFrame = {
    val cf = broadcast(centroidFrame(lists.sparkSession, quantizer))
    val withSim = lists.join(cf, Seq("cent_id"))
      .withColumn("sim",
        vecDot(col("candv"), col("centv")) / (col("candn") * col("centn")))
    withSim.groupBy(col("cent_id"))
      .agg(count(lit(1)).as("n"), avg(col("sim")).as("mean_sim"))
      // grand total via an unpartitioned window — the frame here is the
      // POST-AGGREGATION per-centroid stats (≤ nlist rows, model-sized),
      // so the single-partition WindowExec the driver log warns about is
      // deliberate and scale-safe; a driver-collected total would
      // re-execute the join+aggregate a second time instead
      .withColumn("share", col("n") / sum(col("n")).over(Window.partitionBy()))
  }

  /** What [[ivfDriftProbe]] measured, and its verdict. All inputs to
    * `drifted` ride along so a pipeline can log/alert on the raw
    * numbers, not just the boolean. */
  final case class IvfDriftReport(
      index_n: Long, batch_n: Long,
      mean_sim_index: Double, mean_sim_batch: Double, sim_drop: Double,
      hot_share_index: Double, hot_share_batch: Double,
      reassign_fraction: Double, drifted: Boolean)

  /** Decide whether a frozen quantizer still fits an incoming batch —
    * the retrain signal for an [[ivfAppend]]-maintained store. Three
    * independent drift symptoms, any one of which fires `drifted`:
    *
    *  1. assignment-quality drop: the batch's mean cosine to its
    *     assigned centroid falls more than `simDropTol` RELATIVELY
    *     below the index's own mean (the quantizer's cells are
    *     centered on the OLD mass, so a shifted distribution lands
    *     farther from every centroid). Relative, because the index's
    *     in-sample mean carries the quantizer's training bias — a
    *     held-out same-distribution batch always sits somewhat lower,
    *     proportionally to the corpus' absolute sim scale;
    *  2. cell skew: the batch's hottest-cell share exceeds `skewTol` ×
    *     max(index hot share, 1/nlist) — a shifted batch collapses
    *     into the few cells nearest its new mode, degrading those
    *     lists toward brute-force scans. Only significant when the hot
    *     cell holds at least `minHotCount` batch vectors: a handful of
    *     vectors sharing a cell is sampling noise, not a mode;
    *  3. reassignment churn: after ONE Lloyd step over a bounded
    *     deterministic sample of index ∪ batch (the step a retrain
    *     would take first), more than `reassignTol` of the batch flips
    *     cells — centroids want to move toward the new mass.
    *
    * Cost: two assignment scans of the batch, one of the index's
    * candv column, one sampled Lloyd step — all map-side against
    * broadcast centroids; driver traffic stays model-sized. */
  def ivfDriftProbe(lists: DataFrame, batch: DataFrame,
      quantizer: (Array[Long], Array[Array[Float]]),
      simDropTol: Double = 0.5, skewTol: Double = 3.0,
      reassignTol: Double = 0.2, minHotCount: Long = 32L): IvfDriftReport = {
    val (centIds, cents) = quantizer
    val spark = lists.sparkSession
    def stats(prepared: DataFrame): (Long, Double, Double) = {
      val r = ivfCellStats(prepared, quantizer)
        .agg(sum(col("n")), sum(col("n") * col("mean_sim")),
          max(col("share")))
        .head()
      val n = if (r.isNullAt(0)) 0L else r.getLong(0)
      (n,
        if (n == 0) 0.0 else r.getDouble(1) / n,
        if (r.isNullAt(2)) 0.0 else r.getDouble(2))
    }
    val preparedBatch = ivfPrepare(batch, quantizer).persist()
    try {
      val (indexN, simIndex, hotIndex) = stats(lists)
      val (batchN, simBatch, hotBatch) = stats(preparedBatch)
      // one Lloyd step over index ∪ batch, sampled exactly like
      // trainCentroids — then count batch vectors that would move
      val union = lists.select(col("cand_id").as("vec_id"),
          col("candv").as("embedding"))
        .unionByName(preparedBatch.select(col("cand_id").as("vec_id"),
          col("candv").as("embedding")))
      val total = indexN + batchN
      val sample = if (total <= TrainSampleCap) union
        else {
          val k = math.max(1L, total / TrainSampleCap)
          union.filter(pmod(xxhash64(col("vec_id")), lit(k)) === 0)
        }
      val moved = lloydStep(sample, centIds, cents)
      val flips = preparedBatch.filter(
        element_at(cellsAssign(col("candv"), centIds, cents, 1), 1) =!=
          element_at(cellsAssign(col("candv"), centIds, moved, 1), 1)).count()
      val reassign = if (batchN == 0) 0.0 else flips.toDouble / batchN
      val simDrop = simIndex - simBatch
      val skewBar = skewTol * math.max(hotIndex, 1.0 / centIds.length)
      IvfDriftReport(indexN, batchN, simIndex, simBatch, simDrop,
        hotIndex, hotBatch, reassign,
        drifted = simDrop > simDropTol * math.abs(simIndex) ||
          (hotBatch > skewBar && hotBatch * batchN >= minHotCount) ||
          reassign > reassignTol)
    } finally preparedBatch.unpersist()
  }

  /** Probed-cell SCAN pruning for the prepared/serve paths: collect the
    * probe frame's distinct cell ids — bounded by |queries| × nprobe,
    * model-sized under the serve contract — and push them as an `In`
    * filter on the lists side. Semantically a no-op (the cell equi-join
    * already restricts to probed cells; results are bit-identical), but
    * the predicate reaches a parquet-backed store as `PushedFilters`,
    * so a cent_id-clustered layout ([[graft.streaming.StreamingAnalytics
    * .compactVectorIndex]] sorts files by cell) skips every unprobed
    * row group instead of scanning the whole index — at production cell
    * counts (nlist ≫ nprobe) the serve scan reads a few percent of the
    * store. Opt-in (`pruneCells`) because it costs one model-sized
    * collect per call: the serve intakes enable it; one-shot in-memory
    * paths keep the plain join. */
  private def pruneToCells(lists: DataFrame, probes: DataFrame): DataFrame = {
    val cells = probes.select("cent_id").distinct().collect().map(_.get(0))
    if (cells.isEmpty) lists.filter(lit(false))
    else lists.filter(col("cent_id").isin(cells: _*))
  }

  /** Probe prepared inverted lists ([[ivfPrepare]]) with a query frame:
    * nprobe nearest cells per query, candidates joined cell-wise, exact
    * cosine, top-k per query. Bit-identical to [[ivfTopK]] with the same
    * quantizer — the monolithic path delegates here.
    * @param pruneCells push the probed cell set down to the lists scan
    *   ([[pruneToCells]]) — enable on persisted cent_id-clustered
    *   stores (the serve intakes do) */
  def ivfTopKPrepared(lists: DataFrame, queries: DataFrame, k: Int,
                      quantizer: (Array[Long], Array[Array[Float]]),
                      nprobe: Int = 4,
                      broadcastProbes: Boolean = true,
                      pruneCells: Boolean = false): DataFrame = {
    val (centIds, cents) = quantizer
    val probes = queries.select(col("vec_id").as("query_id"), col("embedding").as("queryv"),
      vecNorm(col("embedding")).as("queryn"),
      explode(cellsAssign(col("embedding"), centIds, cents, nprobe)).as("cent_id"))
      .filter(col("queryn") > 0)
    // cand appears in exactly one cell and probe cells are distinct per
    // query, so (query_id, cand_id) pairs are already unique — no dedup.
    val probesSide = if (broadcastProbes) broadcast(probes) else probes
    val listsSide = if (pruneCells) pruneToCells(lists, probes) else lists
    val cands = listsSide.join(probesSide, Seq("cent_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("sim", vecDot(col("queryv"), col("candv")) / (col("queryn") * col("candn")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    cands.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              broadcastProbes: Boolean = true,
              trainIters: Int = 2,
              pretrained: Option[(Array[Long], Array[Array[Float]])] = None): DataFrame = {
    // a pretrained quantizer probed as if it had a different cell count
    // silently changes recall — refuse the mismatch instead (trainIters
    // is inherently unused with pretrained; nlist must agree)
    require(pretrained.forall(_._2.length == nlist),
      s"pretrained quantizer has ${pretrained.get._2.length} cells but nlist=$nlist")
    val quantizer =
      pretrained.getOrElse(trainCentroids(corpus, nlist, trainIters))
    ivfTopKPrepared(ivfPrepare(corpus, quantizer), queries, k, quantizer,
      nprobe, broadcastProbes)
  }

  /** IVF ANN with a QUANTIZED first stage — the memory-bandwidth scale
    * path: inverted lists carry int8 BINARY codes (4× smaller than float
    * arrays; max-abs symmetric quantization, whose per-vector scales
    * cancel in cosine), candidates are scored with an integer dot kernel
    * ([[graft.functions.VectorExpressions.Int8VecDot]]), the top
    * `rerank` per query re-rank EXACTLY against the float vectors, and
    * only those (query, cand) pairs ever touch full-precision data.
    *
    * Emitted sims are therefore exact (same contract as [[ivfTopK]] —
    * the quantization error can only cost recall at the rerank frontier,
    * never corrupt an emitted score), so the ann_ivf violations harness
    * applies unchanged. Same probe/broadcast contract as [[ivfTopK]];
    * assignment dispatches through [[cellsAssign]] (two-level past
    * [[DenseAssignLimit]]).
    *
    * @param rerank first-stage candidates kept per query (0 → 4·k). */
  def ivfTopKQuantized(queries: DataFrame, corpus: DataFrame, k: Int,
                       nlist: Int = 16, nprobe: Int = 4, rerank: Int = 0,
                       broadcastProbes: Boolean = true, trainIters: Int = 2,
                       pretrained: Option[(Array[Long], Array[Array[Float]])] = None): DataFrame = {
    require(pretrained.forall(_._2.length == nlist),
      s"pretrained quantizer has ${pretrained.get._2.length} cells but nlist=$nlist")
    val keepR = if (rerank > 0) rerank else 4 * k
    val (centIds, cents) =
      pretrained.getOrElse(trainCentroids(corpus, nlist, trainIters))
    import graft.functions.VectorExpressions.{int8Quantize, int8VecDot}

    // SLIM inverted lists: id + cell + int8 code; float vectors and norms
    // stay behind in the corpus scan until the rerank join. A non-zero
    // float vector always quantizes to a non-zero code (its max element
    // maps to ±127), so the int8 norms below are never 0.
    val lists = corpus
      .select(col("vec_id").as("cand_id"),
        cellAssign(col("embedding"), centIds, cents).as("cent_id"),
        int8Quantize(col("embedding")).as("cq"))
      .filter(col("cent_id").isNotNull &&
        vecNorm(col("embedding")) > 0) // zero-norm: cosine-family contract
      .withColumn("cqn", sqrt(int8VecDot(col("cq"), col("cq")).cast("double")))
    val probes = queries
      .select(col("vec_id").as("query_id"),
        int8Quantize(col("embedding")).as("qq"),
        explode(cellsAssign(col("embedding"), centIds, cents, nprobe)).as("cent_id"),
        vecNorm(col("embedding")).as("queryn"))
      .filter(col("queryn") > 0)
      .withColumn("qqn", sqrt(int8VecDot(col("qq"), col("qq")).cast("double")))
      .drop("queryn")
    val probesSide = if (broadcastProbes) broadcast(probes) else probes
    val wApprox = Window.partitionBy("query_id")
      .orderBy(col("asim").desc, col("cand_id"))
    val frontier = lists.join(probesSide, Seq("cent_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("asim",
        int8VecDot(col("qq"), col("cq")).cast("double") / (col("qqn") * col("cqn")))
      .withColumn("arank", row_number().over(wApprox))
      .filter(col("arank") <= keepR)
      .select("query_id", "cand_id")
    // exact rerank: floats attach only to the ≤ keepR×|queries| frontier
    val qFull = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("queryv"), vecNorm(col("embedding")).as("queryn"))
    val cFull = corpus.select(col("vec_id").as("cand_id"),
      col("embedding").as("candv"), vecNorm(col("embedding")).as("candn"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    frontier
      .join(broadcast(qFull), "query_id")
      .join(cFull, "cand_id")
      .withColumn("sim",
        vecDot(col("queryv"), col("candv")) / (col("queryn") * col("candn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** The assignment/probe geometry frames of [[ivfTopK]] — (lists,
    * probes). */
  final case class IvfFrames(lists: DataFrame, probes: DataFrame)

  /** The cell-geometry stage of [[ivfTopK]], exposed so callers can
    * PERSIST both frames and replay the exact probe geometry later —
    * same rationale as [[lshProbeFrames]]: the k-means assignment
    * kernels ([[cellAssign]]/[[cellsAssign]], float argmax over the
    * trained centroids) live only here, while everything DOWNSTREAM —
    * the cell-wise candidate join, exact cosine, top-k — is plain
    * relational algebra over the raw embeddings, expressible in any
    * SQL engine.
    *
    *  - `lists`: (cent_id, cand_id) — each corpus vector in its ONE
    *    nearest cell ([[ivfPrepare]] minus the float payloads; zero-norm
    *    and dim-mismatched vectors excluded, the cosine-family /
    *    null-cell contract).
    *  - `probes`: (query_id, cent_id) — `nprobe` nearest cells per
    *    query, zero-norm queries excluded. */
  def ivfGeomFrames(queries: DataFrame, corpus: DataFrame,
                    quantizer: (Array[Long], Array[Array[Float]]),
                    nprobe: Int): IvfFrames = {
    val (centIds, cents) = quantizer
    val lists = ivfPrepare(corpus, quantizer)
      .filter(col("cent_id").isNotNull)
      .select("cent_id", "cand_id")
    val probes = queries
      .select(col("vec_id").as("query_id"),
        vecNorm(col("embedding")).as("queryn"),
        explode(cellsAssign(col("embedding"), centIds, cents, nprobe)).as("cent_id"))
      .filter(col("queryn") > 0)
      .select("query_id", "cent_id")
    IvfFrames(lists, probes)
  }

  /** The candidate-join + exact-rerank stage of [[ivfTopK]] over
    * [[ivfGeomFrames]]-shaped frames (fresh or replayed from storage).
    * Bit-identical to [[ivfTopKPrepared]] with the geometry the frames
    * were built from: same candidates, same float vectors joined back
    * by id, same (sim DESC, cand_id) tie-break. */
  def ivfTopKFromGeom(lists: DataFrame, probes: DataFrame,
                      queries: DataFrame, corpus: DataFrame,
                      k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("queryv"), vecNorm(col("embedding")).as("queryn"))
    val c = corpus.select(col("vec_id").as("cand_id"),
      col("embedding").as("candv"), vecNorm(col("embedding")).as("candn"))
    val cands = lists.join(broadcast(probes), Seq("cent_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .join(broadcast(q), "query_id")
      .join(c, "cand_id")
      .withColumn("sim",
        vecDot(col("queryv"), col("candv")) / (col("queryn") * col("candn")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    cands.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** The geometry frames of [[ivfTopKQuantized]] — (lists, probes),
    * each carrying the int8 code twice: `cq`/`qq` as the BINARY column
    * the Spark scoring kernel ([[graft.functions.VectorExpressions
    * .Int8VecDot]]) consumes, and `cq_i`/`qq_i` as a plain int array
    * for engine-independent replay (an external SQL engine re-derives
    * the integer dot scores from the array twin — both columns come
    * from the same max-abs formula, [[quantizeInt8]]'s
    * floor(x·127/maxabs + 0.5) pure-IEEE math). */
  final case class IvfqFrames(lists: DataFrame, probes: DataFrame)

  /** The cell + int8-code geometry stage of [[ivfTopKQuantized]] —
    * persistable/replayable like [[ivfGeomFrames]]; the quantized
    * first-stage scoring and exact rerank downstream are pure integer /
    * double arithmetic over these frames and the raw embeddings. */
  def ivfqGeomFrames(queries: DataFrame, corpus: DataFrame,
                     quantizer: (Array[Long], Array[Array[Float]]),
                     nprobe: Int): IvfqFrames = {
    import graft.functions.VectorExpressions.int8Quantize
    val (centIds, cents) = quantizer
    val lists = Par.widen(corpus)
      .select(col("vec_id").as("cand_id"),
        cellAssign(col("embedding"), centIds, cents).as("cent_id"),
        int8Quantize(col("embedding")).as("cq"),
        quantizeInt8(col("embedding"))._2.as("cq_i"))
      .filter(col("cent_id").isNotNull &&
        vecNorm(col("embedding")) > 0)
      .select("cent_id", "cand_id", "cq", "cq_i")
    val probes = queries
      .select(col("vec_id").as("query_id"),
        int8Quantize(col("embedding")).as("qq"),
        quantizeInt8(col("embedding"))._2.as("qq_i"),
        explode(cellsAssign(col("embedding"), centIds, cents, nprobe)).as("cent_id"),
        vecNorm(col("embedding")).as("queryn"))
      .filter(col("queryn") > 0)
      .select("query_id", "cent_id", "qq", "qq_i")
    IvfqFrames(lists, probes)
  }

  /** The quantized-frontier + exact-rerank stage of [[ivfTopKQuantized]]
    * over [[ivfqGeomFrames]]-shaped frames. Bit-identical to the
    * monolithic path with the same geometry: int8 norms recomputed from
    * the codes (exact integer sums), same keepR frontier cut on
    * (asim DESC, cand_id), same exact float rerank. */
  def ivfqTopKFromGeom(lists: DataFrame, probes: DataFrame,
                       queries: DataFrame, corpus: DataFrame,
                       k: Int, rerank: Int = 0): DataFrame = {
    import graft.functions.VectorExpressions.int8VecDot
    val keepR = if (rerank > 0) rerank else 4 * k
    val listsN = lists
      .withColumn("cqn", sqrt(int8VecDot(col("cq"), col("cq")).cast("double")))
    val probesN = probes
      .withColumn("qqn", sqrt(int8VecDot(col("qq"), col("qq")).cast("double")))
    val wApprox = Window.partitionBy("query_id")
      .orderBy(col("asim").desc, col("cand_id"))
    val frontier = listsN.join(broadcast(probesN), Seq("cent_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("asim",
        int8VecDot(col("qq"), col("cq")).cast("double") / (col("qqn") * col("cqn")))
      .withColumn("arank", row_number().over(wApprox))
      .filter(col("arank") <= keepR)
      .select("query_id", "cand_id")
    val qFull = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("queryv"), vecNorm(col("embedding")).as("queryn"))
    val cFull = corpus.select(col("vec_id").as("cand_id"),
      col("embedding").as("candv"), vecNorm(col("embedding")).as("candn"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    frontier
      .join(broadcast(qFull), "query_id")
      .join(cFull, "cand_id")
      .withColumn("sim",
        vecDot(col("queryv"), col("candv")) / (col("queryn") * col("candn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  // ------------------------------------------------------------- IVF-PQ ----

  /** Train per-subspace product-quantization codebooks with the same
    * distributed-Lloyd discipline as [[trainCentroids]]: deterministic
    * hash-stratum training sample (≤ [[TrainSampleCap]] rows),
    * hash-ordered seed selection, decimal fixed-point mean updates so
    * the result is bit-deterministic regardless of partitioning, and
    * driver traffic bounded by the MODEL size (m·ksub·dsub floats per
    * Lloyd round — never corpus-sized). Assignment inside training is
    * L2 ([[graft.functions.VectorExpressions.PqEncode]]) — the metric
    * the encoder itself uses, so training and serving can't disagree.
    *
    * The model is tiny (m·ksub·dsub floats) but the compression is the
    * point: a 64-dim float vector (256 B) becomes m sub-byte codes
    * (16 B packed at m=16, ksub=64) in the inverted lists — at 100 TB
    * the PQ lists hold ~16× more vectors per executor-memory byte than
    * float lists, and candidate scoring is O(m) table lookups per pair
    * ([[graft.functions.VectorExpressions.PqAdc]]) instead of O(dim)
    * multiplies. */
  def trainPqCodebooks(corpus: DataFrame, m: Int, ksub: Int,
                       trainIters: Int = 2): Array[Array[Array[Float]]] = {
    val dim = corpus.select(size(col("embedding")).as("d")).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into m=$m subspaces")
    val dsub = dim / m
    val n = corpus.count()
    // persisted: the m seed collects + m·trainIters Lloyd aggregates
    // each consume this frame — without the cache that is ~50 corpus
    // re-scans at the m=16 defaults for one model-sized artifact
    val train0 = (if (n <= TrainSampleCap) corpus
      else {
        val k = math.max(1L, n / TrainSampleCap)
        corpus.filter(pmod(xxhash64(col("vec_id")), lit(k)) === 0)
      }).select(col("vec_id"), col("embedding")).persist()
    try {
      (0 until m).toArray.map { j =>
        val sub = train0.select(col("vec_id"),
          slice(col("embedding"), j * dsub + 1, dsub).as("embedding"))
        var cb = sub.orderBy(xxhash64(col("vec_id")), col("vec_id"))
          .limit(ksub).collect().map(_.getSeq[Float](1).toArray)
        // an under-filled codebook would desync every consumer that
        // hard-codes the ksub LUT stride (the SQL oracles, PqLut/PqAdc)
        // into an opaque hash mismatch — fail loudly at train time
        require(cb.length == ksub,
          s"PQ training needs >= ksub=$ksub vectors; corpus sample has ${cb.length}")
        for (_ <- 1 to trainIters) cb = pqLloydStep(sub, cb)
        cb
      }
    } finally train0.unpersist()
  }

  /** One L2 Lloyd update over ONE subspace — [[lloydStep]]'s fixed-point
    * mean discipline with [[graft.functions.VectorExpressions.PqEncode]]
    * (m=1) as the assignment kernel. Empty cells keep their centroid. */
  private def pqLloydStep(sub: DataFrame,
                          cb: Array[Array[Float]]): Array[Array[Float]] = {
    import graft.functions.VectorExpressions.pqEncode
    val assigned = sub
      .select(element_at(pqEncode(col("embedding"), Array(cb)), 1).as("cell"),
        col("embedding"))
      .where(col("cell").isNotNull)
      .select(col("cell"), posexplode(col("embedding")))
    val meanRows = assigned
      .groupBy(col("cell"), col("pos"))
      .agg(sum(floor(col("col").cast("double") * (1L << 24))
        .cast("decimal(38,0)")).as("s"),
        count(lit(1)).as("n"))
      .collect()
    val next = cb.map(_.clone())
    meanRows.foreach { r =>
      next(r.getInt(0))(r.getInt(1)) =
        (r.getDecimal(2).doubleValue() / (1L << 24) / r.getLong(3)).toFloat
    }
    next
  }

  /** The geometry frames of IVF-PQ — (lists, probes), both SLIM:
    *
    *  - `lists`: (cent_id, cand_id, codes, rn) — each corpus vector in
    *    its one nearest coarse cell (cosine, the IVF quantizer), its
    *    m-byte PQ code word, and its reconstruction norm. No floats
    *    ride the index: at scale this is the frame that stays resident
    *    while the raw embeddings stay behind in the corpus scan.
    *  - `probes`: (query_id, cent_id, lut, qn) — nprobe coarse cells
    *    per query plus the per-query ADC lookup table (m·ksub doubles,
    *    built once per query, reused across every candidate).
    *
    * Zero-norm vectors, dim-mismatched vectors, and the (degenerate)
    * zero-reconstruction case are excluded, extending the cosine-family
    * contract ([[bruteForceTopK]]): a vector whose reconstruction is
    * the zero vector has no defined approximate cosine. */
  def pqGeomFrames(queries: DataFrame, corpus: DataFrame,
                   quantizer: (Array[Long], Array[Array[Float]]),
                   codebooks: Array[Array[Array[Float]]],
                   nprobe: Int): PqFrames =
    PqFrames(pqPrepare(corpus, quantizer, codebooks),
      pqProbes(queries, quantizer, codebooks, nprobe))

  /** The corpus side of the PQ index alone — one assignment+encode scan
    * producing the slim (cent_id, cand_id, codes, rn) list rows. At
    * index-build time each corpus vector is encoded exactly ONCE;
    * persist the result and serve query batches against it
    * ([[pqTopKFromGeom]] / streaming pqSearchIntake). */
  def pqPrepare(corpus: DataFrame,
                quantizer: (Array[Long], Array[Array[Float]]),
                codebooks: Array[Array[Array[Float]]]): DataFrame = {
    import graft.functions.VectorExpressions.{pqEncode, pqReconNorm}
    val (centIds, cents) = quantizer
    Par.widen(corpus)
      .select(col("vec_id").as("cand_id"),
        cellAssign(col("embedding"), centIds, cents).as("cent_id"),
        pqEncode(col("embedding"), codebooks).as("codes"),
        vecNorm(col("embedding")).as("cn"))
      .filter(col("cent_id").isNotNull && col("codes").isNotNull &&
        col("cn") > 0)
      .withColumn("rn", pqReconNorm(col("codes"), codebooks))
      .filter(col("rn") > 0)
      .select("cent_id", "cand_id", "codes", "rn")
  }

  /** Append a new vector batch to a PERSISTED PQ list store
    * ([[pqPrepare]] output written as parquet) under the SAME frozen
    * coarse quantizer and codebooks — the PQ sibling of [[ivfAppend]]:
    * a growing corpus pays one assignment+encode scan per batch, never
    * an index rebuild, and [[ivfDriftProbe]] over the shared coarse
    * cells still signals when a retrain is worth the rebuild. Same
    * consistency contract as [[ivfAppend]] (file-granular atomic
    * append, caller owns id-uniqueness). */
  def pqAppend(listsPath: String, batch: DataFrame,
               quantizer: (Array[Long], Array[Array[Float]]),
               codebooks: Array[Array[Array[Float]]]): Unit = {
    pqPrepare(batch, quantizer, codebooks)
      .write.mode("append").parquet(listsPath)
    batch.sparkSession.catalog.refreshByPath(listsPath)
  }

  /** The query side of [[pqGeomFrames]] alone — (query_id, cent_id,
    * lut, qn) — so a SERVING path (streaming micro-batches against a
    * persisted PQ index) can build fresh probes per batch without
    * re-deriving the corpus lists. */
  def pqProbes(queries: DataFrame,
               quantizer: (Array[Long], Array[Array[Float]]),
               codebooks: Array[Array[Array[Float]]],
               nprobe: Int): DataFrame = {
    import graft.functions.VectorExpressions.pqLut
    val (centIds, cents) = quantizer
    queries
      .select(col("vec_id").as("query_id"),
        pqLut(col("embedding"), codebooks).as("lut"),
        explode(cellsAssign(col("embedding"), centIds, cents, nprobe)).as("cent_id"),
        vecNorm(col("embedding")).as("qn"))
      .filter(col("qn") > 0 && col("lut").isNotNull)
      .select("query_id", "cent_id", "lut", "qn")
  }

  /** The ADC-frontier + exact-rerank stage of IVF-PQ over
    * [[pqGeomFrames]]-shaped frames: approximate cosine =
    * ADC(lut, codes) / (‖q‖·‖x̂‖) ranks a keepR frontier per query on
    * (asim DESC, cand_id); raw float vectors attach only to the
    * ≤ keepR·|queries| frontier for the exact rerank — the same tail
    * contract as [[ivfqTopKFromGeom]].
    *
    * @param rerank keepR frontier size; 0 = AUTO — derive from the
    *   index size ([[autoPqRerank]]: max(8·k, min(160·k, ⌈√n⌉)), the
    *   measured plateau fit capped at the measured displacement
    *   saturation) with one count over the slim list rows.
    *   Serve loops that hold a pinned index snapshot should resolve the
    *   budget once and pass it explicitly (see streaming
    *   pqSearchIntake) rather than pay the count per batch. */
  def pqTopKFromGeom(lists: DataFrame, probes: DataFrame,
                     queries: DataFrame, corpus: DataFrame,
                     k: Int, rerank: Int = 0,
                     broadcastProbes: Boolean = true,
                     pruneCells: Boolean = false): DataFrame = {
    import graft.functions.VectorExpressions.pqAdc
    // AUTO budget derives from the INDEX size — always the full lists,
    // never the pruned subset
    val keepR = if (rerank > 0) rerank else autoPqRerank(lists.count(), k)
    val listsSide = if (pruneCells)
      pruneToCells(lists, probes.select("cent_id")) else lists
    val wApprox = Window.partitionBy("query_id")
      .orderBy(col("asim").desc, col("cand_id"))
    // PQ probes are the heaviest probe frame in the family — each row
    // carries an m·ksub-double LUT (32 KB at m=16, ksub=256), so a
    // large OFFLINE query batch can exceed a sane broadcast; pass
    // broadcastProbes=false there to let AQE pick the join (same escape
    // hatch as ivfTopKPrepared/ivfqTopK). Serve-sized batches keep the
    // broadcast default. The rerank-side qFull broadcast stays
    // unconditional, matching the ivfq sibling: raw query floats are
    // ~two orders of magnitude lighter per row than the LUT.
    val probesSide = if (broadcastProbes) broadcast(probes) else probes
    val frontier = listsSide.join(probesSide, Seq("cent_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("asim",
        pqAdc(col("lut"), col("codes")) / (col("qn") * col("rn")))
      .withColumn("arank", row_number().over(wApprox))
      .filter(col("arank") <= keepR)
      .select("query_id", "cand_id")
    val qFull = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("queryv"), vecNorm(col("embedding")).as("queryn"))
    val cFull = corpus.select(col("vec_id").as("cand_id"),
      col("embedding").as("candv"), vecNorm(col("embedding")).as("candn"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    frontier
      .join(broadcast(qFull), "query_id")
      .join(cFull, "cand_id")
      .withColumn("sim",
        vecDot(col("queryv"), col("candv")) / (col("queryn") * col("candn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rank"))
  }

  /** The geometry frames of IVF-PQ — (lists, probes). */
  final case class PqFrames(lists: DataFrame, probes: DataFrame)

  /** Symmetric per-vector int8 quantization (max-abs scaling) — the
    * standard 4× storage/bandwidth reduction for corpus-scale embedding
    * stores; dequantized values sit within scale/2 of the original.
    * Deterministic: `floor(x*127/maxabs + 0.5)` is pure IEEE double math,
    * identical in any engine.
    * @return (scale, quantized int array) — scale = maxabs/127. */
  def quantizeInt8(vec: Column): (Column, Column) = {
    val maxabs = array_max(transform(vec, x => abs(x.cast("double"))))
    val q = when(maxabs > 0,
      transform(vec, x =>
        floor(x.cast("double") * 127.0 / maxabs + 0.5).cast("int")))
      .otherwise(transform(vec, _ => lit(0)))
    (maxabs / 127.0, q)
  }

  /** Embedding near-duplicate pairs (cosine ≥ threshold) — LSH-bucketed
    * self-join + exact verify, with the same two scale guards as
    * [[Dedup.minhashLsh]]:
    *
    *  - the bucket join is SLIM — only (vec_id, table, bucket) rows ride
    *    the ×`tables` explode and the exchange; full float arrays are
    *    joined back onto the deduped candidate pairs (each vector
    *    shuffles once per pair side, not once per table);
    *  - pairing within a (table, bucket) group is restricted to a
    *    bounded rank span ENFORCED IN THE JOIN KEY (block-keyed): a
    *    group of ≤ maxBucket+1 vectors still produces ALL its pairs,
    *    while a degenerate hot bucket — e.g. a large cluster of
    *    identical embeddings, which lands whole in one RHP bucket in
    *    every table — degrades to a linear chain of rank-neighbors
    *    (O(group × maxBucket) compute) instead of evaluating the full
    *    O(group²) product before any filter could prune it. Every
    *    member of an oversized duplicate cluster still surfaces in at
    *    least one pair, so the downstream connected-components step
    *    collapses the cluster exactly as all-pairs would.
    */
  def cosineDedup(df: DataFrame, threshold: Double,
                  tables: Int = 8, bitsPerTable: Int = 8,
                  maxBucket: Int = 64): DataFrame = {
    // zero-norm vectors excluded (cosine family contract — bruteForceTopK)
    val base = Par.widen(df).select(col("vec_id"), col("embedding"),
      vecNorm(col("embedding")).as("nrm")).filter(col("nrm") > 0).persist()
    CacheRegistry.track(base)
    // vectors attach to the slim bucket rows (one join, n × tables rows)
    // and the exact cosine runs inside the pairing stage — see
    // [[cosineDedupCells]]: candidates never ride an exchange
    SpanGuard.pairs(
        slimBuckets(base, "vec_id", "embedding", "vec_id", tables, bitsPerTable)
          .join(base, Seq("vec_id"))
          .select(col("table"), col("bucket"), col("vec_id"),
            col("embedding"), col("nrm")),
        keys = Seq("table", "bucket"), idCol = "vec_id",
        order = Seq("vec_id"), maxSpan = maxBucket,
        payload = Seq("embedding", "nrm"),
        verify = _.withColumn("sim",
            vecDot(col("embedding_a"), col("embedding_b")) /
              (col("nrm_a") * col("nrm_b")))
          .filter(col("sim") >= threshold))
      .select("id_a", "id_b", "sim")
  }

  /** Embedding near-duplicate pairs via k-means CELLS — [[cosineDedup]]'s
    * scale path, and the default the corpus-dedup query registers. The
    * LSH variant's geometry has a fixed bucket count, so per-bucket
    * occupancy — and with it candidate volume — grows with corpus size:
    * at a recall-tuned 16×4-bit geometry a random (non-qualifying) pair
    * still collides in some table with p ≈ 0.64, which is "most of
    * all-pairs" arriving through bucket machinery. Cells instead grow
    * WITH the corpus ([[autoNlist]]: cell count ∝ n at ~maxCell/2
    * expected occupancy), so per-cell work is constant and total
    * candidate volume stays ~linear at any scale — the same shape that
    * keeps [[semanticDedup]] near-linear at the one-order-up probe.
    *
    * Recall comes from multi-probe assignment: every vector joins its
    * `probeCells` nearest cells (map-side, [[cellsAssign]] — dense scan
    * to [[DenseAssignLimit]] cells, two-level coarse index beyond), and
    * a pair is examined when the two probe sets share ANY cell. Near
    * neighbors rank cells near-identically, so probing ≥2 cells covers
    * the cell-boundary pairs single-assignment SemDeDup concedes;
    * `dedup_embedding_recall` gates the measured floor against the
    * exact twin. Candidates are verified with exact cosine — emitted
    * pairs are exact (misses allowed, false positives never).
    *
    * Scale shape: one corpus scan for assignment (no shuffle), (cell,
    * vec_id, embedding) rows shuffle ×probeCells into SpanGuard-bounded
    * in-cell pairing, and the exact-cosine verify runs INSIDE the
    * pairing stage (SpanGuard's verify hook) so the O(n × probeCells ×
    * maxCell) candidate volume is pruned to survivors before any
    * further exchange — re-attaching vectors by id after pairing would
    * ship every candidate through three shuffles first (measured 40×/
    * decade at the 100×-rows probe, vs ~linear with the fused verify).
    * Trainer
    * cost amortizes via `pretrained` ([[trainCentroids]] / Artifacts),
    * like IVF's quantizer.
    *
    * @return (id_a, id_b, sim) — id_a < id_b, sim = exact cosine ≥
    *         threshold. Zero-norm vectors excluded (cosine family
    *         contract); dim-mismatched vectors assign to no cell and
    *         emit no pairs. */
  def cosineDedupCells(df: DataFrame, threshold: Double, nlist: Int = 0,
                       trainIters: Int = 2, maxCell: Int = 256,
                       probeCells: Int = 2,
                       pretrained: Option[(Array[Long], Array[Array[Float]])] = None)
      : DataFrame = {
    require(probeCells >= 1, "probeCells must be >= 1")
    require(nlist == 0 || pretrained.forall(_._2.length == nlist),
      s"pretrained centroid set has ${pretrained.get._2.length} cells but nlist=$nlist")
    val (centIds, cents) = pretrained.getOrElse {
      val effNlist = if (nlist > 0) nlist else autoNlist(df.count(), maxCell)
      trainCentroids(df, effNlist, trainIters)
    }
    val base = Par.widen(df).select(col("vec_id"), col("embedding"),
        vecNorm(col("embedding")).as("nrm"),
        cellsAssign(col("embedding"), centIds, cents, probeCells).as("cells"))
      .filter(col("nrm") > 0)
    // (embedding, nrm) ride the slim frame as pairing payload: the exact
    // cosine runs INSIDE the pairing stage (SpanGuard verify) and only
    // ≥-threshold survivors reach the pair-dedup exchange. The candidate
    // volume is ~n × probeCells × maxCell/2 pairs — at expected cell
    // occupancy the span guard is inactive and every in-cell pair is a
    // candidate — so re-attaching vectors by id AFTER pairing would push
    // that whole volume through three exchanges (pair dedup + two id
    // joins) before the threshold prunes anything; measured at the
    // 100×-rows probe this was 204M candidate rows vs ~10⁵ survivors.
    val slim = base.filter(col("cells").isNotNull)
      .select(explode(col("cells")).as("cell"), col("vec_id"),
        col("embedding"), col("nrm"))
    SpanGuard.pairs(slim, keys = Seq("cell"), idCol = "vec_id",
        order = Seq("vec_id"), maxSpan = maxCell * probeCells,
        payload = Seq("embedding", "nrm"),
        verify = _.withColumn("sim",
            vecDot(col("embedding_a"), col("embedding_b")) /
              (col("nrm_a") * col("nrm_b")))
          .filter(col("sim") >= threshold))
      .select("id_a", "id_b", "sim")
  }

  /** The multi-probe cell-assignment stage of [[cosineDedupCells]] as a
    * slim (cell, vec_id) frame — one row per (vector, probed cell),
    * zero-norm and dim-mismatched vectors excluded. Exposed for
    * persistence/replay, same rationale as [[lshProbeFrames]]: the
    * k-means assignment kernel lives only here; downstream pairing +
    * exact-cosine verify ([[cosineDedupCellsFrom]]) is plain relational
    * algebra over the raw embeddings. */
  def cellProbesFrame(df: DataFrame,
                      quantizer: (Array[Long], Array[Array[Float]]),
                      probeCells: Int): DataFrame = {
    val (centIds, cents) = quantizer
    Par.widen(df)
      .select(col("vec_id"), vecNorm(col("embedding")).as("nrm"),
        cellsAssign(col("embedding"), centIds, cents, probeCells).as("cells"))
      .filter(col("nrm") > 0 && col("cells").isNotNull)
      .select(explode(col("cells")).as("cell"), col("vec_id"))
  }

  /** The pairing + exact-verify stage of [[cosineDedupCells]] over a
    * [[cellProbesFrame]]-shaped frame (fresh or replayed from storage).
    * Bit-identical to the monolithic path with the same geometry:
    * [[SpanGuard]] pairing within cells (rank = vec_id order, span
    * `maxSpan`), pair dedup across shared cells, exact double cosine ≥
    * `threshold` from the raw embeddings. */
  def cosineDedupCellsFrom(slim: DataFrame, corpus: DataFrame,
                           threshold: Double, maxSpan: Int): DataFrame = {
    // one slim-side join attaches vectors BEFORE pairing (n × probeCells
    // rows), then the exact cosine runs inside the pairing stage as in
    // [[cosineDedupCells]] — candidates never ride an exchange
    val base = corpus.select(col("vec_id"), col("embedding"),
      vecNorm(col("embedding")).as("nrm"))
    val enriched = slim.join(base, Seq("vec_id"))
      .select(col("cell"), col("vec_id"), col("embedding"), col("nrm"))
    SpanGuard.pairs(enriched, keys = Seq("cell"), idCol = "vec_id",
        order = Seq("vec_id"), maxSpan = maxSpan,
        payload = Seq("embedding", "nrm"),
        verify = _.withColumn("sim",
            vecDot(col("embedding_a"), col("embedding_b")) /
              (col("nrm_a") * col("nrm_b")))
          .filter(col("sim") >= threshold))
      .select("id_a", "id_b", "sim")
  }

  /** Embedding-space benchmark decontamination — the semantic twin of
    * [[Dedup.crossNgramOverlap]]: flag every corpus vector whose cosine
    * against ANY probe (eval-set) vector reaches `threshold`, with the
    * closest probe as evidence. Catches paraphrased/translated
    * contamination that shares no n-grams with the benchmark.
    *
    * Scale shape: the corpus is scanned ONCE and never shuffled by the
    * scoring — probes are broadcast (eval sets are small by contract:
    * thousands of rows, not a corpus) and every (corpus × probe) cosine
    * is evaluated map-side; the only exchange is the per-vector window
    * over the ≥-threshold HITS (each group ≤ |probes| rows). For probe
    * sets too large to broadcast, prune first with [[ivfTopK]] /
    * [[lshTopK]] and exact-verify the candidates, as with the dedup
    * family.
    *
    * @return one row per contaminated corpus vector:
    *         (vec_id, closest_probe, max_sim, n_probe_hits). */
  def semanticContamination(corpus: DataFrame, probes: DataFrame,
                            threshold: Double): DataFrame = {
    // zero-norm vectors excluded (cosine family contract — bruteForceTopK)
    val c = corpus.select(col("vec_id"), col("embedding").as("cv"),
      vecNorm(col("embedding")).as("cn")).filter(col("cn") > 0)
    val q = probes.select(col("vec_id").as("probe_id"), col("embedding").as("qv"),
      vecNorm(col("embedding")).as("qn")).filter(col("qn") > 0)
    val hits = c.crossJoin(broadcast(q))
      .withColumn("sim", vecDot(col("cv"), col("qv")) / (col("cn") * col("qn")))
      .filter(col("sim") >= threshold)
    val w = Window.partitionBy("vec_id")
    hits
      .withColumn("n_probe_hits", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("sim").desc, col("probe_id"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("probe_id").as("closest_probe"),
        col("sim").as("max_sim"), col("n_probe_hits"))
  }

  /** [[semanticDedup]]'s default cell count for a corpus of `n` vectors:
    * expected cell size maxCell/2 (span guard inactive in the
    * non-degenerate regime), clamped to [16, 2^16] — beyond
    * [[DenseAssignLimit]] cells, [[cellAssign]] switches to the two-level
    * coarse index automatically, so the old 4096 dense-scan ceiling no
    * longer caps the corpus size this operator serves. The 2^16 clamp is
    * driver memory for the centroid matrix (65536 × dim floats), not an
    * assignment-cost limit. */
  def autoNlist(n: Long, maxCell: Int = 256): Int =
    math.max(16, math.min(65536, (n / math.max(1, maxCell / 2)).toInt + 1))

  /** SemDeDup-style semantic dedup manifest (Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the embeddings ([[trainCentroids]]
    * — the same deterministic distributed Lloyd trainer IVF uses), then
    * drop every vector with an IN-CELL neighbor of exact cosine ≥
    * `threshold` and smaller id.
    *
    * RECALL CONTRACT. Pairing within a cell is exhaustive only while the
    * cell holds ≤ maxCell+1 vectors; beyond that the [[SpanGuard]] span
    * kicks in, and because in-cell rank order is vec_id order —
    * uncorrelated with similarity — a scattered duplicate pair in an
    * oversized MIXED cell can go unexamined. The default `nlist = 0`
    * therefore AUTO-SIZES the cell count to target maxCell/2 expected
    * vectors per cell (one count() job), the paper's regime, where the
    * guard is inactive for every non-degenerate cell and in-cell dedup
    * is exact; oversized cells then mean a duplicate FLOOD (near-equal
    * vectors k-means cannot split), whose members sit on a contiguous
    * rank chain the span does catch. Beyond [[DenseAssignLimit]] cells,
    * assignment switches to the two-level coarse → children index
    * ([[cellAssign]]): still map-side and deterministic, with the
    * documented approximation that a vector near a coarse boundary may
    * assign to the best fine cell among its 2 probed coarse cells rather
    * than the global argmax — a cell-boundary shift, not a correctness
    * change (near-identical vectors follow the same path and co-locate
    * either way).
    *
    * Scale shape: assignment is map-side (one corpus scan, no shuffle);
    * pairing shuffles slim (cell, vec_id) rows keyed by cell; vectors are
    * re-attached only to deduped candidate pairs. Unlike [[cosineDedup]]'s
    * 8-table LSH, one k-means partition — recall comes from cluster
    * locality (near-dups co-locate by construction), compute is one
    * bucket pass instead of eight.
    *
    * @return (vec_id, cell, is_kept, dup_of) — `dup_of` is the smallest
    *         id among the SPAN-EXAMINED in-cell duplicates that witness
    *         the drop (null iff kept). It is a valid witness (smaller id,
    *         cosine ≥ threshold — proved by the dedup_semantic_violations
    *         query), NOT necessarily the cluster representative: in an
    *         oversized cell, chains fragment (rank 100's witness may be
    *         rank 68, itself dropped). Consumers wanting one canonical id
    *         per duplicate cluster should run [[Dedup.connectedComponents]]
    *         over (vec_id, dup_of) pairs, exactly as with the pairwise
    *         dedup operators. Vectors whose dimension mismatches the
    *         trained centroids get a null cell and are kept verbatim
    *         (same null-cell contract as [[ivfTopK]]'s inverted lists);
    *         zero-norm vectors are likewise kept verbatim — cosine
    *         against them is undefined ([[bruteForceTopK]] contract). */
  def semanticDedup(df: DataFrame, threshold: Double, nlist: Int = 0,
                    trainIters: Int = 2, maxCell: Int = 256,
                    pretrained: Option[(Array[Long], Array[Array[Float]])] = None): DataFrame = {
    // nlist = 0 (auto) defers entirely to the pretrained set; an explicit
    // nlist that disagrees with it is a silent-recall-change bug upstream
    require(nlist == 0 || pretrained.forall(_._2.length == nlist),
      s"pretrained centroid set has ${pretrained.get._2.length} cells but nlist=$nlist")
    val (centIds, cents) = pretrained.getOrElse {
      val effNlist = if (nlist > 0) nlist else autoNlist(df.count(), maxCell)
      trainCentroids(df, effNlist, trainIters)
    }
    val base = Par.widen(df).select(col("vec_id"), col("embedding"),
        vecNorm(col("embedding")).as("nrm"),
        cellAssign(col("embedding"), centIds, cents).as("cell"))
      .persist()
    CacheRegistry.track(base)

    // rn order within a cell IS id order (SpanGuard sorts by vec_id),
    // so pair sides satisfy id_a < id_b: the witness is always the lower
    // id. Zero-norm vectors are kept out of pairing (cosine against them
    // is NaN — family contract at [[bruteForceTopK]]) but STAY in the
    // manifest as kept rows, like null-cell dim mismatches.
    // exact cosine runs inside the pairing stage (SpanGuard verify, same
    // shape as [[cosineDedupCells]]) — only survivors reach an exchange
    val dups = SpanGuard.pairs(
        base.filter(col("cell").isNotNull && col("nrm") > 0)
          .select("cell", "vec_id", "embedding", "nrm"),
        keys = Seq("cell"), idCol = "vec_id",
        order = Seq("vec_id"), maxSpan = maxCell,
        payload = Seq("embedding", "nrm"),
        verify = _.filter(
          vecDot(col("embedding_a"), col("embedding_b")) /
            (col("nrm_a") * col("nrm_b")) >= threshold))
      .groupBy(col("id_b").as("vec_id"))
      .agg(min(col("id_a")).as("dup_of"))

    base.select(col("vec_id"), col("cell"))
      .join(dups, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cell"),
        col("dup_of").isNull.cast("int").as("is_kept"), col("dup_of"))
  }

  /** The cell-assignment stage of [[semanticDedup]] as a persistable
    * (vec_id, cell, pairable) frame — one row per corpus vector:
    * `cell` is the single nearest k-means cell (null on dim mismatch),
    * `pairable` = 1 iff the vector participates in in-cell pairing
    * (non-null cell AND non-zero norm — the manifest keeps unpairable
    * rows verbatim). Same replay rationale as [[cellProbesFrame]]. */
  def semanticAssignFrame(df: DataFrame,
      quantizer: (Array[Long], Array[Array[Float]])): DataFrame = {
    val (centIds, cents) = quantizer
    Par.widen(df)
      .select(col("vec_id"),
        cellAssign(col("embedding"), centIds, cents).as("cell"),
        vecNorm(col("embedding")).as("nrm"))
      .select(col("vec_id"), col("cell"),
        (col("cell").isNotNull && col("nrm") > 0).cast("int").as("pairable"))
  }

  /** The pairing + manifest stage of [[semanticDedup]] over a
    * [[semanticAssignFrame]]-shaped frame. Bit-identical to the
    * monolithic path with the same assignment: SpanGuard pairing of
    * pairable rows within cells (vec_id order, span `maxCell`), exact
    * double cosine ≥ `threshold`, witness = min in-cell duplicate id,
    * full-corpus manifest via left join. */
  def semanticDedupFrom(assigned: DataFrame, corpus: DataFrame,
                        threshold: Double, maxCell: Int = 256): DataFrame = {
    val base = corpus.select(col("vec_id"), col("embedding"),
      vecNorm(col("embedding")).as("nrm"))
    // one slim-side join attaches vectors before pairing; exact cosine
    // runs inside the pairing stage — see [[semanticDedup]]
    val dups = SpanGuard.pairs(
        assigned.filter(col("pairable") === 1).select("cell", "vec_id")
          .join(base, Seq("vec_id"))
          .select(col("cell"), col("vec_id"), col("embedding"), col("nrm")),
        keys = Seq("cell"), idCol = "vec_id",
        order = Seq("vec_id"), maxSpan = maxCell,
        payload = Seq("embedding", "nrm"),
        verify = _.filter(
          vecDot(col("embedding_a"), col("embedding_b")) /
            (col("nrm_a") * col("nrm_b")) >= threshold))
      .groupBy(col("id_b").as("vec_id"))
      .agg(min(col("id_a")).as("dup_of"))
    assigned.select(col("vec_id"), col("cell"))
      .join(dups, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cell"),
        col("dup_of").isNull.cast("int").as("is_kept"), col("dup_of"))
  }
}
