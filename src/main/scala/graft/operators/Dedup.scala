package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data pipelines, each designed
  * around one shuffle pattern that survives 100 TB:
  *
  *  - [[exact]]: hash-groupBy on a 256-bit content hash — shuffles 32-byte
  *    keys, never full documents.
  *  - [[minhashLsh]]: shingle → minhash signature → banded LSH buckets →
  *    candidate pairs verified with exact shingle Jaccard. Work is
  *    O(docs × bands) rows through one shuffle; bucket size is capped so a
  *    degenerate band cannot quadratically explode a task.
  *  - [[simhash]]: 64-bit SimHash + banded hamming candidates.
  *  - [[ngramJaccard]]: exact n-gram Jaccard via an inverted-index
  *    self-join (document-frequency-capped to bound the pair blowup).
  *
  * All hashes are Spark's codegen'd `xxhash64` — deterministic across
  * runs/partitions, no UDFs in the hot path.
  */
object Dedup {

  /** Row cutoff for explicitly-broadcast slim frames, derived from the
    * JVM heap instead of a constant: an explicit `broadcast()` bypasses
    * autoBroadcastJoinThreshold, and the built HashedRelation costs
    * ~5-6× the raw key bytes (hash table + UnsafeRow overhead — a
    * 50M-long-key relation is ~2.5 GB, not the ~400 MB its raw bytes
    * suggest), held simultaneously on the driver and every executor.
    * Budget: 1/20 of max heap for the relation at `bytesPerRow`
    * HASHED-RELATION bytes per row (key + row + table overhead; use
    * ~48 for an 8-byte-key, ~56 with a long payload). On this box's
    * 32g driver that is ~33M bare keys; on an 8g executor ~8M — the
    * fallback (shuffle semi-join / plain join, still exact) triggers on
    * MEMORY, not on a row count tuned to one machine. On a non-local
    * master the relation must ALSO fit every executor heap (often much
    * smaller than the driver's), so the budget clamps against
    * `spark.executor.memory` there; in local[n] driver == executor and
    * the runtime heap is the right bound. */
  private[graft] def broadcastRowCutoff(bytesPerRow: Int): Long = {
    val driverHeap = Runtime.getRuntime.maxMemory
    val heap = Option(org.apache.spark.SparkEnv.get).map(_.conf) match {
      case Some(conf) if !conf.get("spark.master", "local").startsWith("local") =>
        math.min(driverHeap, conf.getSizeAsBytes("spark.executor.memory", "1g"))
      case _ => driverHeap
    }
    math.max(1000000L, heap / 20 / bytesPerRow)
  }

  /** Exact duplicate groups: representative (min id) + member count per
    * distinct content. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("content_sha"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word w-shingles of a document as distinct 64-bit hashes: per-word
    * xxhash64 (codegen'd builtin) chained through the
    * [[graft.functions.VectorExpressions.HashShingles]] kernel — no
    * per-shingle string materialization. */
  def shingleHashes(text: Column, w: Int): Column =
    graft.functions.VectorExpressions.hashShingles(
      transform(split(text, " "), wd => xxhash64(wd)), w)

  /** MinHash signature as an array column of `k` 64-bit minima —
    * semantically `array_min(transform(shingles, h => xxhash64(h, i)))`
    * per salt i, computed in one codegen'd pass
    * ([[graft.functions.VectorExpressions.MinHashSignature]]). */
  def minhashSignature(shingles: Column, k: Int): Column =
    graft.functions.VectorExpressions.minhashSig(shingles, k)

  /** Near-duplicate candidate pairs via banded MinHash-LSH, verified with
    * exact shingle Jaccard.
    *
    * @param bands     number of LSH bands (signature length = bands*rowsPerBand)
    * @param rowsPerBand minhashes per band
    * @param threshold   exact-Jaccard acceptance threshold
    * @param maxBucket   skew guard: within a (band, bucket) group, each doc
    *                    pairs with at most this many successors in doc-id
    *                    order. A group of ≤ maxBucket+1 docs still produces
    *                    ALL its pairs (spans cover the whole group); a
    *                    degenerate hot bucket degrades to a linear
    *                    chain-of-neighbors instead of exploding
    *                    quadratically — or, worse, being dropped outright,
    *                    which would silently yield ZERO pairs for a cluster
    *                    of > maxBucket exact duplicates (every member still
    *                    surfaces in at least one pair this way)
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 bands: Int = 16, rowsPerBand: Int = 4,
                 shingleWidth: Int = 3, threshold: Double = 0.7,
                 maxBucket: Int = 64): DataFrame =
    minhashPairsFrom(minhashDocs(df, idCol, textCol,
        bands * rowsPerBand, shingleWidth),
      bands, rowsPerBand, threshold, maxBucket)

  /** The per-document signature stage of [[minhashLsh]], exposed so
    * callers can PERSIST it (one row per doc: doc_id, distinct shingle
    * hashes, k-long minhash signature) and replay the exact same
    * signatures later — both for incremental re-dedup and for an
    * engine-independent oracle: everything DOWNSTREAM of this frame
    * (banding, span-guarded pairing, exact Jaccard) is plain relational
    * algebra over longs, expressible in any SQL engine, while the
    * xxhash64 kernels live only here. Par.widen: single-row-group
    * inputs otherwise hash k signatures on one core. */
  def minhashDocs(df: DataFrame, idCol: String, textCol: String,
                  k: Int, shingleWidth: Int): DataFrame =
    Par.widen(df).select(col(idCol).as("doc_id"),
        shingleHashes(col(textCol), shingleWidth).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .withColumn("sig", minhashSignature(col("shingles"), k))

  /** Banding + pairing + exact-Jaccard verification over a
    * [[minhashDocs]]-shaped frame (doc_id, shingles, sig). */
  def minhashPairsFrom(docs0: DataFrame, bands: Int, rowsPerBand: Int,
                       threshold: Double, maxBucket: Int): DataFrame = {
    // Signatures/shingles are consumed by the bucket explode and BOTH
    // verify-join sides — cache the per-doc frame (narrow: one row per
    // doc) and keep the join sides shingle-free.
    val docs = docs0.persist()
    CacheRegistry.track(docs)

    // (band, bandHash) bucket key per doc — bands explode is x`bands` rows,
    // but only (id, 2 longs) wide; full shingle sets stay behind.
    val buckets = docs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), b))))
      .withColumnRenamed("col", "bucket").withColumnRenamed("pos", "band")

    // Bounded rank-span pairing within each bucket ([[SpanGuard.pairs]]):
    // all-pairs for normal buckets, a linear neighbor chain for
    // degenerate ones — bounded COMPUTE, not just bounded output.
    val pairs = SpanGuard.pairs(
        buckets.select("band", "bucket", "doc_id"),
        keys = Seq("band", "bucket"), idCol = "doc_id",
        order = Seq("doc_id"), maxSpan = maxBucket)
      .join(docs.select(col("doc_id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("shingles").as("sh_b")), "id_b")

    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val union = (size(col("sh_a")) + size(col("sh_b"))).cast("double") - inter
    pairs.withColumn("jaccard", inter / union)
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Incremental near-dedup — flag INCOMING documents that near-duplicate
    * an already-INDEXED corpus (the "dedupe today's crawl against the
    * index" shape: at 100 TB the index is re-used across ingest batches,
    * never re-paired against itself). Bipartite banded MinHash-LSH with
    * exact shingle-Jaccard verification, same signature scheme as
    * [[minhashLsh]] so signatures computed at index-build time stay valid.
    *
    * Scale shape: both join sides are SLIM (id + two longs per band row);
    * shingles re-attach only to deduped candidate pairs. The skew guard is
    * the [[Similarity.lshTopK]] block pattern, bipartite: index rows in a
    * (band, bucket) are ranked into blocks of `maxBucket`, and each
    * incoming doc probes the block addressed by `xxhash64(incoming id)`
    * and its successor — buckets of ≤ maxBucket index rows have one
    * block, so the incoming doc meets the WHOLE bucket and results equal
    * the unguarded join; a degenerate hot bucket (boilerplate shingle
    * floods) degrades to a deterministic 2·maxBucket-candidate probe per
    * incoming doc instead of |bucket| × |incoming| pair explosion. The
    * block-count frame is joined (not broadcast): bucket keys are
    * unbounded hashes, so its cardinality tracks the index.
    *
    * @return (index_id, incoming_id, jaccard) — pairs with exact
    *         Jaccard ≥ threshold; an incoming doc may match several index
    *         docs (consumers typically keep `incoming_id`s absent here). */
  def minhashLshAgainst(index: DataFrame, incoming: DataFrame,
                        idCol: String, textCol: String,
                        bands: Int = 16, rowsPerBand: Int = 4,
                        shingleWidth: Int = 3, threshold: Double = 0.7,
                        maxBucket: Int = 64): DataFrame =
    minhashLshAgainstPrepared(
      minhashPrepare(index, idCol, textCol, bands, rowsPerBand, shingleWidth),
      minhashPrepare(incoming, idCol, textCol, bands, rowsPerBand, shingleWidth),
      bands, rowsPerBand, threshold, maxBucket)

  /** Signature preparation split out of [[minhashLshAgainst]]: (id, sh,
    * sig) rows, one scan. At 100 TB the standing index's signatures are
    * computed ONCE here at index-build time and PERSISTED; every ingest
    * batch then joins against the stored frame instead of re-hashing the
    * whole index per batch (see
    * [[graft.streaming.StreamingAnalytics.nearDedupIntake]]). */
  def minhashPrepare(df: DataFrame, idCol: String, textCol: String,
                     bands: Int = 16, rowsPerBand: Int = 4,
                     shingleWidth: Int = 3): DataFrame =
    Par.widen(df).select(col(idCol).as("id"),
        shingleHashes(col(textCol), shingleWidth).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), bands * rowsPerBand))

  /** [[minhashLshAgainst]] over ALREADY-PREPARED (id, sh, sig) frames
    * ([[minhashPrepare]] output, fresh or loaded from storage). The
    * signature scheme (bands × rowsPerBand, shingleWidth) must match the
    * preparation — same contract as reusing index-build-time signatures
    * anywhere else. */
  def minhashLshAgainstPrepared(indexPrep: DataFrame, incomingPrep: DataFrame,
                                bands: Int = 16, rowsPerBand: Int = 4,
                                threshold: Double = 0.7,
                                maxBucket: Int = 64): DataFrame = {
    def prep(df: DataFrame): DataFrame = {
      val d = df.select(col("id"), col("sh"), col("sig")).persist()
      CacheRegistry.track(d)
      d
    }
    val idx = prep(indexPrep)
    val inc = prep(incomingPrep)
    val f = minhashBipartiteFrames(idx, inc, bands, rowsPerBand, maxBucket)
    minhashVerifyFrom(f.idxBlocks, f.probes, idx, inc, threshold)
  }

  /** The bipartite block geometry of [[minhashLshAgainstPrepared]] —
    * (idxBlocks, probes). */
  final case class BipartiteFrames(idxBlocks: DataFrame, probes: DataFrame)

  /** The banding/addressing stage of [[minhashLshAgainstPrepared]],
    * exposed so callers can PERSIST both frames and replay the exact
    * probe geometry later — same rationale as
    * [[Similarity.lshProbeFrames]]: the per-band xxhash64 bucket keys
    * and the band-mixed block-address hashes are Spark kernels and live
    * only here, while everything DOWNSTREAM — the (band, bucket, blk)
    * candidate join, pair dedup, exact shingle Jaccard — is plain
    * relational algebra over the persisted signature frames
    * ([[minhashPrepare]] / [[minhashDocs]]), expressible in any SQL
    * engine.
    *
    *  - `idxBlocks`: (band, bucket, index_id, blk) — one row per index
    *    doc per band; `blk` is the rank-block within the bucket (skew
    *    guard, see [[minhashLshAgainst]]).
    *  - `probes`: (band, bucket, incoming_id, blk) — 2 block probes per
    *    (incoming doc, band) whose bucket exists in the index. The
    *    probe hash mixes the BAND in: with id-only addressing a doc
    *    caught in a degenerate flood bucket would probe the same block
    *    number in every band, correlating candidate sets across bands
    *    and losing the recall diversity banding exists to buy. */
  def minhashBipartiteFrames(indexPrep: DataFrame, incomingPrep: DataFrame,
                             bands: Int = 16, rowsPerBand: Int = 4,
                             maxBucket: Int = 64): BipartiteFrames = {
    def bucketRows(d: DataFrame, out: String): DataFrame =
      d.select(col("id").as(out),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(concat_ws(",",
              slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), b))))
        .withColumnRenamed("col", "bucket").withColumnRenamed("pos", "band")
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "bucket").orderBy("index_id")
    val idxB = bucketRows(indexPrep, "index_id")
      .withColumn("blk", floor((row_number().over(wBucket) - 1) / lit(maxBucket)))
      .persist()
    CacheRegistry.track(idxB)
    val nBlk = idxB.groupBy("band", "bucket").agg((max(col("blk")) + 1).as("nblk"))
    val probes = bucketRows(incomingPrep, "incoming_id")
      .join(nBlk, Seq("band", "bucket")) // bucket absent from index → no candidates
      .select(col("band"), col("bucket"), col("incoming_id"),
        explode(array(
          pmod(xxhash64(col("incoming_id"), col("band")), col("nblk")),
          pmod(xxhash64(col("incoming_id"), col("band")) + 1, col("nblk")))).as("blk"))
    BipartiteFrames(idxB, probes)
  }

  /** The candidate-join + exact-Jaccard stage of
    * [[minhashLshAgainstPrepared]] over [[minhashBipartiteFrames]]-shaped
    * frames (fresh or replayed from storage) plus the signature frames
    * the shingles re-attach from. Bit-identical to the monolithic path
    * with the same geometry. */
  def minhashVerifyFrom(idxBlocks: DataFrame, probes: DataFrame,
                        indexPrep: DataFrame, incomingPrep: DataFrame,
                        threshold: Double): DataFrame = {
    val cands = probes.join(idxBlocks, Seq("band", "bucket", "blk"))
      .select("index_id", "incoming_id")
      .dropDuplicates("index_id", "incoming_id")
      .join(indexPrep.select(col("id").as("index_id"),
        col("sh").as("sh_index_id")), "index_id")
      .join(incomingPrep.select(col("id").as("incoming_id"),
        col("sh").as("sh_incoming_id")), "incoming_id")
    val inter = size(array_intersect(col("sh_index_id"), col("sh_incoming_id"))).cast("double")
    val union = (size(col("sh_index_id")) + size(col("sh_incoming_id"))).cast("double") - inter
    cands.withColumn("jaccard", inter / union)
      .filter(col("jaccard") >= threshold)
      .select("index_id", "incoming_id", "jaccard")
  }

  /** 64-bit SimHash of the token multiset (codegen'd fold over the
    * xxhash64 token hashes). */
  def simhash64(text: Column): Column =
    graft.functions.VectorExpressions.simhashFromHashes(
      transform(split(text, " "), w => xxhash64(w)))

  /** SimHash near-duplicates: candidates share one of 4 scale-aware
    * bands (see [[simhashBucketBits]]), verified by hamming distance ≤
    * maxHamming.
    *
    * @param maxBucket skew guard, same contract as [[minhashLsh]]: within
    *                  a (band, bucket) group each doc pairs with at most
    *                  this many successors in doc-id order — all-pairs for
    *                  groups of ≤ maxBucket+1 docs, a linear neighbor
    *                  chain for degenerate ones (every empty/near-empty
    *                  doc hashes to simhash 0 and shares bucket 0 in all 4
    *                  bands; dropping such groups outright would instead
    *                  silently report ZERO pairs for > maxBucket exact
    *                  duplicates).
    * @param bucketBits band width in bits; 0 (default) derives it from
    *                  the corpus size so expected bucket occupancy stays
    *                  ≈ [[SimhashTargetOccupancy]] (16 bits up to ~0.5M
    *                  docs — bit-identical to the historical fixed
    *                  banding — then one more bit per doubling)
    */
  def simhashDups(df: DataFrame, idCol: String, textCol: String,
                  maxHamming: Int = 6, maxBucket: Int = 64,
                  bucketBits: Int = 0): DataFrame =
    simhashPairsFrom(simhashDocs(df, idCol, textCol), maxHamming, maxBucket,
      bucketBits)

  /** Expected docs per (band, bucket) the scale-aware banding aims for.
    * 8 leaves ~8× headroom under the default maxBucket=64 span guard for
    * the non-uniformity of real simhash values (duplicate clusters land
    * in one bucket BY DESIGN; only the cross-cluster background should
    * approach uniform). */
  val SimhashTargetOccupancy: Long = 8L

  /** Scale-aware SimHash band width: the smallest w ≥ 16 with
    * `n ≤ occupancy · 2^w`, capped at 32 (at w=32 even 34B docs meet the
    * target). Pure integer arithmetic — the DuckDB oracle derives the
    * same w from `count(*)` over the replayed fingerprint artifact, and
    * both engines must agree exactly, so no FP log2 on either side.
    *
    * Fixed 16-bit banding has a quadratic window: past ~0.5M docs the
    * expected 2¹⁶-bucket occupancy crosses the span guard and candidate
    * volume grows ~n²/2¹⁶ until the guard clamps it (measured
    * 45.5×/decade at the 5M-doc rung before this). Widening the bands
    * with corpus size keeps occupancy — and so candidate volume per doc —
    * constant. The price is bounded recall at the hamming radius: a
    * wider window is likelier to contain a differing bit (at w=20,
    * h≤3 pairs are caught with p≈0.79 vs ≈0.89 at w=16, 4 bands) —
    * the standard Hamming-LSH occupancy/recall trade, documented rather
    * than hidden. Within-threshold precision is unaffected (every
    * candidate is hamming-verified), which is what the violations gate
    * checks. */
  def simhashBucketBits(n: Long, occupancy: Long = SimhashTargetOccupancy): Int = {
    val m = n / occupancy + (if (n % occupancy != 0) 1 else 0) // overflow-safe ceilDiv
    val ceilLog2 = if (m <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    math.min(32, math.max(16, ceilLog2))
  }

  /** The per-document fingerprint stage of [[simhashDups]] (doc_id,
    * 64-bit simhash) — exposed for persistence/replay, same rationale
    * as [[minhashDocs]]: downstream of this frame the operator is pure
    * bit arithmetic over longs, replayable in any SQL engine. */
  def simhashDocs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Par.widen(df)
      .select(col(idCol).as("doc_id"), simhash64(col(textCol)).as("sim"))

  /** Banding + span-guarded pairing + hamming verify over a
    * [[simhashDocs]]-shaped frame.
    *
    * Band b covers the `w`-bit window at offset `min(16·b, 64−w)` —
    * at w=16 this is exactly the historical disjoint 4×16 tiling (the
    * small-corpus results are bit-identical); wider windows overlap at
    * the high end rather than wrap, so the bucket stays a plain
    * `shiftright + mask` both here and in the SQL oracle (arithmetic
    * shift is safe: the masked bits are below 64−offset, above which
    * the sign-fill lives). */
  def simhashPairsFrom(sh0: DataFrame, maxHamming: Int,
                       maxBucket: Int, bucketBits: Int = 0): DataFrame = {
    // persist only when the width derivation makes the frame
    // multi-consumer (count + banding); a caller-pinned width leaves
    // the banding as the single consumer and the persist pure cost
    val sh = if (bucketBits > 0) sh0 else {
      val p = sh0.persist()
      CacheRegistry.track(p)
      p
    }
    val w = if (bucketBits > 0) bucketBits else simhashBucketBits(sh.count())
    require(w >= 1 && w <= 63, s"bucketBits must be in [1,63], got $w")
    val mask = (1L << w) - 1
    val banded0 = sh.select(col("doc_id"), col("sim"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("sim"),
          least(b * 16, lit(64 - w))).bitwiseAND(mask))))
      .withColumnRenamed("col", "bucket").withColumnRenamed("pos", "band")
    // same block-keyed span pairing as minhashLsh: bounded compute, not
    // just bounded output, for the degenerate all-zero-simhash bucket;
    // the 64-bit signature rides as pair payload so the hamming verify
    // needs no re-join
    SpanGuard.pairs(banded0.select("band", "bucket", "doc_id", "sim"),
        keys = Seq("band", "bucket"), idCol = "doc_id",
        order = Seq("doc_id"), maxSpan = maxBucket, payload = Seq("sim"))
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Per-image 64-bit dHash fingerprints (id, sim) — the image
    * counterpart of [[simhashDocs]]: one codegen'd decode+hash pass
    * ([[graft.functions.ImageExpressions.dhashImage]]), refusals
    * (non-images, decode failures, images smaller than the 9×8 grid)
    * dropped. Downstream of this frame the operator is pure bit
    * arithmetic over longs. */
  def imagePhashDocs(df: DataFrame, idCol: String, mediaCol: String): DataFrame =
    Par.widen(df)
      .select(col(idCol).as("doc_id"),
        graft.functions.ImageExpressions.dhashImage(col(mediaCol)).as("sim"))
      .filter(col("sim").isNotNull)

  /** Near-duplicate IMAGES: 64-bit perceptual dHash per payload
    * ([[imagePhashDocs]]), then the SAME scale-aware banded-Hamming
    * pairing as [[simhashDups]] — candidates share one of 4 bands,
    * verified by exact hamming ≤ maxHamming. A 100 TB multimodal
    * corpus's image dedup is this one map pass (decode + 8-byte
    * fingerprint) plus the text-SimHash exchange shape: only (id,
    * 64-bit hash) longs ever shuffle, never pixels; with 4 disjoint
    * 16-bit bands, any pair within hamming ≤ 3 shares a clean band by
    * pigeonhole, so recall at the default radius is structural, not
    * probabilistic. */
  def imagePhashDups(df: DataFrame, idCol: String, mediaCol: String,
                     maxHamming: Int = 3, maxBucket: Int = 64,
                     bucketBits: Int = 0): DataFrame =
    simhashPairsFrom(imagePhashDocs(df, idCol, mediaCol), maxHamming,
      maxBucket, bucketBits)

  /** Per-clip 64-bit loudness-envelope fingerprints (id, sim) — the
    * AUDIO counterpart of [[imagePhashDocs]]: one codegen'd decode+hash
    * pass ([[graft.functions.AudioExpressions.audioEnvHash]] over the
    * real PCM / G.711 / IMA-ADPCM dispatch), refusals (non-decodable
    * payloads, clips shorter than the 65-segment envelope) dropped. */
  def audioEnvDocs(df: DataFrame, idCol: String, mediaCol: String): DataFrame =
    Par.widen(df)
      .select(col(idCol).as("doc_id"),
        graft.functions.AudioExpressions.audioEnvHash(col(mediaCol)).as("sim"))
      .filter(col("sim").isNotNull)

  /** Near-duplicate AUDIO: 64-bit envelope hash per payload
    * ([[audioEnvDocs]]), then the SAME scale-aware banded-Hamming
    * pairing as [[simhashDups]]/[[imagePhashDups]] — candidates share
    * one of 4 bands, verified by exact hamming ≤ maxHamming. The
    * 100 TB shape is identical to image dedup: one map pass (decode +
    * 8-byte fingerprint), then only (id, 64-bit hash) longs ever
    * shuffle — never samples; with 4 disjoint 16-bit bands any pair
    * within hamming ≤ 3 shares a clean band by pigeonhole, so recall
    * at the default radius is structural, not probabilistic. */
  def audioEnvDups(df: DataFrame, idCol: String, mediaCol: String,
                   maxHamming: Int = 3, maxBucket: Int = 64,
                   bucketBits: Int = 0): DataFrame =
    simhashPairsFrom(audioEnvDocs(df, idCol, mediaCol), maxHamming,
      maxBucket, bucketBits)

  /** Per-clip 64-bit majority-vote signatures (id, sim) — the VIDEO
    * counterpart of [[imagePhashDocs]], closing the fingerprint matrix
    * (text SimHash / image dHash / audio envelope / video signature):
    * one codegen'd walk+decode+hash pass
    * ([[graft.functions.VideoExpressions.videoSigHash]] — the real AVI
    * frame walk, the image dHash kernel per frame, strict-majority
    * vote per bit), refusals (no walkable frames, any undecodable
    * frame) dropped. */
  def videoSigDocs(df: DataFrame, idCol: String, mediaCol: String): DataFrame =
    Par.widen(df)
      .select(col(idCol).as("doc_id"),
        graft.functions.VideoExpressions.videoSigHash(col(mediaCol)).as("sim"))
      .filter(col("sim").isNotNull)

  /** Near-duplicate VIDEO clips: 64-bit majority-vote signature per
    * payload ([[videoSigDocs]]), then the SAME scale-aware
    * banded-Hamming pairing as [[simhashDups]]/[[imagePhashDups]]/
    * [[audioEnvDups]]. The 100 TB shape is unchanged from the image
    * family: one map pass walks each container and decodes frames
    * executor-local, then only (id, 64-bit hash) longs ever shuffle —
    * never frames or pixels; with 4 disjoint 16-bit bands any pair
    * within hamming ≤ 3 shares a clean band by pigeonhole, so recall
    * at the default radius is structural, not probabilistic. */
  def videoSigDups(df: DataFrame, idCol: String, mediaCol: String,
                   maxHamming: Int = 3, maxBucket: Int = 64,
                   bucketBits: Int = 0): DataFrame =
    simhashPairsFrom(videoSigDocs(df, idCol, mediaCol), maxHamming,
      maxBucket, bucketBits)

  /** Bipartite banded-Hamming match: incoming fingerprints (doc_id,
    * sim) against a STANDING index (id, sim) — the cross-batch half of
    * incremental fingerprint dedup (SimHash text, image dHash, audio
    * envelope — any 64-bit fingerprint), the
    * [[minhashLshAgainstPrepared]] shape in Hamming space.
    *
    * Bands are [[simhashPairsFrom]]'s 4 windows at the same
    * scale-derived width (derived from the INDEX side — the standing
    * corpus is what grows); candidates share a (band, bucket). Skew
    * discipline is [[minhashBipartiteFrames]]'s verbatim: index rows
    * rank into blocks of `maxBucket` per bucket and each incoming doc
    * probes 2 band-mixed hash-addressed blocks, so a degenerate flood
    * bucket costs |incoming|×2·maxBucket candidates, not
    * |incoming|×|bucket| — bounded COMPUTE, with the usual ANN-style
    * contract (emitted matches exact, flood-bucket misses possible —
    * for hamming ≥ 1 only, see below).
    *
    * EXACT re-deliveries (hamming 0) bypass the probe entirely: a plain
    * sim-equality join emits one REPRESENTATIVE match per (incoming,
    * fingerprint) — the smallest index id — so an identical payload can
    * never be missed even when its fingerprint floods a bucket past
    * what 2 blocks can cover. That matters precisely for the
    * dedup-admission use: the payloads most likely to flood a bucket
    * are degenerate COMMON fingerprints (silence, constant frames), and
    * without the fast path the gate would preferentially re-admit
    * duplicates of exactly the most frequent payloads as the index
    * grows. The representative keeps output O(|incoming|) regardless of
    * how many exact copies the index holds.
    * Returns (index_id, incoming_id, hamming ≤ maxHamming), deduped. */
  def hammingAgainst(index: DataFrame, incoming: DataFrame,
                     maxHamming: Int = 3, maxBucket: Int = 64,
                     bucketBits: Int = 0): DataFrame = {
    // persisted regardless of bucketBits: the banded path reads idx once
    // (into idxB), but the exact fast path below ALWAYS scans it a second
    // time for the per-sim groupBy — without the cache a caller-pinned
    // width (streaming intake) re-reads the index parquet twice per batch
    val idx = { val p = index.select(col("id"), col("sim")).persist()
      CacheRegistry.track(p); p }
    val w = if (bucketBits > 0) bucketBits else simhashBucketBits(idx.count())
    require(w >= 1 && w <= 63, s"bucketBits must be in [1,63], got $w")
    val mask = (1L << w) - 1
    def bandRows(d: DataFrame, idIn: String, idOut: String): DataFrame =
      d.select(col(idIn).as(idOut), col("sim"),
        posexplode(transform(sequence(lit(0), lit(3)),
          b => call_function("shiftright", col("sim"),
            least(b * 16, lit(64 - w))).bitwiseAND(mask))))
        .withColumnRenamed("col", "bucket").withColumnRenamed("pos", "band")
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "bucket").orderBy("index_id")
    val idxB = bandRows(idx, "id", "index_id")
      .withColumn("blk",
        floor((row_number().over(wBucket) - 1) / lit(maxBucket)))
      .persist()
    CacheRegistry.track(idxB)
    val nBlk = idxB.groupBy("band", "bucket")
      .agg((max(col("blk")) + 1).as("nblk"))
    val probes = bandRows(incoming, "doc_id", "incoming_id")
      .withColumnRenamed("sim", "sim_in")
      .join(nBlk, Seq("band", "bucket")) // bucket absent from index → no candidates
      .select(col("band"), col("bucket"), col("incoming_id"), col("sim_in"),
        explode(array(
          pmod(xxhash64(col("incoming_id"), col("band")), col("nblk")),
          pmod(xxhash64(col("incoming_id"), col("band")) + 1, col("nblk"))))
          .as("blk"))
    val banded = idxB.select(col("band"), col("bucket"), col("blk"),
        col("index_id"), col("sim").as("sim_idx"))
      .join(probes, Seq("band", "bucket", "blk"))
      .select("index_id", "incoming_id", "sim_idx", "sim_in").distinct()
      .withColumn("hamming",
        bit_count(col("sim_idx").bitwiseXOR(col("sim_in"))))
      .filter(col("hamming") <= maxHamming)
      .select("index_id", "incoming_id", "hamming")
    // exact fast path (see scaladoc): sim-equality join, one
    // representative (min index id) per fingerprint, so a re-delivered
    // payload can never vanish into a flood bucket. The index
    // pre-aggregates BEFORE the join — an index holding K exact copies
    // of a degenerate fingerprint (exactly the flood case this path
    // exists for) joins as ONE row per sim, not K, keeping the work
    // bounded the way the banded path's block discipline does
    val exact = idx.groupBy("sim").agg(min(col("id")).as("index_id"))
      .join(incoming.select(col("doc_id").as("incoming_id"), col("sim")),
        Seq("sim"))
      .select(col("index_id"), col("incoming_id"), lit(0).as("hamming"))
    banded.unionByName(exact).distinct()
  }

  /** Connected components over an undirected duplicate-pair list —
    * the transitive-closure step that turns pairwise matches into
    * KEEP/DROP decisions (A≈B and B≈C must collapse into one cluster
    * even when A≉C directly).
    *
    * Each iteration is min-label propagation over the edges ("hash-min":
    * a node adopts the smallest label among itself and its neighbors)
    * followed by one pointer-jumping step (`label := label(label)`).
    * The jump composes reachability, so the radius a label has travelled
    * DOUBLES per round instead of growing by one — a path component of
    * diameter d converges in O(log d) rounds, and `maxIter = 20` covers
    * any graph a dedup pipeline can produce (diameter ≲ 2^19) rather
    * than silently mislabeling chains longer than the iteration budget.
    *
    * Scale design, per iteration:
    *  - shuffles carry only (id, label) longs — edges are materialized
    *    once up front via `localCheckpoint`, which also severs the
    *    lineage of the (possibly very expensive) pair computation;
    *  - the new label frame is `localCheckpoint`ed too, so the logical
    *    plan stays O(one iteration) deep forever — a plain persist keeps
    *    data resident but still nests every prior round's plan, and at
    *    real depths the driver's plan analysis/serialization grows
    *    superlinearly (the captured sf0.1 plan was ~5,700 lines before
    *    this);
    *  - convergence costs one cheap aggregate, not a join: every step
    *    (min over neighbors, jump to a smaller node's label) is
    *    per-node non-increasing, so Σlabel is strictly monotone until
    *    the fixpoint — Σlabel unchanged over a full round ⟺ no label
    *    moved ⟺ done. The sum is exact (decimal(38,0)): no overflow at
    *    any id range, no float tolerance.
    *
    * At the fixpoint every label equals its component's minimum id
    * (relax-stability forces label equality along any path to the min).
    *
    * @return (id, label) — label is the component's minimum member id.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
                          bCol: String = "id_b", maxIter: Int = 20): DataFrame =
    connectedComponentsWithStats(pairs, aCol, bCol, maxIter)._1

  /** Convergence outcome of a [[connectedComponentsWithStats]] run:
    * `converged = false` means the iteration budget ran out first and
    * labels may be non-minimal — with pointer jumping that takes a
    * component of diameter > ~2^(maxIter-1), but callers that must not
    * silently ship a partial closure can now check instead of trusting
    * a stderr line. */
  case class CcStats(iterations: Int, converged: Boolean)

  def connectedComponentsWithStats(pairs: DataFrame, aCol: String = "id_a",
                                   bCol: String = "id_b",
                                   maxIter: Int = 20): (DataFrame, CcStats) = {
    // both edge directions from ONE pass over the pair plan: a
    // two-branch union would re-execute the (possibly expensive,
    // uncached) pair pipeline once per branch — at the 100×-rows probe
    // that silently doubled the ngram pair kernel under every
    // components/keep-best/curate run
    // Pre-partitioned by dst ONCE: every round's relax join is keyed on
    // dst, so materializing the checkpoint in that layout means the
    // edge set — the frame that dwarfs the node-sized label frames —
    // never crosses an exchange again (localCheckpoint preserves the
    // physical partitioning; the planner satisfies the join's
    // distribution from it). The old `.distinct()` is gone: every
    // caller feeds (id_a < id_b)-ordered deduplicated pairs, so the
    // two-direction explode cannot produce duplicates, and min-label
    // propagation is multiset-invariant anyway — the distinct was a
    // full extra exchange + aggregate of the edge set for nothing.
    val p = pairs.sparkSession.sessionState.conf.numShufflePartitions
    val edges = pairs
      .select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(p, col("dst")).localCheckpoint()
    CacheRegistry.track(edges)
    def labelSum(df: DataFrame): (java.math.BigDecimal, Long) = {
      val r = df.agg(sum(col("label").cast("decimal(38,0)")).as("s"),
        count(lit(1)).as("n")).head()
      (Option(r.getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO), r.getLong(1))
    }
    // seed with round 1 directly: label = min(self, direct neighbors)
    var current = edges.groupBy("src")
      .agg(least(col("src"), min(col("dst"))).as("label"))
      .select(col("src").as("id"), col("label"))
      .localCheckpoint()
    var prevSum = labelSum(current)
    var it = 0
    var done = false
    // GRAFT_CC_DEBUG: per-round wall-clock to stderr (scale triage)
    val debug = sys.env.contains("GRAFT_CC_DEBUG")
    while (it < maxIter && !done) {
      val t0 = if (debug) System.nanoTime() else 0L
      // relax: label = min over self + neighbors' labels
      val relaxed = edges
        .join(current.select(col("id").as("dst"), col("label")), "dst")
        .select(col("src").as("id"), col("label"))
        .unionAll(current)
        .groupBy("id").agg(min("label").as("label"))
        .persist() // sum materializes it; the jump's two sides read cache
      // Convergence is checked on the RELAXED frame, before the jump:
      // relax is per-node non-increasing, so an unchanged Σlabel means
      // relax was the identity — every neighbor pair already shares a
      // label, each component carries exactly one label, and that label
      // is the component minimum (it is a member id, and every member's
      // label bounds its own id from below). The jump is then the
      // identity too, so the final round — in the common dedup graph,
      // round 2, or round 1's confirmation — skips the jump self-join
      // and the label checkpoint entirely. Non-final rounds pay one
      // extra cache-resident aggregate.
      val sRelax = labelSum(relaxed)
      if (sRelax == prevSum) {
        relaxed.unpersist(false)
        done = true
      } else {
        // jump: label = label(label) — labels are always ids of nodes in
        // the frame (mins over node-id sets), so the lookup is total;
        // left+coalesce only defends the invariant rather than relying
        // on it
        val next = relaxed
          .join(relaxed.select(col("id").as("label"), col("label").as("label2")),
            Seq("label"), "left_outer")
          .select(col("id"), coalesce(col("label2"), col("label")).as("label"))
          .localCheckpoint()
        relaxed.unpersist(false)
        val s = labelSum(next)
        current.unpersist(false)
        current = next
        prevSum = s // relax moved labels this round ⟹ not converged yet
      }
      it += 1
      if (debug)
        System.err.println(f"[graft-cc] round $it: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
          s" (nodes=${prevSum._2}, converged=$done)")
    }
    if (!done)
      System.err.println(s"[graft] connectedComponents: NOT converged after " +
        s"$maxIter doubling rounds (component diameter > ~2^${maxIter - 1}); " +
        "labels may be non-minimal")
    CacheRegistry.track(current)
    (current, CcStats(it, done))
  }

  /** Incremental maintenance of a [[connectedComponents]] labeling: fold
    * a NEW batch of duplicate pairs into an existing (id, label)
    * assignment without re-running the closure over historical edges.
    *
    * Correctness: every existing label is its component's minimum member
    * id, so contracting each new-edge endpoint to its current root
    * preserves reachability, and the closure of the CONTRACTED graph
    * (new edges only — batch-sized, never corpus-sized) yields each
    * merged component's global minimum: the min over merged roots and
    * fresh ids IS the min over all members. Labels therefore stay
    * bit-identical to a from-scratch [[connectedComponents]] over the
    * accumulated pair set (asserted as a differential in DedupSpec and
    * StreamingAnalyticsSpec).
    *
    * Scale shape: historical edges are never touched; `labels` is
    * scanned once, joined map-side against the broadcast-sized root
    * remap (the delta closure runs over ≤ 2·|newPairs| contracted
    * nodes). The return value is a DELTA — one row per id whose label
    * changed or is newly seen — so an append-only store pays
    * batch-sized write amplification, not a snapshot rewrite.
    *
    * @param labels existing assignment (id, label) — label = component
    *               minimum, i.e. prior [[connectedComponents]] /
    *               accumulated increment output
    * @return (id, label) rows for changed or new ids only */
  def connectedComponentsIncrement(labels: DataFrame, newPairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b",
      maxIter: Int = 20): DataFrame = {
    val l = labels.select(col("id"), col("label"))
    val contracted = newPairs
      .select(col(aCol).as("a"), col(bCol).as("b"))
      .join(l.select(col("id").as("a"), col("label").as("ra")), Seq("a"), "left_outer")
      .join(l.select(col("id").as("b"), col("label").as("rb")), Seq("b"), "left_outer")
      .select(coalesce(col("ra"), col("a")).as("id_a"),
        coalesce(col("rb"), col("b")).as("id_b"))
      // endpoints already sharing a root add nothing to the closure
      .filter(col("id_a") =!= col("id_b"))
    val delta = connectedComponents(contracted, maxIter = maxIter)
    // touched roots whose label moved — every member of that root follows
    val rootRemap = delta
      .select(col("id").as("label"), col("label").as("new_label"))
      .filter(col("label") =!= col("new_label"))
    val moved = l.join(broadcast(rootRemap), Seq("label"))
      .select(col("id"), col("new_label").as("label"))
    // ids seen for the first time in any pair
    val fresh = delta.join(l.select(col("id")), Seq("id"), "left_anti")
    moved.unionByName(fresh.select(col("id"), col("label")))
  }

  /** Benchmark decontamination: corpus documents sharing at least
    * `minShared` distinct word n-grams with any probe (benchmark/eval)
    * document — the standard train-test contamination sweep a pipeline
    * runs before training. Same inverted-index shape as
    * [[ngramJaccard]], but bipartite: the corpus side is indexed and
    * df-capped (n-grams appearing in more than `maxDocFreq` corpus docs
    * are boilerplate, not contamination signal — dropping them is what
    * bounds the join at scale), the probe side is typically tiny (a
    * benchmark), and only (gram-hash, id) pairs ever shuffle.
    *
    * @return (doc_id, probe_id, shared_ngrams), self-matches excluded
    *         (a benchmark drawn from the corpus would otherwise match
    *         itself on every gram). */
  def crossNgramOverlap(corpus: DataFrame, probes: DataFrame,
                        idCol: String, textCol: String,
                        n: Int = 5, minShared: Int = 3,
                        maxDocFreq: Int = 100): DataFrame = {
    def grams(df: DataFrame, out: String): DataFrame =
      Par.widen(df)
        .select(col(idCol).as(out), shingleHashes(col(textCol), n).as("grams"))
        .filter(size(col("grams")) > 0)
        .select(col(out), explode(col("grams")).as("g"))
    val corpusGrams = grams(corpus, "doc_id").persist()
    CacheRegistry.track(corpusGrams)
    val hotGrams = corpusGrams.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq).select("g")
    corpusGrams.join(broadcast(hotGrams), Seq("g"), "left_anti")
      .join(grams(probes, "probe_id"), "g")
      .filter(col("doc_id") =!= col("probe_id"))
      .groupBy("doc_id", "probe_id")
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
  }

  /** Exact n-gram Jaccard ≥ threshold via inverted index:
    * explode distinct n-grams → self-join on ngram (df-capped,
    * shuffle-hash) → count shared → Jaccard.
    *
    * Exchange-byte design (the heaviest dedup family at scale — the
    * candidate pair volume is provably ~linear per decade, so BYTES per
    * pair row are the remaining lever):
    *  - postings carry one packed long `sn = surrogate<<32 | n_grams`
    *    besides the 8-byte gram hash — the doc's identity AND size ride
    *    the same 8 bytes, so the size-ratio prefilter costs no width;
    *  - a SIZE-RATIO PREFILTER drops candidate pairs BEFORE the pair
    *    exchange: jaccard ≤ min(na,nb)/max(na,nb), so
    *    min < threshold·max cannot reach the threshold — exact pruning,
    *    boundary kept, no semantic change (the first-principles oracle
    *    is unchanged);
    *  - surviving pairs shuffle as ONE packed long `sa<<32 | sb` + the
    *    count — 16 bytes/row against 24+ for (id_a, id_b, cnt), and the
    *    spill sort compares single longs;
    *  - doc ids already in [0, 2³¹) are their own surrogates (no extra
    *    work); otherwise a dense rank is built by range-partition +
    *    per-partition rank + prefix offsets (two slim shuffles over the
    *    DOC set — never the postings), broadcast back when it fits.
    * Output is bit-identical to the unpacked formulation: the surrogate
    * map is strictly monotone, so `sa < sb ⟺ id_a < id_b`. */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.5,
                   maxDocFreq: Int = 100): DataFrame =
    ngramJaccardPairs(df, idCol, textCol, n, threshold, maxDocFreq,
      crossSplit = None)

  /** [[ngramJaccard]] restricted to CROSS pairs `id_a < split ≤ id_b` —
    * the incremental-exact shape (index docs below the split, incoming
    * at or above). Bit-identical to
    * `ngramJaccard(...).filter(id_a < split && id_b >= split)`: the
    * predicate is a function of the pair key, so it commutes with the
    * shared-count aggregation — pushed into pair emission it prunes the
    * within-side pair stream before the pair exchange instead of after
    * the full kernel. */
  def ngramJaccardAcross(df: DataFrame, idCol: String, textCol: String,
                         split: Long, n: Int = 3, threshold: Double = 0.5,
                         maxDocFreq: Int = 100): DataFrame =
    ngramJaccardPairs(df, idCol, textCol, n, threshold, maxDocFreq,
      crossSplit = Some(split))

  private def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                                n: Int, threshold: Double, maxDocFreq: Int,
                                crossSplit: Option[Long]): DataFrame =
    ngramSharedPairs(df, idCol, textCol, n, maxDocFreq,
        sizeRatioPrefilter = Some(threshold), crossSplit = crossSplit)
      .withColumn("jaccard",
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

  /** Exact n-gram CONTAINMENT ≥ threshold — the asymmetric near-subset
    * signal Jaccard structurally misses: containment
    * `c = |A∩B| / min(|A|,|B|)` of the smaller document's distinct
    * n-gram set in the larger one is ~1 when a short document is quoted
    * verbatim inside a long one, while their Jaccard is tiny (the union
    * is dominated by the long side). The standard companion pass for
    * aggregator pages, quote farms, and boilerplate-wrapped reposts.
    *
    * Same packed inverted-index kernel as [[ngramJaccard]]; the
    * size-ratio prefilter CANNOT apply — wildly different sizes are
    * exactly the signal — so candidate volume is the df-cap bound
    * alone. */
  def ngramContainment(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, threshold: Double = 0.9,
                       maxDocFreq: Int = 100): DataFrame =
    ngramSharedPairs(df, idCol, textCol, n, maxDocFreq,
        sizeRatioPrefilter = None)
      .withColumn("containment",
        col("shared").cast("double") / least(col("na"), col("nb")))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "containment")

  /** The shared inverted-index pair kernel behind [[ngramJaccard]] and
    * [[ngramContainment]]: (id_a, id_b, shared, na, nb) for every
    * df-capped candidate pair (ordered id_a < id_b), with the packed
    * exchange described on [[ngramJaccard]]. `sizeRatioPrefilter`
    * applies the jaccard-only exact pruning (min < t·max ⟹ jaccard < t)
    * before the pair exchange; containment passes None. */
  private def ngramSharedPairs(df: DataFrame, idCol: String,
                               textCol: String, n: Int, maxDocFreq: Int,
                               sizeRatioPrefilter: Option[Double],
                               crossSplit: Option[Long] = None): DataFrame =
    hashSetSharedPairs(
      Par.widen(df).select(col(idCol).as("doc_id"),
        shingleHashes(col(textCol), n).as("grams")),
      maxDocFreq, sizeRatioPrefilter, crossSplit)

  /** Exact FRAME-SET containment for VIDEO clips — the subclip/trim
    * detector [[videoSigDups]] structurally misses: the majority-vote
    * signature is stable under small per-frame perturbations, but a
    * TRIMMED clip (half the frames dropped) or a subclip spliced into
    * a longer reel shares only part of the frame set and sits far
    * outside any Hamming radius. Containment
    * `c = |A∩B| / min(|A|,|B|)` of the smaller clip's DISTINCT
    * per-frame dHashes in the larger one is ~1 for a verbatim subclip
    * — [[ngramContainment]]'s signal one modality up, and the SAME
    * packed inverted-index kernel ([[hashSetSharedPairs]]): frame
    * hashes are the grams, one codegen'd walk+decode pass per clip
    * ([[graft.functions.VideoExpressions.videoFrameHashes]]), then
    * only (hash, packed-id) longs shuffle — frames never cross the
    * wire. The df cap bounds degenerate common frames (solid-color
    * intros) exactly as it bounds boilerplate n-grams; refusals (any
    * undecodable frame) drop before the index. */
  def videoFrameContainment(df: DataFrame, idCol: String, mediaCol: String,
                            threshold: Double = 0.8,
                            maxDocFreq: Int = 64): DataFrame =
    hashSetSharedPairs(
      Par.widen(df).select(col(idCol).as("doc_id"),
        graft.functions.VideoExpressions.videoFrameHashes(col(mediaCol))
          .as("grams")),
      maxDocFreq, sizeRatioPrefilter = None)
      .withColumn("containment",
        col("shared").cast("double") / least(col("na"), col("nb")))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "containment")

  /** The hash-set half of [[ngramSharedPairs]], taking a prepared
    * `(doc_id, grams array<long>)` frame — shared by the text n-gram
    * families and [[videoFrameContainment]] (any per-document hash SET
    * pairs through the same packed exchange). Null or empty sets drop
    * here (refusal/empty docs can't pair). */
  private def hashSetSharedPairs(hashed: DataFrame, maxDocFreq: Int,
                                 sizeRatioPrefilter: Option[Double],
                                 crossSplit: Option[Long] = None): DataFrame = {
    // cached: consumed by the id-bounds probe, the inverted index, and
    // the final size lookups
    val grams = hashed
      .filter(col("grams").isNotNull && size(col("grams")) > 0)
      .persist()
    CacheRegistry.track(grams)
    val lo32 = 0xFFFFFFFFL
    // Ids already in [0, 2^31) are their own surrogates: `sn` is computed
    // MAP-SIDE inside the explode (no join at all — the common case).
    // Otherwise a dense monotone rank map is built over the doc set and
    // attached to the postings — broadcast while its HASHED relation
    // fits the heap budget ([[broadcastRowCutoff]]: ~56 B/doc hashed,
    // not the 16 B raw), shuffle join beyond.
    val bounds = grams.agg(min("doc_id"), max("doc_id"), count(lit(1))).head()
    val direct = bounds.isNullAt(0) ||
      (bounds.getLong(0) >= 0L && bounds.getLong(1) < (1L << 31))
    val nDocs = if (bounds.isNullAt(2)) 0L else bounds.getLong(2)
    // (doc_id, s, n_grams): s strictly monotone in doc_id, < 2^32
    val docsMeta =
      if (direct)
        grams.select(col("doc_id"), col("doc_id").as("s"),
          size(col("grams")).as("n_grams"))
      else {
        val m = surrogateIds(grams, nDocs).persist()
        CacheRegistry.track(m)
        m
      }
    val inverted = grams.select(col("doc_id"),
      size(col("grams")).as("n_grams"), explode(col("grams")).as("g"))
    // df cap enforced INSIDE the pair-grouping aggregate (r22): the
    // bounded collect below keeps at most maxDocFreq+1 postings per gram
    // — every partial buffer, shuffled block and merged group is capped,
    // so a boilerplate gram present in every document costs O(cap)
    // memory and O(map-partitions · cap) shuffle bytes — and groups that
    // hit the limit are exactly the df > maxDocFreq grams. Filtering
    // them after the aggregate is relationally identical to the old
    // broadcast anti-join against a separately aggregated hot-gram set,
    // which cost a SECOND full pass over the postings (explode + count
    // aggregate + broadcast build) per kernel invocation.
    //
    // The one regime that still pre-drops hot postings: surrogate ids
    // too numerous to broadcast, where the postings must SHUFFLE by
    // doc_id to pick up `s` before the pair grouping — without the
    // pre-cap, every posting of every boilerplate gram would ride that
    // exchange just to be dropped at the group filter.
    val surrogateShuffle = !direct && nDocs > broadcastRowCutoff(bytesPerRow = 56)
    val preCapped = if (surrogateShuffle) {
      val hotGrams = inverted.groupBy("g").agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDocFreq)
        .select("g")
      inverted.join(broadcast(hotGrams), Seq("g"), "left_anti")
    } else inverted
    val capped = (if (direct)
        preCapped.select(col("g"), shiftleft(col("doc_id"), 32)
          .bitwiseOR(col("n_grams").cast("long")).as("sn"))
      else {
        val sn = shiftleft(col("s"), 32).bitwiseOR(col("n_grams").cast("long"))
        val slim = docsMeta.select(col("doc_id"), sn.as("sn"))
        preCapped.drop("n_grams")
          .join(if (surrogateShuffle) slim else broadcast(slim), "doc_id")
          .select("g", "sn")
      })
    // GROUPED pair generation: one groupBy(g) exchange of the postings,
    // then the per-gram pair set is generated MAP-SIDE by a nested
    // higher-order transform over the collected (df-cap-bounded, ≤
    // maxDocFreq-long) posting array. The previous shuffle-hash self-join
    // exchanged the SAME cached posting frame twice (the planner does not
    // reuse the exchange across the x/y aliases) and built a hash table
    // per partition on top; keyed the same way, the groupBy produces the
    // bit-identical candidate pair stream from ONE exchange (guide §2.4),
    // and `capped` becomes single-consumer so it no longer persists.
    // Boundedness: the bounded collect in the aggregate itself caps every
    // buffer at maxDocFreq+1 longs (see CollectUpToLongs), so a collected
    // array is never corpus-sized even for boilerplate grams; the size
    // filter then drops the df > maxDocFreq groups exactly.
    def su(c: Column) = call_function("shiftright", c, lit(32)).bitwiseAND(lo32)
    // crossSplit: restrict emission to pairs with id_a < split ≤ id_b —
    // the incremental-exact shape. A predicate on the PAIR KEY commutes
    // with the shared-count aggregation, so pushing it below the pair
    // exchange prunes the within-side pair stream (the dominant volume)
    // with bit-identical surviving rows. The doc-id threshold translates
    // to surrogate space through monotonicity: rank(split) = #docs below
    // it (one count over the cached meta frame in the surrogate regime).
    val sSplit: Option[Long] = crossSplit.map { sp =>
      if (direct) sp
      else docsMeta.filter(col("doc_id") < sp).count()
    }
    def pairOk(x: Column, y: Column): Column = {
      val ordered = su(x) < su(y)
      val base = sizeRatioPrefilter.fold(ordered) { t =>
        val nx = x.bitwiseAND(lo32)
        val ny = y.bitwiseAND(lo32)
        ordered && least(nx, ny).cast("double") >= lit(t) * greatest(nx, ny)
      }
      sSplit.fold(base)(s => base && su(x) < lit(s) && su(y) >= lit(s))
    }
    val shared = capped.groupBy("g")
      .agg(graft.functions.AggregateExpressions
        .collectUpToLongs(col("sn"), maxDocFreq + 1).as("lst"))
      .filter(size(col("lst")) <= maxDocFreq)
      .select(explode(flatten(transform(col("lst"), x =>
        transform(filter(col("lst"), y => pairOk(x, y)), y =>
          shiftleft(su(x), 32).bitwiseOR(su(y)))))).as("p"))
      .groupBy("p")
      .agg(count(lit(1)).as("shared"))
    shared
      .join(docsMeta.select(col("s").as("sa"),
        col("doc_id").as("id_a"), col("n_grams").as("na")),
        call_function("shiftright", col("p"), lit(32)).bitwiseAND(lo32) === col("sa"))
      .join(docsMeta.select(col("s").as("sb"),
        col("doc_id").as("id_b"), col("n_grams").as("nb")),
        col("p").bitwiseAND(lo32) === col("sb"))
      .select("id_a", "id_b", "shared", "na", "nb")
  }

  /** Dense monotone surrogate ids for a [[ngramJaccard]]-shaped grams
    * frame whose ids don't fit 32 bits: (doc_id, s, n_grams) with `s`
    * strictly increasing in doc_id and < 2³². Range partition →
    * per-partition rank → prefix offsets collected to the driver (≤ one
    * row per partition — model-sized). The ranged frame is
    * localCheckpoint'ed before its two consumers so the sampled range
    * boundaries cannot differ between the counts job and the rank job. */
  private def surrogateIds(grams: DataFrame, nDocs: Long): DataFrame = {
    require(nDocs < (1L << 32),
      s"ngramJaccard surrogate space is 32-bit; got $nDocs documents")
    val base = grams.select(col("doc_id"), size(col("grams")).as("n_grams"))
    val spark = grams.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val ranged = base.repartitionByRange(p, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val counts = ranged.groupBy("pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1).zip(
      counts.map(_._2).scanLeft(0L)(_ + _)).toMap
    val offCol = element_at(
      typedLit(offsets.map { case (k, v) => (k, v) }), col("pid"))
    val w = Window.partitionBy("pid").orderBy("doc_id")
    ranged.withColumn("s", offCol + row_number().over(w) - 1)
      .select(col("doc_id"), col("s"), col("n_grams"))
  }

  /** Sub-document (span-level) exact dedup — the C4/RefinedWeb-style
    * pass that whole-document dedup cannot express: documents are cut
    * into consecutive `chunkTokens`-token spans, and of every span text
    * repeated ANYWHERE in the corpus only the FIRST occurrence (smallest
    * (id, span index)) survives; each document is reassembled from its
    * surviving spans in order. Catches boilerplate headers/footers and
    * quoted passages replicated across otherwise-distinct pages.
    *
    * Scale shape: span TEXT never shuffles. The segmentation is map-side
    * (split + slice + md5 inside the scan); the exchanges carry only
    * (md5, id, idx) rows for the first-occurrence aggregation and
    * (id, idx) for the per-document surviving-index list; reassembly
    * re-derives span text from the original document in one final keyed
    * join with the (small) index list. Exactness comes from the 128-bit
    * md5 span key (not a 64-bit hash — at 10^11 spans the birthday bound
    * on 64 bits would silently merge distinct spans).
    *
    * @return (id, text_deduped, n_spans, n_kept) — one row per input
    *         document; a document whose every span lost the race
    *         reassembles to the empty string (n_kept = 0). */
  def spanDedup(df: DataFrame, idCol: String, textCol: String,
                chunkTokens: Int = 20): DataFrame = {
    require(chunkTokens >= 1, "chunkTokens must be >= 1")
    val toks = split(col(textCol), " ")
    val nSpans = ceil(size(toks).cast("double") / chunkTokens).cast("int")
    val spanAt = (i: Column) =>
      array_join(slice(toks, i * chunkTokens + 1, lit(chunkTokens)), " ")
    // slim span rows: (md5, id, idx) — the span text dies inside the scan
    val spans = df.select(col(idCol).as("id"),
        posexplode(transform(sequence(lit(0), nSpans - 1), spanAt)))
      .select(md5(col("col")).as("h"), col("id"), col("pos").as("idx"))
    // first occurrence per span text, totally ordered by (id, idx)
    val first = spans.groupBy("h")
      .agg(min(struct(col("id"), col("idx"))).as("f"))
    val kept = spans.join(first, "h")
      .filter(col("id") === col("f.id") && col("idx") === col("f.idx"))
      .groupBy("id")
      .agg(sort_array(collect_list(col("idx"))).as("keep_idx"),
        count(lit(1)).cast("long").as("n_kept"))
    // reassemble from the original text — one keyed join, spans re-cut
    // map-side from the surviving index list
    df.select(col(idCol).as("id"), col(textCol).as(textCol))
      .join(kept, Seq("id"), "left_outer")
      .select(col("id").as(idCol),
        when(col("keep_idx").isNull, lit(""))
          .otherwise(array_join(
            transform(col("keep_idx"), i => spanAt(i)), " "))
          .as("text_deduped"),
        nSpans.cast("long").as("n_spans"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Exact duplicated-substring detection — the suffix-array substring
    * dedup of Lee et al. 2022 ("Deduplicating Training Data Makes
    * Language Models Better") re-expressed relationally with rolling
    * shingles: a token offset `i` of a document is DUPLICATED when the
    * `spanTokens`-token span starting at `i` occurs (by exact text)
    * more than once anywhere in the corpus — at ANY offset of any
    * document, including elsewhere in the same document. Overlapping and
    * adjacent duplicated offsets merge into maximal spans, so a 500-token
    * boilerplate block shared at arbitrary alignment reports as ONE
    * `[start, start+500+spanTokens)` interval per occurrence — the thing
    * [[spanDedup]]'s fixed 20-token grid cannot see when the copies are
    * shifted by a few tokens.
    *
    * Scale shape (the shingle stream is one row per TOKEN — the heaviest
    * stream in the dedup family, so exchange bytes are the design):
    *  1. count pass over 64-bit `xxhash64` shingle keys — 16 B/row with
    *     map-side combine. A 64-bit count ≥ 2 has NO false negatives, so
    *     this pass exactly bounds the candidate set;
    *  2. the (tiny) candidate key set broadcasts back into a fresh
    *     map-side shingle scan — the full stream never shuffles again;
    *     only candidate rows compute the 128-bit md5 and re-count, which
    *     removes 64-bit birthday collisions (at 10^11 shingles a pure
    *     64-bit count would silently merge distinct spans — the
    *     [[spanDedup]] exactness argument);
    *  3. island merge is a per-document window over the few duplicated
    *     offsets (bounded by document length, never corpus-wide).
    * Both passes re-derive shingles inside the scan (CPU, no cache): at
    * corpus scale a persisted token-wide frame is memory none of the
    * exchanges need.
    *
    * @return (doc_id, span_start, span_end, span_len) — one row per
    *         maximal duplicated span, token offsets 0-based, `span_end`
    *         exclusive. Documents shorter than `spanTokens` tokens have
    *         no spans by construction. */
  def dupSpans(df: DataFrame, idCol: String, textCol: String,
               spanTokens: Int = 20): DataFrame = {
    require(spanTokens >= 1, "spanTokens must be >= 1")
    val L = spanTokens
    val toks = split(col(textCol), " ")
    // POSITIONAL 64-bit window hashes, one per token offset (docs shorter
    // than L contribute none): chained XXH64 over the per-word hashes —
    // a pure function of the span's token sequence, so equal span text
    // implies equal key and a count ≥ 2 over these keys is an exact
    // superset of the md5 duplicate set. Replaces xxhash64(span STRING):
    // the old pass built an ~L-token string per token offset (O(tokens·L)
    // chars per doc) in BOTH passes — the dominant map cost; the window
    // hashes are O(tokens·L) long ops off one per-word hash array.
    val winHashes = graft.functions.VectorExpressions.hashShinglesAll(
      transform(toks, w => xxhash64(w)), L)
    // pass 1: 64-bit candidate count (exact superset of the dup set) —
    // keys only, no id/idx, no span strings
    val cand64 = Par.widen(df)
      .select(explode(winHashes).as("h"))
      .groupBy("h").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select("h").persist()
    CacheRegistry.track(cand64)
    // bounds probe (the ngramJaccard discipline): broadcast the candidate
    // key set only while its HASHED relation fits the memory budget
    // ([[broadcastRowCutoff]] — heap-derived, not a row constant); a
    // corpus whose duplicated-shingle set is larger falls back to a
    // shuffle semi-join — the full stream pays one exchange, the
    // spanDedup price, still exact
    val nCand = cand64.count()
    // pass 2: md5 recheck of candidates only. In the broadcast regime the
    // window hashes explode first and the map-side semi-join filters
    // BEFORE the span string is assembled, so only candidate offsets pay
    // the array_join + md5 — all inside one codegen stage, the token
    // array never crosses an exchange. The shuffle-fallback regime keeps
    // the span-string-per-offset shape (the string, not the O(tokens)
    // token array, is what may ride that exchange).
    val candRows = (if (nCand <= broadcastRowCutoff(bytesPerRow = 48))
        Par.widen(df)
          .select(col(idCol).as("id"), toks.as("w"), posexplode(winHashes))
          .withColumnRenamed("col", "h")
          .join(broadcast(cand64), Seq("h"), "left_semi")
          .select(col("id"), col("pos").as("idx"),
            array_join(slice(col("w"), col("pos") + 1, lit(L)), " ").as("span"))
      else
        Par.widen(df)
          .select(col(idCol).as("id"), toks.as("w"), posexplode(winHashes))
          .withColumnRenamed("col", "h")
          .select(col("h"), col("id"), col("pos").as("idx"),
            array_join(slice(col("w"), col("pos") + 1, lit(L)), " ").as("span"))
          .join(cand64, Seq("h"), "left_semi"))
      .select(unhex(md5(col("span"))).as("m"), col("id"), col("idx"))
    val dupOff = candRows.join(
        candRows.groupBy("m").agg(count(lit(1)).as("c"))
          .filter(col("c") > 1).select("m"),
        Seq("m"), "left_semi")
      .select(col("id"), col("idx"))
    // pass 3: merge offsets i with gap <= L into maximal [min, max+L)
    mergeDupOffsets(dupOff, idCol, L)
  }

  /** Island merge shared by [[dupSpans]] and [[dupSpansAgainst]]:
    * duplicated offsets with gap ≤ L coalesce into maximal
    * [min, max+L) spans — a per-document window (bounded by document
    * length, never corpus-wide). Input: (id, idx) rows. */
  private def mergeDupOffsets(dupOff: DataFrame, idCol: String,
                              L: Int): DataFrame = {
    val byDoc = Window.partitionBy("id").orderBy("idx")
    dupOff
      .withColumn("f", when(lag(col("idx"), 1).over(byDoc).isNull
          .or(col("idx") - lag(col("idx"), 1).over(byDoc) > L), 1)
        .otherwise(0))
      .withColumn("g", sum(col("f")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("id").as(idCol), col("g"))
      .agg(min(col("idx")).cast("long").as("span_start"),
        (max(col("idx")) + L).cast("long").as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_len"))
  }

  /** Rolling 128-bit shingle stream: (m = unhex(md5(span)), id, idx),
    * one row per token offset; docs shorter than L contribute none. */
  private def md5Shingles(df: DataFrame, idCol: String, textCol: String,
                          L: Int): DataFrame = {
    val toks = split(col(textCol), " ")
    val spanAt = (i: Column) => array_join(slice(toks, i + 1, lit(L)), " ")
    Par.widen(df).filter(size(toks) >= L)
      .select(col(idCol).as("id"),
        posexplode(transform(sequence(lit(0), size(toks) - L), spanAt)))
      .select(unhex(md5(col("col"))).as("m"), col("id"), col("pos").as("idx"))
  }

  /** Standing shingle-count index for [[dupSpansAgainst]] — the state a
    * continuous-ingest pipeline maintains between batches: EVERY
    * distinct rolling span key of the standing corpus with its
    * occurrence count (singletons included — a standing singleton plus
    * one incoming copy IS a duplicate). Keys are the full 128-bit md5
    * (the [[spanDedup]] exactness bound); the only exchange is the
    * count aggregate, map-side combined.
    *
    * @return (m BINARY(16), cnt) — persist it once, columnar. */
  def dupSpanIndex(standing: DataFrame, idCol: String, textCol: String,
                   spanTokens: Int = 20): DataFrame =
    md5Shingles(standing, idCol, textCol, spanTokens)
      .groupBy("m").agg(count(lit(1)).as("cnt"))

  /** Incremental [[dupSpans]]: duplicated maximal spans in an INCOMING
    * batch, counting occurrences across standing ∪ incoming — exactly
    * `dupSpans(standing ∪ incoming)` restricted to incoming documents
    * (counts add, so the restriction is an identity, spec-pinned by a
    * random-corpus differential). Spans newly created inside standing
    * documents are the next full recompute's business — the
    * [[graft.queries.ExtensionQueries.dedupIncremental]] contract.
    *
    * Scale shape: the standing index never shuffles — the batch's key
    * counts broadcast into ONE column-pruned (m, cnt) index scan per
    * batch; everything downstream is batch-sized. At 100 TB the scan is
    * the per-batch price (amortize by batching arrivals); the index
    * itself updates by merging the batch's counts — an append plus a
    * periodic compaction, never a rebuild.
    *
    * @param index (m, cnt) frame from [[dupSpanIndex]]; MULTIPLE rows
    *              per key are summed, so a batch_id-partitioned append
    *              index (the streaming intake's layout) works uncompacted
    * @return (id, span_start, span_end, span_len) over incoming docs. */
  def dupSpansAgainst(index: DataFrame, incoming: DataFrame,
                      idCol: String, textCol: String,
                      spanTokens: Int = 20): DataFrame = {
    val L = spanTokens
    require(L >= 1, "spanTokens must be >= 1")
    // bounds probe: the broadcast-batch regime is for MICRO-BATCH-sized
    // incoming frames (the streaming intake); a bulk reprocess whose
    // "incoming" side is corpus-sized must not broadcast corpus-sized
    // key counts — drop the hints and let AQE pick the build side (for
    // the usual small standing index that inverts to broadcasting IT)
    val micro = incoming.count() <= 100000L
    def maybeBcast(df: DataFrame): DataFrame = if (micro) broadcast(df) else df
    val incSh = md5Shingles(incoming, idCol, textCol, L)
    val batchCnt = incSh.groupBy("m").agg(count(lit(1)).as("bcnt"))
    // keys duplicated across standing+batch: inner broadcast join keeps
    // the index scan map-side, and the count sum aggregates the (tiny)
    // batch-keys-only survivor frame — never the whole index;
    // batch-internal dups union in separately
    val dupKeys = index.join(maybeBcast(batchCnt), Seq("m"))
      .groupBy("m")
      .agg(sum(col("cnt")).as("cnt"), max(col("bcnt")).as("bcnt"))
      .filter(col("cnt") + col("bcnt") >= 2).select("m")
      .unionByName(batchCnt.filter(col("bcnt") >= 2).select("m"))
      .distinct()
    val dupOff = incSh.join(maybeBcast(dupKeys), Seq("m"), "left_semi")
      .select(col("id"), col("idx"))
    mergeDupOffsets(dupOff, idCol, L)
  }

  /** Apply [[dupSpans]]: strip EVERY duplicated maximal span from every
    * document — the conservative (RefinedWeb-style) removal policy. All
    * occurrences go, not all-but-one: once spans from different
    * documents merge at different boundaries, "first occurrence" has no
    * well-defined owner at span granularity, and for training data the
    * cheap safe answer is that boilerplate present twice anywhere is
    * worth keeping nowhere.
    *
    * Scale shape: [[dupSpans]]'s interval rows are the ONLY addition to
    * the document scan — a per-document handful of (start, end) structs
    * collected into one array and joined back by id; the strip itself is
    * a codegen higher-order filter over the token array (no explode, no
    * extra exchange beyond the one keyed join).
    *
    * @return (id, text_stripped, n_tokens, n_dup_tokens) — one row per
    *         input document, text reassembled from surviving tokens in
    *         order (empty string when everything was duplicated). */
  def stripDupSpans(df: DataFrame, idCol: String, textCol: String,
                    spanTokens: Int = 20): DataFrame = {
    val spans = dupSpans(df, idCol, textCol, spanTokens)
      .groupBy(idCol)
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("sp"))
    val toks = split(col(textCol), " ")
    df.select(col(idCol), col(textCol))
      .join(spans, Seq(idCol), "left_outer")
      .select(col(idCol), toks.as("w"),
        coalesce(col("sp"),
          array().cast("array<struct<span_start:bigint,span_end:bigint>>"))
          .as("sp"))
      // kept materialized ONCE below both consumers (the Relevance.bm25
      // cross-operator-CSE discipline)
      .withColumn("kept", filter(col("w"), (_, i) =>
        !exists(col("sp"), s =>
          i >= s.getField("span_start") && i < s.getField("span_end"))))
      .select(col(idCol),
        array_join(col("kept"), " ").as("text_stripped"),
        size(col("w")).cast("long").as("n_tokens"),
        (size(col("w")) - size(col("kept"))).cast("long").as("n_dup_tokens"))
  }
}
