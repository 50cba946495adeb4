package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time streaming analytics over the live `events` stream — the
  * §2.5 analytic surface applied before events ever land in storage:
  * watermarked tumbling/sliding window aggregation and streaming
  * deduplication. All standard Structured Streaming operators (the
  * sessionizer's custom state lives in [[StreamingSessionize]]; these are
  * the built-in pieces a monitoring pipeline composes around it).
  */
object StreamingAnalytics {

  /** Exact fixed-point sum of a double column (same determinism contract
    * as the batch queries). */
  private def fxSum(c: Column, scale: Long): Column =
    sum(floor(c * lit(scale.toDouble) + lit(0.5)).cast("long")).cast("double") / lit(scale.toDouble)

  /** Windowed per-status counts with an event-time watermark: late data
    * beyond `lateness` is dropped, and in append mode a window emits once
    * the watermark passes its end — the streaming analogue of the
    * time-range GROUP BY the reference delegates to ClickHouse.
    *
    * @param events any dataframe with `timestamp` + `status` columns
    *               (e.g. the sessionizer's output stream)
    */
  def windowedStatusCounts(events: DataFrame,
                           windowLen: String = "5 minutes",
                           slide: Option[String] = None,
                           lateness: String = "10 minutes"): DataFrame = {
    val w = slide.map(s => window(col("timestamp"), windowLen, s))
      .getOrElse(window(col("timestamp"), windowLen))
    events.withWatermark("timestamp", lateness)
      .groupBy(w.as("win"), col("status"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("win.start").as("window_start"), col("win.end").as("window_end"),
        col("status"), col("n_events"))
  }

  /** Windowed approximate distinct-count over a keyed stream via the
    * same mergeable DataSketches HLL aggregate the batch cube uses
    * ([[graft.operators.Sketches]]): per-(window, key) state is one
    * 2^lgK-byte sketch, not a user set — a hot window costs KBs of
    * state where `collect_set`/exact distinct would hold every id.
    * Partial sketches merge map-side and across micro-batches, so the
    * estimate carries the batch bound (~1.6% rsd at lgK 12), gated in
    * StreamingAnalyticsSpec against the batch roll-up of the same rows.
    * Append mode: a window's final estimate emits once the watermark
    * passes its end. */
  def windowedDistinctUsers(events: DataFrame,
                            keyCol: String = "event_type",
                            idCol: String = "user_id",
                            windowLen: String = "5 minutes",
                            lateness: String = "10 minutes",
                            lgK: Int = 12): DataFrame =
    events.withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen).as("win"), col(keyCol))
      .agg(hll_sketch_estimate(hll_sketch_agg(col(idCol), lit(lgK)))
        .as("approx_distinct"))
      .select(col("win.start").as("window_start"),
        col("win.end").as("window_end"), col(keyCol), col("approx_distinct"))

  /** Streaming exact dedup: keep the first record per content hash within
    * the watermark horizon (state is purged as the watermark advances —
    * bounded memory at any scale; an unbounded-horizon exact dedup is the
    * batch operator's job). */
  def streamingDedup(records: DataFrame, textCol: String,
                     lateness: String = "10 minutes"): DataFrame =
    records
      .withColumn("content_sha", sha2(col(textCol), 256))
      .withWatermark("timestamp", lateness)
      .dropDuplicatesWithinWatermark("content_sha")

  /** Streaming corpus intake — the batch corpus_clean gate applied as
    * documents ARRIVE. The dedup key is the same whitespace-normalized
    * lowercased `fingerprint` the batch gate canonicalizes on
    * ([[graft.operators.TextAnalysis.fingerprintMd5]] via
    * [[graft.operators.TextAnalysis.cleanEnrich]]) — NOT a raw content
    * hash, so case/whitespace near-duplicates gate identically in both
    * modes; the quality/language expressions are the same stateless
    * scan columns (streaming semantics ≡ batch semantics by
    * construction, pinned by the differential test). Differences from
    * batch, by necessity: state is watermark-bounded (an
    * unbounded-horizon dedup is the batch operator's job), and "keep
    * smallest id" becomes "keep first arrival". Documents below
    * `minQuality` are dropped. */
  def corpusIntake(docs: DataFrame, textCol: String = "text",
                   minQuality: Double = 0.5,
                   lateness: String = "10 minutes"): DataFrame = {
    import graft.operators.TextAnalysis
    TextAnalysis.cleanEnrich(docs, textCol)
      .withWatermark("timestamp", lateness)
      .dropDuplicatesWithinWatermark("fingerprint")
      .filter(col("quality_score") >= minQuality)
  }

  /** NEAR-dedup streaming intake — "dedupe today's crawl against the
    * index", wired to streaming: a `foreachBatch` gate that, per
    * micro-batch,
    *
    *  1. applies the [[corpusIntake]] quality gate and an exact
    *     within-batch dedup (keep smallest id per normalized
    *     fingerprint — the batch operator's deterministic keep rule;
    *     cross-batch exact dups are a jaccard-1.0 case of step 2);
    *  2. drops within-batch near-duplicates
    *     ([[graft.operators.Dedup.minhashLsh]], keep the pair minimum);
    *  3. drops documents near-duplicating the STANDING INDEX at
    *     `indexPath` ([[graft.operators.Dedup.minhashLshAgainstPrepared]]
    *     — the index stores PREPARED (id, sh, sig) rows, so batch
    *     ingest joins stored signatures instead of re-hashing the whole
    *     index every batch: at 100 TB each index document is shingled
    *     exactly once, at admission);
    *  4. appends the survivors' prepared rows to the index, partitioned
    *     by `batch_id` with dynamic partition overwrite — a RETRIED
    *     micro-batch overwrites its own partition instead of
    *     double-inserting (foreachBatch's at-least-once contract made
    *     idempotent), then hands the surviving documents to `sink`.
    *
    * The gate is ordered so the index only ever receives documents that
    * passed every filter — admission order between batches is the
    * stream's arrival order, exactly like the exact-dedup intake's
    * keep-first-arrival. Use with
    * `docs.writeStream.foreachBatch(gate).start()`.
    *
    * Input batches need `doc_id` + `textCol` columns (the intake's keep
    * rules are id-based). "Drop the larger id of any qualifying pair"
    * is the same policy batch consumers apply to [[Dedup.minhashLsh]]
    * output — transitive chains may over-drop (a~b, b~c drops both b
    * and c); clustering beyond pairs is [[Dedup]]'s
    * connected-components job, deliberately not a per-batch cost.
    *
    * @param sink receives (survivors with quality/langid columns,
    *             batchId) AFTER the index append — write to the corpus
    *             store, metrics, etc. */
  /** Hybrid-retrieval SERVE intake: each micro-batch of queries
    * (query_id, text, embedding) is fused against a STANDING corpus —
    * the lexical leg from a prepared
    * [[graft.operators.Relevance.LexIndex]] (persisted once via
    * [[graft.operators.Relevance.saveLexIndex]]), the vector leg exact
    * cosine over the standing embeddings — through
    * [[graft.operators.Relevance.rrfFuse]]. Stateless serve: no index
    * growth, no checkpoint-ordering hazard; per batch the standing
    * frames are scanned column-pruned while query tokens/vectors
    * broadcast, so batch cost is query-sized work over one index pass.
    * Query ids should be disjoint from corpus doc ids (an id-equal
    * candidate is excluded as a self-match, the drawn-from-corpus
    * convention). Swap the vector leg for the IVF/PQ serve frames when
    * the standing corpus outgrows brute force — [[graft.operators.Relevance.rrfFuse]]
    * only consumes (query_id, cand_id, rank).
    *
    * @param sink receives the fused
    *             (query_id, cand_id, lex_rank, vec_rank, rrf, rank). */
  def hybridServeIntake(lexIndexPath: String, embPath: String,
                        legK: Int = 20, k: Int = 5, rrfK: Int = 60,
                        sink: (DataFrame, Long) => Unit = (_, _) => ())
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    import graft.operators.{Relevance, Similarity}
    val spark = batch.sparkSession
    val lex = Relevance.lexicalJaccardTopK(
      batch.select(col("query_id"), col("text")),
      Relevance.loadLexIndex(spark, lexIndexPath), legK)
    val vec = Similarity.bruteForceTopK(
        batch.select(col("query_id"), col("embedding")),
        spark.read.parquet(embPath), legK,
        qId = "query_id", qVec = "embedding")
      .select(col("query_id"), col("cand_id"), col("rank"))
    sink(Relevance.rrfFuse(Seq("lex" -> lex, "vec" -> vec),
      k = k, rrfK = rrfK), batchId)
  }

  /** Substring-dedup intake: each micro-batch is scanned for duplicated
    * maximal spans against the STANDING shingle-count index plus the
    * batch itself ([[graft.operators.Dedup.dupSpansAgainst]] — provably
    * the full-corpus [[graft.operators.Dedup.dupSpans]] restricted to
    * the batch's documents, because occurrence counts add), then the
    * batch's own shingle counts append to the index as its `batch_id`
    * partition. Per-batch cost: one column-pruned index scan (the batch
    * key counts broadcast — the index never shuffles) + batch-sized work.
    *
    * At-least-once discipline (the [[nearDedupIntake]] contracts): a
    * replayed batch excludes its OWN `batch_id` partition from the
    * standing side, so counts it already appended cannot self-flag, and
    * the dynamic partition overwrite makes the re-append idempotent.
    * Compaction (folding old partitions into `batch_id = -1`) must only
    * fold batches older than the checkpoint horizon — folding an
    * in-flight batch would make its replay self-match.
    *
    * @param sink receives ((id, span_start, span_end, span_len), batchId)
    *             for the batch's documents after the index append; the
    *             span rows are checkpointed BEFORE it, because their
    *             plan reads the index path the append extends
    *             (the [[nearDedupIntake]] recacheByPath hazard). */
  def substringIntake(indexPath: String, spanTokens: Int = 20,
                      idCol: String = "doc_id", textCol: String = "text",
                      sink: (DataFrame, Long) => Unit = (_, _) => ())
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    import graft.operators.{Artifacts, Dedup}
    val spark = batch.sparkSession
    val docs = batch.select(col(idCol), col(textCol))
    try {
      val spans =
        (if (Artifacts.hasData(spark, indexPath))
          Dedup.dupSpansAgainst(
            spark.read.parquet(indexPath)
              .filter(col("batch_id") =!= lit(batchId))
              .select(col("m"), col("cnt")),
            docs, idCol, textCol, spanTokens)
        // first batch: no standing counts — batch-internal dups only,
        // which is exactly dupSpans of the batch
        else Dedup.dupSpans(docs, idCol, textCol, spanTokens))
          .localCheckpoint(true)
      Dedup.dupSpanIndex(docs, idCol, textCol, spanTokens)
        .select(col("m"), col("cnt"), lit(batchId).as("batch_id"))
        .write
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .mode("overwrite")
        .parquet(indexPath)
      sink(spans, batchId)
    } finally graft.operators.CacheRegistry.releaseAll()
  }

  /** Streaming FINGERPRINT dedup intake — continuous near-duplicate
    * admission for any 64-bit perceptual fingerprint (image dHash via
    * [[graft.functions.ImageExpressions.dhashImage]], audio envelopes
    * via [[graft.functions.AudioExpressions.audioEnvHash]], text
    * SimHash via the simhash kernel): each micro-batch fingerprints
    * its payloads in one codegen'd map pass, dedups within the batch
    * ([[graft.operators.Dedup.simhashPairsFrom]] — drop the larger id
    * of any pair within `maxHamming`), then matches survivors against
    * the STANDING index of every admitted fingerprint
    * ([[graft.operators.Dedup.hammingAgainst]] — bounded bipartite
    * banding, only (id, hash) longs ever shuffle, never pixels or
    * samples) and admits what nothing matched. Admitted (id, sim) rows
    * append as the batch's `batch_id` partition.
    *
    * At-least-once idempotency is [[nearDedupIntake]]'s discipline
    * verbatim: the batch's own partition is excluded on read (a
    * replayed batch cannot self-match) and the re-append overwrites its
    * own partition dynamically. An id-equal match against another LIVE
    * partition is a source re-delivering the same document and dedups
    * the incoming copy. Mid-stream compaction is supported via
    * [[compactFingerprintIndex]] at BATCH START (the [[compactIndex]]
    * hook discipline: fold only batches below the one about to run, so
    * a retried batch's own partition is never duplicated into the
    * compacted generation).
    *
    * REFUSALS (null fingerprint — undecodable payloads, clips/images
    * below the kernel's floor) PASS THROUGH to the sink with `sim`
    * null and are never indexed: an engine that silently dropped
    * whatever it cannot fingerprint would be deleting data on decode
    * bugs. The sink frame is the batch's surviving rows plus refusals,
    * each with its fingerprint (or null), checkpointed BEFORE the
    * index append (the survivors plan reads the path the append
    * extends — the [[nearDedupIntake]] recache note).
    *
    * @param fingerprint payload column → nullable 64-bit fingerprint
    *   (e.g. `ImageExpressions.dhashImage`,
    *   `AudioExpressions.audioEnvHash`)
    * @param bucketBits 0 derives the band width from the standing
    *   index size per batch (scale-aware); pin for tiny-corpus specs */
  def fingerprintDedupIntake(indexPath: String,
                             fingerprint: Column => Column,
                             mediaCol: String = "media",
                             idCol: String = "doc_id",
                             maxHamming: Int = 3, maxBucket: Int = 64,
                             bucketBits: Int = 0,
                             sink: (DataFrame, Long) => Unit = (_, _) => ())
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    import graft.operators.{Artifacts, Dedup}
    val spark = batch.sparkSession
    // persist the FINGERPRINTED frame, not just its non-null slice: the
    // refused branch and the admitted branch both read it, and without
    // the cache each would re-run the decode-heavy fingerprint (image/
    // audio/video decode) over the full batch payload
    val hashed = batch.withColumn("sim", fingerprint(col(mediaCol))).persist()
    val refused = hashed.filter(col("sim").isNull)
    val hashes = hashed.filter(col("sim").isNotNull)
    try {
      // within-batch: drop the larger id of any qualifying pair
      val innerPairs = Dedup.simhashPairsFrom(
        hashes.select(col(idCol).as("doc_id"), col("sim")),
        maxHamming, maxBucket, bucketBits)
      val innerSurvivors = hashes.join(
        innerPairs.select(col("id_b").as(idCol)).distinct(),
        Seq(idCol), "left_anti")
      // cross-batch: the standing index, own partition excluded
      val survivors =
        if (Artifacts.hasData(spark, indexPath)) {
          val index = spark.read.parquet(indexPath)
            .filter(col("batch_id") =!= lit(batchId))
            .select("id", "sim")
          val matches = Dedup.hammingAgainst(index,
            innerSurvivors.select(col(idCol).as("doc_id"), col("sim")),
            maxHamming, maxBucket, bucketBits)
          innerSurvivors.join(
            matches.select(col("incoming_id").as(idCol)).distinct(),
            Seq(idCol), "left_anti")
        } else innerSurvivors
      val out = survivors.unionByName(refused).localCheckpoint(true)
      out.filter(col("sim").isNotNull)
        .select(col(idCol).as("id"), col("sim"), lit(batchId).as("batch_id"))
        .write
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .mode("overwrite")
        .parquet(indexPath)
      sink(out, batchId)
    } finally {
      hashed.unpersist()
      graft.operators.CacheRegistry.releaseAll()
    }
  }

  def nearDedupIntake(indexPath: String, textCol: String = "text",
                      minQuality: Double = 0.5,
                      bands: Int = 16, rowsPerBand: Int = 4,
                      shingleWidth: Int = 3, threshold: Double = 0.7,
                      maxBucket: Int = 64,
                      sink: (DataFrame, Long) => Unit = (_, _) => (),
                      labelsPath: String = "")
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    import graft.operators.{Artifacts, Dedup, TextAnalysis}
    val spark = batch.sparkSession
    val enriched = TextAnalysis.cleanEnrich(batch, textCol)
      .filter(col("quality_score") >= minQuality)
    // exact within-batch: keep the smallest doc_id per fingerprint
    val exactKeep = enriched.groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("doc_id"))
    val exactDeduped = enriched.join(exactKeep, Seq("fingerprint", "doc_id"))
      .persist()
    try {
      // near within-batch: drop the larger id of any qualifying pair
      val innerPairs = Dedup.minhashLsh(exactDeduped, "doc_id", textCol,
        bands, rowsPerBand, shingleWidth, threshold, maxBucket)
      val innerSurvivors = exactDeduped.join(
        innerPairs.select(col("id_b").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      val prepared = Dedup.minhashPrepare(innerSurvivors, "doc_id", textCol,
        bands, rowsPerBand, shingleWidth)
      // localCheckpoint, NOT persist: the survivors plan READS the index
      // this batch is about to EXTEND, and writing to a path recaches
      // every cached plan that scans it (CacheManager.recacheByPath) —
      // a persisted frame would be recomputed against the post-append
      // index and match the admitted documents against THEMSELVES.
      // Checkpointing truncates the lineage to materialized blocks, so
      // nothing downstream can ever re-touch the pre-append scan.
      // Retry idempotency, read side: on an at-least-once replay (crash
      // after the index append, before the checkpoint commit) this
      // batch's own signatures are already IN the index — in its
      // batch_id partition, or folded into batch_id = -1 if a compaction
      // ran between the attempts. Without exclusion every replayed doc
      // self-matches at jaccard 1.0 and the batch silently vanishes from
      // the sink. Two guards, one per case: partition-prune the batch's
      // own batch_id (free — partition filter), and drop id-equal match
      // pairs ONLY where the index copy sits in the COMPACTED partition
      // (batch_id = -1 — the post-compaction replay copy). An id-equal
      // match against a LIVE batch partition is not a replay artifact —
      // it is a source legitimately re-delivering a document under the
      // same doc_id in a later batch — and must still dedup the
      // incoming copy. (Re-delivery whose ONLY index copy was already
      // compacted is indistinguishable from a replay by construction
      // and is re-admitted ONCE; its re-admitted copy lives in a live
      // partition, so every delivery after that dedups normally, as do
      // content-level near-dups at differing ids.)
      val indexMatches: Option[DataFrame] =
        if (Artifacts.hasData(spark, indexPath)) {
          val index = spark.read.parquet(indexPath)
            .filter(col("batch_id") =!= lit(batchId))
          val matches0 = Dedup.minhashLshAgainstPrepared(index, prepared,
            bands, rowsPerBand, threshold, maxBucket)
          // Excuse id-equal matches ONLY for ids whose sole index copy
          // sits in the compacted partition. The match rows carry no
          // batch_id (candidate pairs are deduped to one (index_id,
          // incoming_id) row), so an id with BOTH a compacted copy and a
          // live re-admitted copy must NOT be excused on compacted
          // membership alone — that would drop the single match row the
          // live copy produces too, and every later same-id delivery
          // would be re-admitted forever, accumulating duplicate index
          // rows and sink emissions.
          val compactedIds = spark.read.parquet(indexPath)
            .filter(col("batch_id") === lit(-1L))
            .select(col("id").as("index_id"))
          val liveIds = spark.read.parquet(indexPath)
            .filter(col("batch_id") =!= lit(-1L) && col("batch_id") =!= lit(batchId))
            .select(col("id").as("index_id"))
          val replayOnlyIds = compactedIds.join(liveIds, Seq("index_id"), "left_anti")
          Some(matches0.filter(col("index_id") === col("incoming_id"))
            .join(replayOnlyIds, Seq("index_id"), "left_anti")
            .unionByName(matches0.filter(col("index_id") =!= col("incoming_id"))))
        } else None
      val survivors =
        indexMatches.fold(innerSurvivors) { matches =>
          innerSurvivors.join(
            matches.select(col("incoming_id").as("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
        }.localCheckpoint(true)
      // duplicate pairs this batch observed — the cluster-closure feed.
      // Checkpointed BEFORE the index append for the same reason as the
      // survivors: the match plan scans the index path this batch is
      // about to extend. Id-equal matches are the same document
      // (replay / re-delivery), not an edge.
      val labelPairs: Option[DataFrame] =
        if (labelsPath.isEmpty) None
        else Some(indexMatches.fold(innerPairs.select("id_a", "id_b")) { m =>
          innerPairs.select("id_a", "id_b").unionByName(
            m.filter(col("index_id") =!= col("incoming_id"))
              .select(col("index_id").as("id_a"),
                col("incoming_id").as("id_b")))
        }.localCheckpoint(true))
      val admitted = prepared
        .join(survivors.select("doc_id"), col("id") === col("doc_id"))
        .select(col("id"), col("sh"), col("sig"), lit(batchId).as("batch_id"))
      admitted.write
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .mode("overwrite")
        .parquet(indexPath)
      labelPairs.foreach(componentsApply(spark, labelsPath, _, batchId))
      sink(survivors, batchId)
    } finally {
      exactDeduped.unpersist()
      // minhashLsh / minhashLshAgainstPrepared persist() intermediates
      // and register them here; a long-running stream that never
      // released them would grow storage memory per micro-batch (and
      // every index write's recacheByPath would recompute the leaked
      // index-scan caches). Batches execute serially in foreachBatch,
      // so releasing between batches is safe.
      graft.operators.CacheRegistry.releaseAll()
    }
  }

  /** Incremental curation manifest — [[graft.operators.Curate.manifest]]
    * applied as documents ARRIVE: each micro-batch is labeled with the
    * same five fates (`exact_dup`, `low_quality`, `contaminated`,
    * `near_dup`, `kept`) against STANDING state, without re-pricing the
    * corpus per refresh. Two persistent indexes carry the cross-batch
    * state, both batch_id-partitioned with dynamic partition overwrite
    * (a retried micro-batch overwrites its own partition — the same
    * at-least-once idempotency discipline as [[nearDedupIntake]]):
    *
    *  - `fpIndexPath` — every FIRST-SEEN normalized fingerprint (any
    *    fate: the batch manifest ranks exact-dups over ALL docs, so a
    *    later arrival matching a low-quality first is still exact_dup);
    *  - `sigIndexPath` — prepared MinHash rows ((id, sh, sig),
    *    [[graft.operators.Dedup.minhashPrepare]]) of KEPT docs only:
    *    the standing corpus's incumbents. Each admitted document is
    *    shingled exactly once, at admission.
    *
    * Stage semantics per batch are the batch manifest's own operators
    * (stage-0 enrichment is literally shared — [[graft.operators.Curate.enrich]];
    * within-batch near-dup clustering is the same
    * ngramJaccard → connectedComponents → quality-argmax keep-best).
    * Where streaming NECESSARILY differs, the rule is first-arrival
    * /incumbent wins, and the batch≡stream differential holds on any
    * corpus where arrival order respects doc_id order and each cluster's
    * best-quality member arrives first (the planted spec scenario):
    *
    *  - exact dedup: "keep smallest doc_id" becomes keep-first-arrival
    *    (within a batch, smallest id — identical when ids follow
    *    arrival);
    *  - cross-batch near-dup: a new arrival matching a standing
    *    incumbent (LSH candidate + exact stored-shingle Jaccard ≥
    *    threshold) is `near_dup` — an already-emitted incumbent is never
    *    retro-demoted by a better late arrival;
    *  - only KEPT docs join the signature index, so a chain through an
    *    earlier batch's near_dup LOSER does not propagate (transitive
    *    closure beyond the incumbents is the batch operator's job, the
    *    same bound [[nearDedupIntake]] documents);
    *  - the contamination df-cap (`maxDocFreq`) prices n-gram hotness
    *    within the batch's survivors, not corpus-wide.
    *
    * The manifest frame handed to `sink` — (doc_id, fate,
    * quality_score), one row per batch document — is checkpointed
    * BEFORE the index appends (its plan reads both paths this batch
    * extends; see [[nearDedupIntake]]'s recache note). Mid-stream index
    * compaction is not supported (compact offline between runs if
    * micro-batch count grows the partition listing).
    *
    * With a non-empty `substringIndexPath` the manifest grows the
    * SUBSTRING-dedup stage of [[graft.operators.Curate.manifestWithStrip]]
    * (the C4/RefinedWeb lineage: doc-level keep-best first, then price
    * duplicated SPANS over the kept survivors only): each batch's kept
    * docs get `n_tokens` and `n_dup_tokens` (NULL for non-kept) from
    * [[graft.operators.Dedup.dupSpansAgainst]] versus the STANDING
    * shingle-count index — the accumulated kept corpus of every earlier
    * batch — plus the batch itself, and then their own shingle counts
    * append as the batch's `batch_id` partition (the [[substringIntake]]
    * discipline verbatim: own-partition excluded on read so a replayed
    * batch cannot self-flag, dynamic partition overwrite so the
    * re-append is idempotent, and the extended manifest checkpoints
    * BEFORE the append because its span plan scans the path the append
    * extends). Because occurrence counts add, the per-batch span stats
    * are exactly `dupSpans(all kept docs so far)` restricted to the
    * batch's kept docs — the incremental contract of
    * [[graft.operators.Dedup.dupSpansAgainst]]: a span whose later copy
    * arrives in a FUTURE batch is that future batch's finding (and a
    * full [[graft.operators.Curate.manifestWithStrip]] recompute's for
    * the standing copy); on any corpus where duplicated spans only flow
    * forward — or trivially when the whole corpus is one batch — the
    * accumulated stream manifest equals the batch operator's
    * (spec-pinned).
    *
    * @param probes static eval-set frame (doc_id, text) for the
    *               contamination stage; an empty frame disables it
    * @param substringIndexPath standing (m, cnt, batch_id) shingle-count
    *               index of kept docs' rolling spans; "" (default)
    *               disables the substring stage and keeps the 3-column
    *               manifest
    * @param spanTokens rolling span width in tokens for the substring
    *               stage (the [[graft.operators.Dedup.dupSpans]] L) */
  def curateIntake(probes: DataFrame,
                   fpIndexPath: String, sigIndexPath: String,
                   minQuality: Double = 0.5,
                   bands: Int = 16, rowsPerBand: Int = 4,
                   shingleWidth: Int = 3, threshold: Double = 0.5,
                   maxBucket: Int = 64, maxDocFreq: Int = 100,
                   sink: (DataFrame, Long) => Unit = (_, _) => (),
                   substringIndexPath: String = "",
                   spanTokens: Int = 20)
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    import graft.operators.{Artifacts, CacheRegistry, Curate, Dedup}
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    val base = Curate.enrich(batch).persist()
    try {
      val rnSlim = base.select(col("doc_id"), col("fingerprint"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("fingerprint").orderBy("doc_id")))
        .select("doc_id", "rn")
      val labeled0 = base.join(rnSlim, "doc_id")
      val labeled = (if (Artifacts.hasData(spark, fpIndexPath)) {
        val seenFps = spark.read.parquet(fpIndexPath)
          .filter(col("batch_id") =!= lit(batchId))
          .select(col("fingerprint")).distinct()
          .withColumn("seen", lit(1))
        labeled0.join(seenFps, Seq("fingerprint"), "left_outer")
      } else labeled0.withColumn("seen", lit(null).cast("int"))).persist()
      CacheRegistry.track(labeled)
      val s2 = labeled.filter(col("rn") === 1 && col("seen").isNull &&
        col("quality_score") >= minQuality)
      val contaminated = Dedup.crossNgramOverlap(s2, probes, "doc_id", "text",
          n = 5, minShared = 3, maxDocFreq = maxDocFreq)
        .select("doc_id").distinct()
        .withColumn("is_cont", lit(1))
        .persist()
      CacheRegistry.track(contaminated)
      val s3 = s2.join(contaminated, Seq("doc_id"), "left_anti").persist()
      CacheRegistry.track(s3)
      // within-batch clusters: the batch manifest's own keep-best stage
      val clusters = Dedup.connectedComponents(
        Dedup.ngramJaccard(s3, "doc_id", "text",
          n = shingleWidth, threshold = threshold, maxDocFreq = maxDocFreq))
      val wBest = Window.partitionBy("component")
        .orderBy(col("quality_score").desc, col("doc_id").asc)
      val bestKeep = s3.select(col("doc_id"), col("quality_score"))
        .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_outer")
        .withColumn("component", coalesce(col("label"), col("doc_id")))
        .select(col("doc_id"),
          (row_number().over(wBest) === 1).cast("int").as("keep"))
      val winners = s3.join(bestKeep.filter(col("keep") === 1).select("doc_id"), "doc_id")
      // localCheckpoint, NOT persist: `prepared`'s lineage scans
      // fpIndexPath (via labeled's seen-join), which this batch appends
      // to below — a cached plan would be invalidated by the append
      // (CacheManager.recacheByPath) and recomputed against the
      // post-append index, where the batch's own fingerprints read as
      // "seen" and the sig append would silently write nothing. Same
      // trap [[nearDedupIntake]] documents.
      val prepared = Dedup.minhashPrepare(winners, "doc_id", "text",
        bands, rowsPerBand, shingleWidth).localCheckpoint(true)
      // cross-batch near-dup: batch winners vs the standing incumbents
      val idxDup = (if (Artifacts.hasData(spark, sigIndexPath)) {
        val index = spark.read.parquet(sigIndexPath)
          .filter(col("batch_id") =!= lit(batchId))
        Dedup.minhashLshAgainstPrepared(index, prepared,
            bands, rowsPerBand, threshold, maxBucket)
          .select(col("incoming_id").as("doc_id")).distinct()
      } else spark.emptyDataFrame
        .withColumn("doc_id", lit(0L)).limit(0))
        .withColumn("idx_dup", lit(1))
      val fates = labeled
        .join(contaminated, Seq("doc_id"), "left_outer")
        .join(bestKeep, Seq("doc_id"), "left_outer")
        .join(idxDup, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          when(col("rn") > 1 || col("seen") === 1, "exact_dup")
            .when(col("quality_score") < minQuality, "low_quality")
            .when(col("is_cont") === 1, "contaminated")
            .when(col("keep") === 0 || col("idx_dup") === 1, "near_dup")
            .otherwise("kept").as("fate"),
          col("quality_score"))
        .localCheckpoint(true)
      // checkpointed: the plan both reads and (next line) overwrites
      // fpIndexPath — truncating the lineage to materialized blocks is
      // what makes the self-referential append legal and replay-stable
      val newFps = labeled.filter(col("rn") === 1 && col("seen").isNull)
        .select(col("fingerprint"), lit(batchId).as("batch_id"))
        .localCheckpoint(true)
      newFps.write.option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").mode("overwrite").parquet(fpIndexPath)
      val keptIds = fates.filter(col("fate") === "kept").select("doc_id")
      prepared.join(keptIds, col("id") === col("doc_id"))
        .select(col("id"), col("sh"), col("sig"), lit(batchId).as("batch_id"))
        .write.option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").mode("overwrite").parquet(sigIndexPath)
      val manifest = if (substringIndexPath.isEmpty) fates else {
        // substring stage over THIS batch's kept survivors vs the
        // standing kept corpus (counts add ⇒ ≡ dupSpans of all kept
        // docs so far, restricted to the batch — see scaladoc)
        val keptDocs = batch.select(col("doc_id"), col("text"))
          .join(keptIds, "doc_id").persist()
        CacheRegistry.track(keptDocs)
        val spans =
          (if (Artifacts.hasData(spark, substringIndexPath))
            Dedup.dupSpansAgainst(
              spark.read.parquet(substringIndexPath)
                .filter(col("batch_id") =!= lit(batchId))
                .select(col("m"), col("cnt")),
              keptDocs, "doc_id", "text", spanTokens)
          else Dedup.dupSpans(keptDocs, "doc_id", "text", spanTokens))
        val spanStats = spans.groupBy("doc_id")
          .agg(sum(col("span_len")).as("dup_toks"))
        val keptMeta = keptDocs
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
          .join(spanStats, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("n_tokens"),
            coalesce(col("dup_toks"), lit(0L)).as("n_dup_tokens"))
        // checkpointed BEFORE the count append: the span plan scans
        // substringIndexPath, which the next write extends (the same
        // recacheByPath self-match hazard the fp/sig appends document)
        val extended = fates
          .join(keptMeta, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("fate"), col("quality_score"),
            col("n_tokens"), col("n_dup_tokens"))
          .localCheckpoint(true)
        Dedup.dupSpanIndex(keptDocs, "doc_id", "text", spanTokens)
          .select(col("m"), col("cnt"), lit(batchId).as("batch_id"))
          .write.option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").mode("overwrite").parquet(substringIndexPath)
        extended
      }
      sink(manifest, batchId)
    } finally {
      base.unpersist()
      graft.operators.CacheRegistry.releaseAll()
    }
  }

  /** Model-based streaming gate — the serving half of train-once,
    * serve-forever: score each arriving micro-batch under a PERSISTED
    * n-gram LM ([[graft.operators.LanguageModel.save]]) and keep
    * documents whose mean smoothed transition likelihood clears
    * `minScore` (the CCNet-style model filter applied at ingest, before
    * documents ever land in the corpus).
    *
    * The model generation is PINNED at first batch ([[pinFrame]]):
    * `load` alone returns lazy scans of the artifact path, so an
    * in-place artifact overwrite mid-stream would otherwise make later
    * batches read half-replaced files (FileNotFound at best, silently
    * mixed generations at worst). Pinning materializes the model-sized
    * tables into executor storage once; replacing the artifact on disk
    * then does NOT change routing for this closure's lifetime — to roll
    * a new model, restart the query (or build a new intake closure),
    * which is the auditable generation boundary a training pipeline
    * wants anyway. Scoring is STATELESS — transitions explode +
    * two many-to-one joins against the static model + an exact per-doc
    * long-SUM re-agg, all within the micro-batch — so no streaming
    * state, watermark, or replay guard exists: a replayed batch
    * recomputes exactly the same scores from its own rows and the
    * static model. Documents with fewer than `n` tokens have no
    * transitions and are dropped (unscorable; pair with an upstream
    * length gate, e.g. [[corpusIntake]]'s quality filter).
    *
    * Output to `sink`: the batch's surviving rows plus their
    * `lm_score`. */
  def lmScoreIntake(modelPath: String, idCol: String = "doc_id",
                    textCol: String = "text", minScore: Double = 0.0,
                    k: Double = 1.0, n: Int = 2,
                    sink: (DataFrame, Long) => Unit = (_, _) => ())
      : (DataFrame, Long) => Unit = {
    var model: graft.operators.LanguageModel.NgramLm = null
    (batch, batchId) => {
      if (model == null) {
        val m = graft.operators.LanguageModel.load(batch.sparkSession, modelPath)
        model = m.copy(bigrams = pinFrame(m.bigrams),
          contexts = pinFrame(m.contexts))
      }
      val scored = graft.operators.LanguageModel
        .scoreMeanLikelihood(batch, idCol, textCol, model, k, n)
        .filter(col("lm_score") >= minScore)
        .select(col(idCol), col("lm_score"))
      sink(batch.join(scored, Seq(idCol)), batchId)
    }
  }

  /** Pin a model-sized artifact table into executor storage, eagerly:
    * `spark.read.parquet` plans are LAZY, so a "loaded once" model
    * would otherwise re-resolve the artifact FILES on every micro-batch
    * — replacing the artifact in place mid-stream then fails tasks on
    * the vanished old files (or, with ignoreMissingFiles, silently
    * scores under a half-replaced mixed generation). An eager
    * `localCheckpoint` materializes the rows once and severs the file
    * lineage: the serving closure keeps its loaded generation no matter
    * what happens to the path. Model tables are data-bounded (weights /
    * transitions), never corpus-bounded, so the pinned footprint is the
    * same class as a broadcast model. Executor loss drops pinned blocks
    * unrecoverably (localCheckpoint has no lineage to rebuild from) —
    * the query fails and restarts onto the CURRENT artifact, which is
    * the refresh semantics documented on the intakes anyway. */
  private def pinFrame(df: DataFrame): DataFrame = df.localCheckpoint(true)

  /** Streaming classifier routing — the serving half of the NB
    * classifier ([[graft.operators.TextClassifier]]): label each
    * arriving micro-batch under a PERSISTED weight artifact (the
    * fastText-style language/quality router applied at ingest). Same
    * discipline as [[lmScoreIntake]]: the model GENERATION is pinned at
    * first batch ([[pinFrame]] — replacing the artifact on disk does
    * not change routing for this closure's lifetime; roll models by
    * restarting the query or building a new closure, asserted in
    * StreamingAnalyticsSpec). Scoring is STATELESS exact-integer
    * arithmetic within the micro-batch — no streaming state or replay
    * guard needed, a replayed batch recomputes identical labels from
    * the pinned weights. Output rows are the batch's rows plus
    * `predicted` / `score_fx`; route on `predicted` downstream
    * (per-class sinks, drop-lists, quotas). */
  def nbRouteIntake(modelPath: String, idCol: String = "doc_id",
                    textCol: String = "text",
                    sink: (DataFrame, Long) => Unit = (_, _) => ())
      : (DataFrame, Long) => Unit = {
    var model: graft.operators.TextClassifier.NbModel = null
    (batch, batchId) => {
      if (model == null) {
        val m = graft.operators.TextClassifier.load(batch.sparkSession, modelPath)
        model = m.copy(weights = pinFrame(m.weights),
          classes = pinFrame(m.classes))
      }
      sink(batch.join(
        graft.operators.TextClassifier.classify(batch, idCol, textCol, model),
        Seq(idCol)), batchId)
    }
  }

  /** Streaming retrieval chunking — split documents into overlapping
    * token windows ([[graft.operators.Packing.chunkOverlap]]) as they
    * arrive, the ingest half of a live embed-and-index pipeline.
    * Chunking is a pure per-row map (no state, no model, no
    * cross-batch keys), so streamed chunks are bit-identical to the
    * batch operator on the same rows and a replayed micro-batch
    * recomputes identical output — no watermark or replay guard
    * needed. */
  def chunkIntake(window: Int, stride: Int, idCol: String = "doc_id",
                  textCol: String = "text",
                  sink: (DataFrame, Long) => Unit = (_, _) => ())
      : (DataFrame, Long) => Unit =
    (batch, batchId) => sink(
      graft.operators.Packing.chunkOverlap(batch, idCol, textCol,
        window, stride), batchId)

  /** Streaming similarity search — serve ANN queries as they arrive
    * against a PREPARED IVF index ([[graft.operators.Similarity
    * .ivfPrepare]], persisted or cached) and a persisted quantizer
    * ([[graft.operators.Artifacts.saveCentroids]]). The corpus is
    * assigned to cells ONCE at index build; each micro-batch of query
    * embeddings (`vec_id`, `embedding`) pays only its own probes, the
    * cell-wise candidate join, and the exact top-k — stateless, so no
    * watermark or replay guard, and results are bit-identical to the
    * batch [[graft.operators.Similarity.ivfTopKPrepared]] on the same
    * rows. */
  def annSearchIntake(lists: DataFrame, centroidsPath: String, k: Int,
                      nprobe: Int = 4,
                      sink: (DataFrame, Long) => Unit = (_, _) => ())
      : (DataFrame, Long) => Unit = {
    var quantizer: (Array[Long], Array[Array[Float]]) = null
    (batch, batchId) => {
      if (quantizer == null)
        quantizer = graft.operators.Artifacts
          .loadCentroids(batch.sparkSession, centroidsPath)
      sink(graft.operators.Similarity
        .ivfTopKPrepared(lists, batch, k, quantizer, nprobe,
          pruneCells = true), batchId)
    }
  }

  /** Streaming IVF-PQ serve — the product-quantized sibling of
    * [[annSearchIntake]]: query micro-batches against a PERSISTED PQ
    * index ([[graft.operators.Similarity.pqGeomFrames]] lists; the raw
    * corpus frame attaches floats only for the exact rerank tail).
    * Coarse quantizer and codebooks load once per query lifetime — the
    * pinned-generation contract shared with [[annSearchIntake]] and the
    * NB route gate: a mid-stream artifact swap does not change scoring
    * until the query restarts. The `lists` frame is the index SNAPSHOT
    * the caller passed — its parquet file listing froze when the frame
    * was created, so rows pqAppend'ed to the backing store become
    * visible only when a restarted query re-reads it. For an index that
    * GROWS mid-stream, use [[pqServeIntake]], which re-lists the store
    * path every micro-batch. Stateless per micro-batch, so
    * replayed batches re-emit identical rows (at-least-once sink
    * semantics, like the other serve paths). */
  def pqSearchIntake(lists: DataFrame, corpus: DataFrame,
                     centroidsPath: String, codebooksPath: String,
                     k: Int, nprobe: Int = 4, rerank: Int = 0,
                     sink: (DataFrame, Long) => Unit = (_, _) => ())
      : (DataFrame, Long) => Unit = {
    var quantizer: (Array[Long], Array[Array[Float]]) = null
    var codebooks: Array[Array[Array[Float]]] = null
    // the index is a pinned snapshot, so the scale-aware AUTO rerank
    // budget (rerank = 0) is resolved ONCE against it — not a count
    // job per micro-batch
    var rerankEff = rerank
    (batch, batchId) => {
      if (quantizer == null) {
        quantizer = graft.operators.Artifacts
          .loadCentroids(batch.sparkSession, centroidsPath)
        codebooks = graft.operators.Artifacts
          .loadPqCodebooks(batch.sparkSession, codebooksPath)
        if (rerankEff <= 0)
          rerankEff = graft.operators.Similarity.autoPqRerank(lists.count(), k)
      }
      val probes = graft.operators.Similarity
        .pqProbes(batch, quantizer, codebooks, nprobe)
      sink(graft.operators.Similarity
        .pqTopKFromGeom(lists, probes, batch, corpus, k, rerankEff,
          pruneCells = true), batchId)
    }
  }

  /** [[pqSearchIntake]] over a GROWING index: `listsPath` is re-listed
    * every micro-batch, so rows [[graft.operators.Similarity.pqAppend]]'ed
    * to the store mid-stream are served at the very next batch — index
    * growth without a query restart (spec'd by the growth-soak test).
    * The MODEL stays pinned exactly as in [[pqSearchIntake]]: growing
    * the index under the pinned generation is always safe (pqAppend
    * encodes with the same frozen quantizer + codebooks), whereas
    * rolling the model itself still requires rebuilding the closure —
    * an in-place codebook swap does not change what this closure
    * serves. Per-batch listing cost is the file-status scan only; keep
    * the store compacted if micro-batch count grows the file count.
    * With `rerank = 0` (AUTO) the scale-aware budget is re-derived per
    * batch from the re-listed index — a footer-only count — so the
    * frontier tracks index growth the way the banding width does. */
  def pqServeIntake(listsPath: String, corpus: DataFrame,
                    centroidsPath: String, codebooksPath: String,
                    k: Int, nprobe: Int = 4, rerank: Int = 0,
                    sink: (DataFrame, Long) => Unit = (_, _) => ())
      : (DataFrame, Long) => Unit = {
    var quantizer: (Array[Long], Array[Array[Float]]) = null
    var codebooks: Array[Array[Array[Float]]] = null
    (batch, batchId) => {
      if (quantizer == null) {
        quantizer = graft.operators.Artifacts
          .loadCentroids(batch.sparkSession, centroidsPath)
        codebooks = graft.operators.Artifacts
          .loadPqCodebooks(batch.sparkSession, codebooksPath)
      }
      // fresh scan per batch: the ONLY un-pinned piece, by design. A
      // batch arriving before the index store exists must not kill the
      // query with a bare AnalysisException from schema inference —
      // fail with a message that names the path and the fix
      // ([[graft.operators.Similarity.pqPrepare]] first).
      require(graft.operators.Artifacts.hasData(batch.sparkSession, listsPath),
        s"pqServeIntake: no PQ index data at $listsPath — run pqPrepare " +
          "before starting the serving query")
      val lists = batch.sparkSession.read.parquet(listsPath)
      val probes = graft.operators.Similarity
        .pqProbes(batch, quantizer, codebooks, nprobe)
      sink(graft.operators.Similarity
        .pqTopKFromGeom(lists, probes, batch, corpus, k, rerank,
          pruneCells = true), batchId)
    }
  }

  /** Vector-INGEST intake — the index-maintenance half of a production
    * vector store ([[annSearchIntake]]/[[pqServeIntake]] are the
    * serving half): each arriving (vec_id, embedding) micro-batch is
    * assigned — and, with `codebooksPath`, PQ-encoded — MAP-SIDE
    * against the pinned coarse quantizer (loaded once per query
    * lifetime, the serve intakes' pinned-generation contract), and its
    * slim list rows append to the persisted index as the batch's own
    * `batch_id` partition: the standing-index discipline every other
    * intake uses. Dynamic partition overwrite makes an at-least-once
    * replay rewrite its own partition instead of double-inserting —
    * the replay-safe sibling of the plain-append batch APIs
    * ([[graft.operators.Similarity.ivfAppend]]/`pqAppend`; initialize a
    * store by feeding the backfill through this intake as batch 0, not
    * by writing an unpartitioned [[graft.operators.Similarity.ivfPrepare]]
    * dump next to partitioned batches). Per-batch cost is one
    * batch-sized assignment/encode scan against broadcast-sized model
    * arrays plus a batch-sized columnar write — the index is never
    * rebuilt and never shuffles, so ingest throughput is flat in index
    * size at any corpus scale.
    *
    * Staleness is gated, not guessed: every `driftEvery` batches the
    * incoming batch is probed against the STANDING index (own partition
    * excluded, so a replayed batch never probes against itself) with
    * [[graft.operators.Similarity.ivfDriftProbe]] — assignment-quality
    * drop, cell skew, reassignment churn — and the report goes to
    * `driftSink`; retrain-and-rebuild only when the frozen quantizer
    * measurably no longer fits the arrivals.
    * [[graft.operators.Similarity.ivfCellStats]] over the store stays
    * the occupancy dashboard. The probe needs raw float lists, so in
    * PQ mode (code rows only) point `driftListsPath` at the float IVF
    * sibling store the same stream maintains under the shared coarse
    * quantizer — the usual cells+codes(+floats) layering — or leave
    * drift probing off and gate on occupancy alone.
    *
    * Serving composes directly: [[pqServeIntake]] re-lists the same
    * path per batch, so ingested vectors serve at the NEXT micro-batch
    * without a query restart, and ingest-then-serve ≡
    * rebuild-then-serve bit-for-bit at the same pinned geometry
    * (spec-pinned). Compact with [[compactVectorIndex]] on the usual
    * committed-batches-only horizon.
    *
    * @param sink receives the batch's prepared list rows (lazy plan —
    *             consuming it re-runs the batch-sized assignment scan) */
  def vectorIngestIntake(listsPath: String, centroidsPath: String,
                         codebooksPath: String = "",
                         driftEvery: Long = 0,
                         driftListsPath: String = "",
                         driftSink: (graft.operators.Similarity.IvfDriftReport, Long) => Unit =
                           (_, _) => (),
                         sink: (DataFrame, Long) => Unit = (_, _) => ())
      : (DataFrame, Long) => Unit = {
    import graft.operators.{Artifacts, Similarity}
    var quantizer: (Array[Long], Array[Array[Float]]) = null
    var codebooks: Array[Array[Array[Float]]] = null
    (batch, batchId) => {
      val spark = batch.sparkSession
      if (quantizer == null) {
        quantizer = Artifacts.loadCentroids(spark, centroidsPath)
        if (codebooksPath.nonEmpty)
          codebooks = Artifacts.loadPqCodebooks(spark, codebooksPath)
      }
      if (driftEvery > 0 && batchId % driftEvery == 0) {
        val driftPath = if (driftListsPath.nonEmpty) driftListsPath
          else if (codebooksPath.isEmpty) listsPath
          else throw new IllegalArgumentException(
            "vectorIngestIntake: drift probing needs raw float lists — in " +
              "PQ mode pass driftListsPath (the IVF sibling store under " +
              "the same coarse quantizer)")
        if (Artifacts.hasData(spark, driftPath))
          driftSink(Similarity.ivfDriftProbe(
            spark.read.parquet(driftPath)
              .filter(col("batch_id") =!= lit(batchId)),
            batch, quantizer), batchId)
      }
      val prepared = if (codebooks == null) Similarity.ivfPrepare(batch, quantizer)
        else Similarity.pqPrepare(batch, quantizer, codebooks)
      prepared.withColumn("batch_id", lit(batchId))
        .write.option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").mode("overwrite").parquet(listsPath)
      spark.catalog.refreshByPath(listsPath)
      sink(prepared, batchId)
    }
  }

  /** GENERATION-AWARE vector ingest — [[vectorIngestIntake]] lifted onto
    * a [[graft.operators.VectorStore]] root, closing the
    * drift→retrain→rollover→reclaim loop under LIVE ingest (the cutover
    * contract, spelled out in [[graft.operators.VectorStore]]'s
    * scaladoc): each micro-batch re-resolves the live generation (one
    * filesystem listing — cheap next to the batch's encode scan); when
    * a retrain has published a NEWER generation, the intake first
    * replays every batch above the new generation's high water from the
    * previously-pinned generation's raw floats onto the new one
    * ([[graft.operators.VectorStore.catchUp]] — idempotent,
    * batch_id-partition-overwrite), then re-pins models and appends the
    * arriving batch there. A batch therefore serves from the new
    * generation whether it landed before the publish snapshot (in the
    * bulk), during the publish window (caught up), or after cutover
    * (appended directly) — none is lost, none double-serves.
    *
    * Crash discipline: the FIRST batch after a (re)start also catches
    * up from the newest predecessor generation still on disk, so a
    * crash between a publish and its cutover replay cannot strand the
    * in-window batches; the replay is idempotent, so repeating it after
    * an at-least-once restart rewrites the same bytes. Reclaim retired
    * generations only once their still-pinned readers are gone
    * ([[graft.operators.VectorStore.dropGenerationsBelow]]) — the
    * intake itself never deletes.
    *
    * Drift probes run against the pinned generation's float frame
    * (`flists` for PQ stores, `lists` for IVF — no `driftListsPath`
    * plumbing needed: the store layout carries the floats).
    *
    * @param cutoverSink observes each rollover: (new generation number,
    *                    replayed batch ids) — wire it to the ops log
    * @param sink        receives the batch's prepared code rows (lazy
    *                    plan), after the generation write committed
    * @param retrainOn   the AUTONOMOUS half of the drift gate: when a
    *                    probed batch's report makes this true, the
    *                    intake itself republishes the store (same
    *                    hyperparameters, retrained on everything
    *                    landed) and cuts over before appending — the
    *                    full drift→retrain→rollover→catch-up loop with
    *                    no external ops actor. Default never; classic
    *                    choice `_.drifted`. While enabled the intake is
    *                    the store's single writer. */
  def vectorStoreIngestIntake(root: String,
                              driftEvery: Long = 0,
                              driftSink: (graft.operators.Similarity.IvfDriftReport, Long) => Unit =
                                (_, _) => (),
                              cutoverSink: (Long, Seq[Long]) => Unit = (_, _) => (),
                              sink: (DataFrame, Long) => Unit = (_, _) => (),
                              retrainOn: graft.operators.Similarity.IvfDriftReport => Boolean =
                                _ => false)
      : (DataFrame, Long) => Unit = {
    import graft.operators.{Artifacts, Similarity, VectorStore}
    var pinned: VectorStore.Generation = null
    var models: VectorStore.Models = null
    (batch, batchId) => {
      val spark = batch.sparkSession
      val cur = VectorStore.current(spark, root).getOrElse(
        throw new IllegalStateException(
          s"vectorStoreIngestIntake: no committed generation at $root — " +
            "VectorStore.publish the bulk build before starting ingest"))
      if (pinned == null) {
        // (re)start: the previous process may have died between a
        // publish and its cutover replay — catch up from the newest
        // predecessor still on disk (no-op when already caught up)
        VectorStore.generations(spark, root).filter(_ < cur.gen)
          .lastOption.foreach { pred =>
            val replayed = VectorStore.catchUp(spark,
              VectorStore.Generation(pred, root), cur)
            if (replayed.nonEmpty) cutoverSink(cur.gen, replayed)
          }
        pinned = cur
        models = VectorStore.models(spark, cur)
      } else if (cur.gen > pinned.gen) {
        cutoverSink(cur.gen, VectorStore.catchUp(spark, pinned, cur))
        pinned = cur
        models = VectorStore.models(spark, cur)
      }
      if (driftEvery > 0 && batchId % driftEvery == 0) {
        val driftPath = if (models.isPq) pinned.flists else pinned.lists
        if (Artifacts.hasData(spark, driftPath)) {
          val report = Similarity.ivfDriftProbe(
            spark.read.parquet(driftPath)
              .filter(col("batch_id") =!= lit(batchId)),
            batch, models.quantizer)
          driftSink(report, batchId)
          // AUTONOMOUS retrain — the drift verdict acted on in-stream,
          // closing drift→retrain→rollover→catch-up without an external
          // ops loop: republish with the pinned generation's OWN
          // hyperparameters (nlist from the quantizer, m/ksub from the
          // codebooks), trained on everything the store has landed
          // (high water = the largest landed batch id EXCLUDING the
          // in-flight one — on an at-least-once replay the current
          // batch's partition may already be on disk from a crash
          // between ingestBatch and the checkpoint commit; counting it
          // into hw would fold those vectors into the new bulk AND
          // re-append them below, double-serving within one
          // generation. Excluded, the batch stays above the water in
          // either history: the append below overwrites partition
          // batchId idempotently, exactly once in the new generation —
          // the same exclusion the drift probe applies two lines up).
          // The intake is the single writer while retrainOn is enabled
          // — do not run an external publisher concurrently. The
          // publish stalls this micro-batch for one training +
          // bulk-build pass; drift-gated, that is the rare batch, and
          // index maintenance streams tolerate it.
          if (retrainOn(report)) {
            val hw = spark.read.parquet(
                if (models.isPq) pinned.flists else pinned.lists)
              .filter(col("batch_id") =!= lit(batchId))
              .agg(max(col("batch_id").cast("long"))).head().getLong(0)
            val next = VectorStore.publish(spark, root,
              VectorStore.corpusAsOf(spark, pinned, hw),
              nlist = models.quantizer._1.length,
              pqM = models.codebooks.map(_.length).getOrElse(0),
              pqKsub = models.codebooks.map(_.head.length).getOrElse(256),
              highWater = hw)
            cutoverSink(next.gen, VectorStore.catchUp(spark, pinned, next))
            pinned = next
            models = VectorStore.models(spark, next)
          }
        }
      }
      sink(VectorStore.ingestBatch(spark, pinned, models, batch, batchId),
        batchId)
    }
  }

  /** GENERATION-AWARE serving — the query half of the
    * [[graft.operators.VectorStore]] lifecycle, completing what
    * [[vectorStoreIngestIntake]] starts: each arriving (vec_id,
    * embedding) QUERY batch is answered with exact-reranked top-k
    * against the store's LIVE generation, re-resolved per micro-batch —
    * so a retrain's rollover reaches serving at the NEXT batch with no
    * query restart (the old pinned-path intakes needed one; this is
    * the restart-free cutover). The pinned-generation contract still
    * holds where it matters: resolution happens BETWEEN batches, and a
    * batch is served entirely against one generation's (model, lists,
    * floats) triple — codes encoded under model A are never scored
    * through model B's LUTs. Batches appended by the ingest intake
    * since the pin serve immediately (fresh list scan per batch, the
    * [[pqServeIntake]] property); the AUTO rerank budget is re-derived
    * once per GENERATION (one count), not per batch.
    *
    * Reclaim discipline: retire old generations only after this intake
    * has observed the new one (`cutoverSink` fires with the new gen
    * number) — a generation can be mid-batch until then.
    *
    * @param rerank PQ exact-rerank budget; 0 = AUTO per generation
    * @param sink   receives (query_id, cand_id, sim, rank) per batch */
  def vectorStoreServeIntake(root: String, k: Int, nprobe: Int = 4,
                             rerank: Int = 0,
                             cutoverSink: Long => Unit = _ => (),
                             sink: (DataFrame, Long) => Unit = (_, _) => ())
      : (DataFrame, Long) => Unit = {
    import graft.operators.{Similarity, VectorStore}
    var pinned: VectorStore.Generation = null
    var models: VectorStore.Models = null
    var rerankEff = rerank
    (batch, batchId) => {
      val spark = batch.sparkSession
      val cur = VectorStore.current(spark, root).getOrElse(
        throw new IllegalStateException(
          s"vectorStoreServeIntake: no committed generation at $root — " +
            "VectorStore.publish the bulk build before starting serving"))
      if (pinned == null || cur.gen > pinned.gen) {
        if (pinned != null) cutoverSink(cur.gen)
        pinned = cur
        models = VectorStore.models(spark, cur)
        rerankEff = rerank // AUTO re-derives against the new generation
      }
      val lists = spark.read.parquet(pinned.lists)
      models.codebooks match {
        case Some(cb) =>
          if (rerankEff <= 0)
            rerankEff = Similarity.autoPqRerank(lists.count(), k)
          val probes = Similarity.pqProbes(batch, models.quantizer, cb, nprobe)
          val corpus = spark.read.parquet(pinned.flists)
            .select(col("cand_id").as("vec_id"), col("candv").as("embedding"))
          sink(Similarity.pqTopKFromGeom(lists, probes, batch, corpus, k,
            rerankEff, pruneCells = true), batchId)
        case None =>
          sink(Similarity.ivfTopKPrepared(lists, batch, k, models.quantizer,
            nprobe, pruneCells = true), batchId)
      }
    }
  }

  /** Keyed state for [[uniformSampleUpdates]]: the group's current
    * top-k (priority, id) pairs — k rows, not the group's row count —
    * plus an observation counter. */
  case class SampleState(top: List[(String, Long)], seen: Long)

  /** Standing per-group uniform sample over a stream — the streaming
    * sibling of [[graft.operators.Sampling.capPerGroup]]: maintain, per
    * group, the k rows with the SMALLEST (md5(id), id) priority seen so
    * far. Because the priority is a pure function of the id, the
    * running top-k is a uniform without-replacement sample of all ids
    * ever observed, the result is independent of arrival order and
    * micro-batch boundaries (top-k merge is associative + commutative +
    * idempotent), a re-observed or replayed id is the identity FOR THE
    * SAMPLE, and the final sample EQUALS the batch operator on the same
    * rows — spec'd as an exact differential. The `n_seen` counter is
    * NOT replay-idempotent: it increments per observed row, so under
    * at-least-once delivery a replayed micro-batch counts its rows
    * again — read it as an at-least-once observation count (upper
    * bound), exact under exactly-once delivery. Only the sample itself
    * carries the replay-stable guarantee. State is k pairs + a counter
    * per group (bounded regardless of group size), so no watermark or
    * timeout is needed: a standing sample never expires.
    *
    * Update-mode emission: one row per group per micro-batch that
    * touched it — (group, sample_ids in priority-rank order, n_seen
    * observations). Null ids are dropped (no hash draw — the batch
    * operator's policy). */
  def uniformSampleUpdates(docs: DataFrame, idCol: String, groupCol: String,
                           k: Int): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(k >= 1, "sample size k must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val typed = docs
      .filter(col(idCol).isNotNull)
      .select(col(groupCol).cast("string"), col(idCol).cast("long"))
      .as[(String, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[(String, Long)],
         state: GroupState[SampleState]) => {
          val st = state.getOption.getOrElse(SampleState(Nil, 0L))
          val incoming = it.map(_._2).toList
          // same priority string the batch operator's md5(cast(id as
          // string)) produces: lowercase hex of the decimal form
          val merged = (st.top ++ incoming.map(id => (md5Hex(id.toString), id)))
            .distinct.sorted.take(k)
          val seen = st.seen + incoming.size
          state.update(SampleState(merged, seen))
          if (incoming.nonEmpty) Iterator((key, merged.map(_._2), seen))
          else Iterator.empty
        })
      .toDF(groupCol, "sample_ids", "n_seen")
  }

  private def md5Hex(s: String): String =
    "%032x".format(new java.math.BigInteger(1,
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))))

  /** Keyed state for [[sequenceCountUpdates]]: events inside the
    * watermark horizon buffer until their time is FINAL, then fold into
    * the counter-promotion DP ([[graft.operators.SequenceCount]]
    * semantics, verbatim). Counter arrays are k+1 longs; the buffer is
    * bounded by the lateness horizon per key. */
  case class SeqCountState(buf: List[(Long, Int)], counters: List[Long],
                           fresh: List[Long], curTs: Long, opened: Long)

  /** Streaming `sequenceCount` — disjoint strictly-increasing chain
    * matches per key, continuously (the live sibling of
    * [[graft.operators.SequenceCount.sequenceCount]]). The DP needs
    * events in time order, so arrivals BUFFER in keyed state until the
    * watermark passes their timestamp (late data beyond `lateness` is
    * dropped by the watermark, same contract as every operator here);
    * final-timed events fold in sorted order into the same
    * counters/fresh discipline — the fold is order-independent among
    * equal timestamps, so micro-batch boundaries cannot change a count
    * (streaming ≡ batch, differential-pinned in the spec). An event-time
    * timeout drains a key's buffer when no new events arrive for it.
    *
    * Emits, in Update mode, one row per key per trigger with activity:
    * (user_id, n_matches, folded_through_us) — n_matches is monotone,
    * so consumers read the latest row per key.
    *
    * @param events streaming frame with `user_id`, `event_type`,
    *               event-time `timestamp` columns */
  def sequenceCountUpdates(events: DataFrame, steps: Seq[String],
                           lateness: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(steps.nonEmpty, "need at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val k = steps.size
    val stepIdx = steps.zipWithIndex.toMap
    val typed = events
      .withWatermark("timestamp", lateness)
      .select(col("user_id").cast("long"), col("event_type").cast("string"),
        col("timestamp"))
      .as[(Long, String, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, it: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[SeqCountState]) => {
          val st = state.getOption.getOrElse(SeqCountState(
            Nil, List.fill(k + 1)(0L), List.fill(k + 1)(0L), Long.MinValue, 0L))
          val incoming = it.flatMap { case (_, tpe, ts) =>
            stepIdx.get(tpe).map(i => (ts.getTime * 1000L, i + 1))
          }.toList
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, pending) = (st.buf ++ incoming).partition(_._1 <= wmUs)
          val counters = st.counters.toArray
          val fresh = st.fresh.toArray
          var curTs = st.curTs
          var opened = st.opened
          ready.sortBy(identity).foreach { case (ts, i) =>
            if (ts != curTs) {
              var j = 1
              while (j <= k) { counters(j) += fresh(j); fresh(j) = 0; j += 1 }
              curTs = ts
            }
            if (i == 1) { fresh(1) += 1; opened += 1 }
            else if (counters(i - 1) > 0) { counters(i - 1) -= 1; fresh(i) += 1 }
          }
          state.update(SeqCountState(pending, counters.toList, fresh.toList,
            curTs, opened))
          // drain the buffer even if this key never hears another event:
          // wake when the watermark passes the earliest pending timestamp
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(pending.map(_._1).min / 1000L + 1)
          if (opened > 0 && ready.nonEmpty)
            Iterator((key, counters(k) + fresh(k), curTs))
          else Iterator.empty
        })
      .toDF("user_id", "n_matches", "folded_through_us")
  }

  /** Keyed state for [[funnelUpdates]]: the watermark-horizon event
    * buffer plus the chosen timestamp per completed stage (greedy
    * prefix — never revised, only extended). */
  case class FunnelState(buf: List[(Long, Int)], chosen: List[Long])

  /** Streaming N-step strict funnel — the live sibling of
    * [[graft.operators.Funnel.funnel]], same greedy-earliest semantics:
    * t1 is the key's earliest step-1 event, each later stage keeps the
    * earliest event STRICTLY after the previous stage's chosen
    * timestamp, within `windowUs` of t1 (inclusive) and within its
    * per-transition gap cap. Arrivals buffer in keyed state until the
    * watermark passes their timestamp ([[sequenceCountUpdates]]'s
    * discipline), so stages fold over a globally time-ordered sequence
    * and a chosen timestamp is FINAL the moment it is set — greedy's
    * "earliest qualifying" is exactly "first qualifying in time order",
    * which is why the incremental fold equals the batch cascade at the
    * same watermark horizon (differential-pinned in the spec). Late
    * events beyond `lateness` are dropped by the watermark; an
    * event-time timeout drains a key's buffer when no new events arrive.
    *
    * Emits, in Update mode, one row per key per trigger with step-1
    * activity: (user_id, funnel_level, t1_us … tN_us) — the batch output
    * schema; funnel_level is monotone, so consumers read the latest row
    * per key.
    *
    * @param events streaming frame with `user_id`, `event_type`,
    *               event-time `timestamp` columns */
  def funnelUpdates(events: DataFrame, steps: Seq[String], windowUs: Long,
                    maxGapsUs: Seq[Option[Long]] = Seq.empty,
                    lateness: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(steps.nonEmpty, "need at least one funnel step")
    require(windowUs > 0, "window must be positive")
    require(maxGapsUs.isEmpty || maxGapsUs.size == steps.size - 1,
      s"maxGapsUs must have one entry per step transition " +
        s"(${steps.size - 1}), got ${maxGapsUs.size}")
    require(maxGapsUs.flatten.forall(_ > 0), "gap caps must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val k = steps.size
    val gaps: Seq[Option[Long]] =
      if (maxGapsUs.isEmpty) Seq.fill(math.max(k - 1, 0))(None) else maxGapsUs
    val stepIdx = steps.zipWithIndex.toMap
    val typed = events
      .withWatermark("timestamp", lateness)
      .select(col("user_id").cast("long"), col("event_type").cast("string"),
        col("timestamp"))
      .as[(Long, String, java.sql.Timestamp)]
    val updates = typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, it: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[FunnelState]) => {
          val st = state.getOption.getOrElse(FunnelState(Nil, Nil))
          val incoming = it.flatMap { case (_, tpe, ts) =>
            stepIdx.get(tpe).map(i => (ts.getTime * 1000L, i + 1))
          }.toList
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, pending) = (st.buf ++ incoming).partition(_._1 <= wmUs)
          val chosen = scala.collection.mutable.ArrayBuffer(st.chosen: _*)
          // (ts, step) order: at equal timestamps the earlier step folds
          // first, matching the batch cascade where stage i+1 must be
          // STRICTLY after stage i's choice (equal-ts never chains)
          ready.sortBy(identity).foreach { case (ts, i) =>
            if (i == 1) {
              if (chosen.isEmpty) chosen += ts
            } else if (chosen.size == i - 1 &&
                ts > chosen(i - 2) && ts <= chosen.head + windowUs &&
                gaps(i - 2).forall(g => ts <= chosen(i - 2) + g))
              chosen += ts
          }
          state.update(FunnelState(pending, chosen.toList))
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(pending.map(_._1).min / 1000L + 1)
          if (chosen.nonEmpty && ready.nonEmpty)
            Iterator((key, chosen.size, chosen.toSeq))
          else Iterator.empty
        })
      .toDF("user_id", "funnel_level", "ts_us")
    updates.select(col("user_id") +: col("funnel_level").cast("int").as("funnel_level") +:
      (1 to k).map(i =>   // ts_us only reaches funnel_level: NULL beyond
        try_element_at(col("ts_us"), lit(i)).as(s"t${i}_us")): _*)
  }

  /** Keyed state for [[retentionUpdates]]: horizon buffer of
    * (ts_us, period), the cohort period (MinValue = not yet seen), and
    * one hit flag per offset. */
  case class RetentionState(buf: List[(Long, Long)], p0: Long,
                            hit: List[Boolean])

  /** Streaming per-key cohort retention — the live sibling of
    * [[graft.operators.Retention.cohorts]], emitting PER-KEY flag
    * updates instead of the batch per-cohort roll-up (a second stateful
    * aggregation behind flatMapGroupsWithState is not composable in
    * Update mode; the roll-up is one exact groupBy over the latest row
    * per key, pinned against the batch operator in the spec). Arrivals
    * buffer until the watermark finalizes their event time, then fold in
    * time order: the first finalized event fixes the cohort period p0
    * (the batch `min(period)` — equal because `period` is derived from
    * event time and therefore non-decreasing in it, which this operator
    * REQUIRES of its input), later events set `retained_p<o>` flags
    * (`period == p0 + o`, or any period in (p0, p0+o] with
    * `cumulative`). Flags are monotone; consumers read the latest row
    * per key.
    *
    * @param events streaming frame with `user_id`, event-time
    *               `timestamp`, and integer `period` columns (period
    *               non-decreasing in timestamp, e.g.
    *               `micros div 86400000000`) */
  def retentionUpdates(events: DataFrame, offsets: Seq[Int],
                       cumulative: Boolean = false,
                       lateness: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(offsets.nonEmpty, "need at least one retention offset")
    require(offsets.forall(_ >= 1), "offsets must be >= 1")
    require(offsets.distinct == offsets, "offsets must be distinct")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark("timestamp", lateness)
      .select(col("user_id").cast("long"), col("timestamp"),
        col("period").cast("long"))
      .as[(Long, java.sql.Timestamp, Long)]
    val updates = typed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, it: Iterator[(Long, java.sql.Timestamp, Long)],
         state: GroupState[RetentionState]) => {
          val st = state.getOption.getOrElse(
            RetentionState(Nil, Long.MinValue, List.fill(offsets.size)(false)))
          val incoming = it.map { case (_, ts, p) => (ts.getTime * 1000L, p) }.toList
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, pending) = (st.buf ++ incoming).partition(_._1 <= wmUs)
          var p0 = st.p0
          val hit = st.hit.toArray
          ready.sortBy(identity).foreach { case (_, p) =>
            if (p0 == Long.MinValue) p0 = p
            else {
              var oi = 0
              while (oi < offsets.size) {
                if (if (cumulative) p > p0 && p <= p0 + offsets(oi)
                    else p == p0 + offsets(oi)) hit(oi) = true
                oi += 1
              }
            }
          }
          state.update(RetentionState(pending, p0, hit.toList))
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(pending.map(_._1).min / 1000L + 1)
          if (p0 != Long.MinValue && ready.nonEmpty)
            Iterator((key, p0, hit.toSeq))
          else Iterator.empty
        })
      .toDF("user_id", "cohort_period", "hits")
    updates.select(col("user_id") +: col("cohort_period") +:
      offsets.zipWithIndex.map { case (o, i) =>
        element_at(col("hits"), i + 1).cast("int").as(s"retained_p$o") }: _*)
  }

  /** Continuously-maintained HLL sketch cube ([[graft.operators
    * .Sketches]]) over a document/event stream: each micro-batch
    * sketches its own rows and appends them to the persisted cube,
    * partitioned by `batch_id` with dynamic partition overwrite (the
    * same at-least-once discipline as [[nearDedupIntake]]'s index).
    * Any reader answers distinct-count roll-ups from the live cube via
    * [[graft.operators.Sketches.hllRollup]] without touching the
    * stream or the raw rows.
    *
    * Replay safety is STRICTLY STRONGER here than for the dedup index:
    * a retried batch overwrites its own partition (no duplicate rows),
    * and even the compaction race nearDedupIntake must guard against —
    * a replayed batch whose rows were already folded into the
    * `batch_id = -1` partition, leaving the same data represented
    * twice — is harmless, because sketch insertion has SET semantics:
    * unioning a value's sketch contribution twice is the identity.
    * Distinct-count cubes are idempotent under at-least-once delivery
    * by construction; no exclusion guard exists because none is
    * needed.
    *
    * Use with `events.writeStream.foreachBatch(
    * sketchCubeIntake(path, Seq("event_type"), "user_id")).start()`. */
  def sketchCubeIntake(cubePath: String, dims: Seq[String],
                       countCol: String, shards: Int = 32, lgK: Int = 12,
                       sink: (Long) => Unit = _ => ())
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    graft.operators.Sketches.hllCube(batch, dims, countCol, shards, lgK)
      .withColumn("batch_id", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .mode("overwrite")
      .parquet(cubePath)
    sink(batchId)
  }

  /** Streamed KLL quantile cube: [[sketchCubeIntake]]'s order-statistics
    * sibling, maintaining a [[graft.operators.Sketches.kllCube]] over
    * `valueCol` per micro-batch — any reader answers arbitrary
    * quantiles from the live cube via `Sketches.kllRollup`.
    *
    * Replay safety is WEAKER than the HLL cube's, on both axes:
    *
    *  - KLL is a MULTISET sketch: a replay racing a compaction that
    *    already folded the batch into `batch_id = -1` would leave that
    *    batch's values at double weight, which shifts quantiles (unlike
    *    HLL, where double insertion is the identity). So KLL compaction
    *    follows [[compactIndex]]'s stricter discipline: run
    *    [[compactKllCube]] only between batches, with `belowBatchId` =
    *    the next batch id, never from a sink hook racing a retry window.
    *  - KLL is RANDOMIZED: a retried batch's dynamic partition
    *    overwrite replaces its partition with a re-sketch of the SAME
    *    multiset — the represented data is unchanged (no double
    *    weighting), but compaction coin-flips make the new sketch a
    *    different in-bound approximation, so estimates may move within
    *    the rank-error bound across a replay (HLL's deterministic
    *    hashing reproduces bit-identical sketches; KLL's contract is
    *    the bound, not the bits). */
  def kllCubeIntake(cubePath: String, dims: Seq[String], valueCol: String,
                    shards: Int = 32, sink: (Long) => Unit = _ => ())
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    graft.operators.Sketches.kllCube(batch, dims, valueCol, shards)
      .withColumn("batch_id", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .mode("overwrite")
      .parquet(cubePath)
    sink(batchId)
  }

  /** Fold a streamed cube's per-batch partitions below `belowBatchId`
    * into one `batch_id = -1` partition, UNIONING same-(dims, _shard)
    * sketches — file count stops growing with stream lifetime while
    * estimates are unchanged (union associativity; and see
    * [[sketchCubeIntake]] for why a replay racing the fold cannot
    * corrupt a set-semantics cube). Same staged-swap discipline as
    * [[compactIndex]]: never leaves the path without data. */
  def compactCube(spark: org.apache.spark.sql.SparkSession, cubePath: String,
                  dims: Seq[String], numFiles: Int = 8,
                  belowBatchId: Long = Long.MaxValue): Unit =
    compactSketchCube(spark, cubePath, dims :+ "_shard", numFiles,
      belowBatchId, hll_union_agg(col("hll")).as("hll"))

  /** [[compactCube]] for a [[kllCubeIntake]] cube. Multiset semantics:
    * safe only between batches (see [[kllCubeIntake]]) — pass the next
    * batch id as `belowBatchId` so a live retry window is never folded. */
  def compactKllCube(spark: org.apache.spark.sql.SparkSession,
                     cubePath: String, dims: Seq[String], numFiles: Int = 8,
                     belowBatchId: Long = Long.MaxValue): Unit =
    compactSketchCube(spark, cubePath, dims :+ "_shard", numFiles,
      belowBatchId, call_function("kll_merge_agg_double", col("kll")).as("kll"))

  /** Streamed Theta set-algebra cube: [[sketchCubeIntake]]'s sibling for
    * audience-overlap questions — each micro-batch writes one Theta
    * sketch per `dims` group ([[graft.operators.Sketches
    * .thetaSketches]]); readers merge per-batch rows with
    * [[graft.operators.Sketches.thetaRollup]] and answer |A|, |B|,
    * |A∩B|, |A∖B| for any group pair via `thetaOverlap` — live, from
    * KB-sized blobs, never the raw stream. Theta insertion is SET
    * semantics with deterministic value hashing, so the HLL cube's
    * replay argument applies verbatim: overwrite, replay, even a
    * replay racing [[compactThetaCube]] all leave answers unchanged. */
  def thetaCubeIntake(cubePath: String, dims: Seq[String], countCol: String,
                      sink: (Long) => Unit = _ => ())
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    graft.operators.Sketches.thetaSketches(batch, dims, countCol)
      .withColumn("batch_id", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .mode("overwrite")
      .parquet(cubePath)
    sink(batchId)
  }

  /** [[compactCube]] for a [[thetaCubeIntake]] cube (set semantics —
    * same harmless-replay story as the HLL fold). */
  def compactThetaCube(spark: org.apache.spark.sql.SparkSession,
                       cubePath: String, dims: Seq[String], numFiles: Int = 8,
                       belowBatchId: Long = Long.MaxValue): Unit =
    compactSketchCube(spark, cubePath, dims, numFiles, belowBatchId,
      call_function("theta_union_agg", col("theta")).as("theta"))

  private def compactSketchCube(spark: org.apache.spark.sql.SparkSession,
                                cubePath: String, groupCols: Seq[String],
                                numFiles: Int, belowBatchId: Long,
                                mergeAgg: Column): Unit = {
    import graft.operators.Artifacts
    require(numFiles >= 1, "numFiles must be >= 1")
    if (!Artifacts.hasData(spark, cubePath)) return
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(cubePath)
    val fs = path.getFileSystem(hadoopConf)
    val staging = new org.apache.hadoop.fs.Path(cubePath + "._compact")
    val backup = new org.apache.hadoop.fs.Path(cubePath + "._pre_compact")
    val all = spark.read.parquet(cubePath)
      .withColumn("batch_id",
        when(col("batch_id") < lit(belowBatchId), lit(-1L))
          .otherwise(col("batch_id")))
    all.groupBy((groupCols :+ "batch_id").map(col): _*)
      .agg(mergeAgg)
      .repartition(numFiles)
      .write.partitionBy("batch_id").mode("overwrite")
      .parquet(staging.toString)
    if (fs.exists(backup)) fs.delete(backup, true)
    if (!fs.rename(path, backup))
      throw new java.io.IOException(s"compaction swap failed: $path -> $backup")
    if (!fs.rename(staging, path)) {
      fs.rename(backup, path)
      throw new java.io.IOException(s"compaction swap failed: $staging -> $path")
    }
    spark.catalog.refreshByPath(cubePath)
  }

  /** Compact a [[nearDedupIntake]] standing index: one parquet partition
    * per micro-batch is the idempotent-retry contract, but thousands of
    * ingest batches mean thousands of small files — the classic
    * streaming small-files problem, paid on EVERY subsequent batch's
    * index scan. Rewrites the index as a single `batch_id = -1`
    * generation of `numFiles` right-sized files, atomically from the
    * reader's perspective (same SparkSession): stage to `<path>._compact`,
    * swap via FileSystem rename, keep the old generation at
    * `<path>._pre_compact` until the caller verifies. Run between
    * batches — the safe hook is the START of batch N (before its index
    * read), with `belowBatchId = N`: batches < N have committed, and
    * batch N's OWN partition — possibly written by a failed earlier
    * attempt of N whose retry is about to dynamic-partition-overwrite
    * it — is left out of the fold, so a retried batch can never find
    * its rows duplicated into `-1`. Compacting from a sink hook AFTER
    * the append (pre-commit) has exactly that race; don't. Live
    * batch_ids are never negative, so a compacted generation can never
    * collide with a retried batch's dynamic-partition overwrite. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                   numFiles: Int = 32,
                   belowBatchId: Long = Long.MaxValue): Unit = {
    import graft.operators.Artifacts
    require(numFiles >= 1, "numFiles must be >= 1")
    if (!Artifacts.hasData(spark, indexPath)) return
    swapInto(spark, indexPath) { staging =>
      spark.read.parquet(indexPath)
        .select(col("id"), col("sh"), col("sig"),
          when(col("batch_id") < lit(belowBatchId), lit(-1L))
            .otherwise(col("batch_id")).as("batch_id"))
        // a re-delivery whose only copy was already compacted is re-admitted
        // once (see nearDedupIntake) — identical content under the same id
        // yields byte-identical (id, sh, sig) rows, so folding partitions is
        // the natural point to collapse that bounded duplication
        .distinct()
        .repartition(numFiles, col("id"))
        .write.partitionBy("batch_id").mode("overwrite")
        .parquet(staging)
    }
  }

  /** Compact a [[fingerprintDedupIntake]] standing index ((id, sim,
    * batch_id) — 64-bit perceptual fingerprints): partitions below
    * `belowBatchId` fold into `batch_id = -1` as `numFiles` right-sized
    * files, atomically via [[swapInto]]'s rename-swap. Long-running
    * [[graft.tools.StreamMedia]] runs otherwise accumulate one parquet
    * partition per micro-batch, and every later batch's index scan +
    * [[graft.operators.Dedup.hammingAgainst]] banding pays the
    * file-count tax. Same batch-START-only hook discipline as
    * [[compactIndex]] (fold only committed batches — a retried batch's
    * own partition must stay live so its dynamic-partition overwrite
    * can't duplicate rows into `-1`), and the same bounded-duplication
    * argument for `distinct()`: a re-delivery whose only copy was
    * already compacted re-admits a byte-identical (id, sim) row, which
    * the next fold collapses. */
  def compactFingerprintIndex(spark: org.apache.spark.sql.SparkSession,
                              indexPath: String, numFiles: Int = 32,
                              belowBatchId: Long = Long.MaxValue): Unit = {
    import graft.operators.Artifacts
    require(numFiles >= 1, "numFiles must be >= 1")
    if (!Artifacts.hasData(spark, indexPath)) return
    swapInto(spark, indexPath) { staging =>
      spark.read.parquet(indexPath)
        .select(col("id"), col("sim"),
          when(col("batch_id") < lit(belowBatchId), lit(-1L))
            .otherwise(col("batch_id")).as("batch_id"))
        .distinct()
        .repartition(numFiles, col("id"))
        .write.partitionBy("batch_id").mode("overwrite")
        .parquet(staging)
    }
  }

  /** Compaction for COUNT indexes ([[substringIntake]]'s
    * (m, cnt, batch_id) store): partitions below `belowBatchId` fold
    * into `batch_id = -1` with counts SUMMED per key — the additivity
    * the intake's duplicate test relies on, so a fold changes no
    * answer. Same batch-start-only discipline as [[compactIndex]]:
    * fold only batches the checkpoint has committed, or a replay's
    * own counts hide inside -1 and self-flag its documents. */
  def compactCountIndex(spark: org.apache.spark.sql.SparkSession,
                        indexPath: String, numFiles: Int = 32,
                        belowBatchId: Long = Long.MaxValue): Unit = {
    import graft.operators.Artifacts
    require(numFiles >= 1, "numFiles must be >= 1")
    if (!Artifacts.hasData(spark, indexPath)) return
    swapInto(spark, indexPath) { staging =>
      spark.read.parquet(indexPath)
        .select(col("m"), col("cnt"),
          when(col("batch_id") < lit(belowBatchId), lit(-1L))
            .otherwise(col("batch_id")).as("batch_id"))
        .groupBy("m", "batch_id").agg(sum(col("cnt")).as("cnt"))
        .repartition(numFiles, col("m"))
        .write.partitionBy("batch_id").mode("overwrite")
        .parquet(staging)
    }
  }

  /** Compaction for [[vectorIngestIntake]] list stores (IVF float
    * lists or PQ code lists — schema-agnostic beyond the `cent_id` and
    * `batch_id` columns): partitions below `belowBatchId` fold into
    * `batch_id = -1`, files re-clustered by `cent_id` so a serving
    * probe's cell join touches few files per cell. List rows are pure
    * functions of (vector, pinned model), so a re-delivered batch whose
    * only copy was already compacted re-admits byte-identical rows and
    * `distinct()` collapses that bounded duplication at the fold —
    * [[compactIndex]]'s argument verbatim. Same committed-batches-only
    * horizon discipline, same [[swapInto]] rename-swap (the store never
    * vanishes mid-crash). */
  def compactVectorIndex(spark: org.apache.spark.sql.SparkSession,
                         indexPath: String, numFiles: Int = 32,
                         belowBatchId: Long = Long.MaxValue): Unit = {
    import graft.operators.Artifacts
    require(numFiles >= 1, "numFiles must be >= 1")
    if (!Artifacts.hasData(spark, indexPath)) return
    swapInto(spark, indexPath) { staging =>
      val df = spark.read.parquet(indexPath)
      val dataCols = df.columns.filterNot(_ == "batch_id").map(col)
      df.select(dataCols :+
          when(col("batch_id") < lit(belowBatchId), lit(-1L))
            .otherwise(col("batch_id").cast("long")).as("batch_id"): _*)
        .distinct()
        .repartition(numFiles, col("cent_id"))
        // sort within files so parquet row-group min/max on cent_id are
        // tight — the probed-cell pushdown (Similarity.pruneToCells)
        // then SKIPS every unprobed row group at serve time
        .sortWithinPartitions("cent_id")
        .write.partitionBy("batch_id").mode("overwrite")
        .parquet(staging)
    }
  }

  /** Generation-aware compaction for a [[graft.operators.VectorStore]]:
    * fold the LIVE generation's ingested batch partitions at or below
    * `upTo` into its `batch_id = -1` bulk (both frames for PQ stores)
    * and advance the recorded high water to the fold boundary — without
    * this, continuous ingest accumulates one partition per micro-batch
    * forever. The cutover contract SURVIVES compaction in either crash
    * order because folding REMOVES the partitions it absorbs: a
    * [[graft.operators.VectorStore.corpusAsOf]] snapshot taken at any
    * hw ≥ the published high water stays exact (folded rows arrive via
    * the bulk, unfolded ones via the ≤ hw partition filter), and
    * [[graft.operators.VectorStore.catchUp]] replays exactly the
    * partitions that still exist above the new generation's high water
    * — a folded batch has nothing left to replay and is already inside
    * every snapshot that could have seen it. Run it from the ops loop
    * between publishes (the single-writer discipline — don't fold
    * under a publisher's feet while its snapshot scan is mid-read; the
    * swap is atomic but a concurrent reader can hit the rename
    * window). `upTo` defaults to everything currently landed. */
  def compactVectorStore(spark: org.apache.spark.sql.SparkSession,
                         root: String, upTo: Long = Long.MaxValue - 1,
                         numFiles: Int = 32): Unit = {
    import graft.operators.{Artifacts, VectorStore}
    val g = VectorStore.current(spark, root).getOrElse(return)
    // the fold boundary must be read BEFORE folding (afterwards the
    // absorbed ids are gone); null when no partition is in range
    val boundary = spark.read.parquet(g.lists)
      .filter(col("batch_id") =!= lit(-1L) && col("batch_id") <= lit(upTo))
      .agg(max(col("batch_id").cast("long"))).head()
    if (boundary.isNullAt(0)) return // nothing to fold
    compactVectorIndex(spark, g.lists, numFiles, belowBatchId = upTo + 1)
    if (Artifacts.exists(spark, g.flists))
      compactVectorIndex(spark, g.flists, numFiles, belowBatchId = upTo + 1)
    // partitions ≤ upTo are now inside the bulk — the recorded high
    // water moves up so the contract's "bulk holds everything ≤ hw"
    // reading stays literal
    VectorStore.recordHighWater(spark, g, boundary.getLong(0))
  }

  /** Write a replacement for `storePath` into a staging dir, then swap
    * it in with two renames (backup kept until the swap lands — the
    * store must never vanish, even mid-crash). Shared by the
    * batch-partitioned incremental stores' compactions. */
  private def swapInto(spark: org.apache.spark.sql.SparkSession,
                       storePath: String)(write: String => Unit): Unit = {
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(storePath)
    val fs = path.getFileSystem(hadoopConf)
    val staging = new org.apache.hadoop.fs.Path(storePath + "._compact")
    val backup = new org.apache.hadoop.fs.Path(storePath + "._pre_compact")
    write(staging.toString)
    if (fs.exists(backup)) fs.delete(backup, true)
    if (!fs.rename(path, backup))
      throw new java.io.IOException(s"compaction swap failed: $path -> $backup")
    if (!fs.rename(staging, path)) {
      fs.rename(backup, path) // restore — the store must never vanish
      throw new java.io.IOException(s"compaction swap failed: $staging -> $path")
    }
    // the shared FileStatusCache can hold the pre-swap listing for this
    // path; a later batch reading stale statuses would hit deleted files
    spark.catalog.refreshByPath(storePath)
  }

  /** Current cluster assignment of an incrementally-maintained labels
    * store ([[componentsApply]]): latest delta wins per id. Sparse by
    * construction — only ids that ever appeared in a duplicate pair
    * have rows; everything else is its own singleton component
    * (callers COALESCE(label, id), same as the batch manifest).
    *
    * @param excludeBatchId partition to ignore — a replaying batch must
    *        not read its own previous attempt's delta */
  def currentComponents(spark: org.apache.spark.sql.SparkSession,
                        labelsPath: String,
                        excludeBatchId: Long = Long.MinValue): DataFrame = {
    import graft.operators.Artifacts
    import spark.implicits._
    if (!Artifacts.hasData(spark, labelsPath))
      Seq.empty[(Long, Long)].toDF("id", "label")
    else
      spark.read.parquet(labelsPath)
        .filter(col("batch_id") =!= lit(excludeBatchId))
        // compacted snapshot rows sit at batch_id = -1, so any live
        // delta outranks them; among live deltas the newest batch wins
        .groupBy(col("id"))
        .agg(max_by(col("label"), col("batch_id")).as("label"))
  }

  /** Fold one micro-batch of duplicate pairs into the persisted labels
    * store — incremental cluster closure
    * ([[graft.operators.Dedup.connectedComponentsIncrement]]): the
    * closure runs over the CONTRACTED batch graph only, and the store
    * receives a batch-sized delta partition, never a snapshot rewrite.
    * Replay-idempotent by the same discipline as the near-dedup index:
    * the current assignment is read EXCLUDING this batch's partition
    * and the delta lands via dynamic partition overwrite, so a retried
    * batch recomputes and overwrites exactly its own rows. */
  def componentsApply(spark: org.apache.spark.sql.SparkSession,
                      labelsPath: String, pairs: DataFrame,
                      batchId: Long): Unit = {
    val current = currentComponents(spark, labelsPath, excludeBatchId = batchId)
    val delta = graft.operators.Dedup
      .connectedComponentsIncrement(current, pairs)
      .withColumn("batch_id", lit(batchId))
      // sever the store read from the store write (same rule as the
      // survivors checkpoint: writing a path recaches every plan that
      // scans it, and the writer must not read its own output path)
      .localCheckpoint(true)
    try {
      // an all-empty write would create a bare dir that breaks schema
      // inference on the next read; a no-pair batch simply leaves the
      // store as-is (replay-safe: the same batch recomputes the same
      // empty delta)
      if (!delta.isEmpty) {
        delta.write
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .mode("overwrite")
          .parquet(labelsPath)
        spark.catalog.refreshByPath(labelsPath)
      }
    } finally graft.operators.CacheRegistry.releaseAll()
  }

  /** Fold committed label deltas into a batch_id = -1 snapshot,
    * latest-wins applied — bounds [[currentComponents]]' per-batch scan
    * to (live corpus ids) instead of (Σ historical deltas). Same
    * in-flight-batch exclusion contract as [[compactIndex]]. */
  def compactLabels(spark: org.apache.spark.sql.SparkSession,
                    labelsPath: String, numFiles: Int = 32,
                    belowBatchId: Long = Long.MaxValue): Unit = {
    import graft.operators.Artifacts
    require(numFiles >= 1, "numFiles must be >= 1")
    if (!Artifacts.hasData(spark, labelsPath)) return
    swapInto(spark, labelsPath) { staging =>
      val all = spark.read.parquet(labelsPath)
      val folded = all.filter(col("batch_id") < lit(belowBatchId))
        .groupBy(col("id"))
        .agg(max_by(col("label"), col("batch_id")).as("label"))
        .withColumn("batch_id", lit(-1L))
      folded.unionByName(
          all.filter(col("batch_id") >= lit(belowBatchId))
            .select("id", "label", "batch_id"))
        .repartition(numFiles, col("id"))
        .write.partitionBy("batch_id").mode("overwrite")
        .parquet(staging)
    }
  }
}
