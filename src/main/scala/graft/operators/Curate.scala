package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed curation pipeline as ONE reusable operator — exact
  * dedup → quality gate → eval-set decontamination → near-dup cluster
  * keep-best — emitting a manifest row per input document with its
  * fate. Shared by the oracle-gated `corpus_curate` query and the
  * [[graft.tools.CleanCorpus]] CLI so the two surfaces cannot drift.
  *
  * Stage semantics are exactly the standalone operators'
  * ([[TextAnalysis.fingerprintMd5]]/quality, [[Dedup.crossNgramOverlap]],
  * [[Dedup.ngramJaccard]] + [[Dedup.connectedComponents]] + quality
  * argmax); each stage sees only its predecessor's survivors, so the
  * n-gram df caps re-derive over the surviving corpus as a staged
  * production run would.
  *
  * Scale shape: document text crosses the wire once — the exact-dedup
  * verdict is computed on a SLIM (doc_id, fingerprint) frame and joined
  * back by id; every later stage inherits the standalone operators'
  * slim-shuffle designs. Multi-consumer survivor frames persist once
  * (tracked via [[CacheRegistry]]).
  */
object Curate {

  /** Fate manifest over a (doc_id, text) frame.
    *
    * @param docs   corpus; must carry `doc_id` (long) and `text`
    * @param probes eval-set documents (same two columns) for the
    *               contamination stage; pass an EMPTY frame to disable
    *               decontamination (no doc gains the `contaminated`
    *               fate)
    * @return (doc_id, fate ∈ {exact_dup, low_quality, contaminated,
    *         near_dup, kept}, quality_score), one row per input doc */
  /** Stage-0 enrichment shared by the batch manifest and the streaming
    * [[graft.streaming.StreamingAnalytics.curateIntake]] — ONE
    * definition of the quality/fingerprint columns so the two surfaces
    * cannot drift. */
  private[graft] def enrich(docs: DataFrame): DataFrame = {
    val qscore = TextAnalysis.qualityColumns(col("text"))
      .collectFirst { case ("quality_score", c) => c }.get
    docs.select(col("doc_id"), col("text"),
      qscore.as("quality_score"),
      TextAnalysis.fingerprintMd5(col("text")).as("fingerprint"))
  }

  def manifest(docs: DataFrame, probes: DataFrame,
               minQuality: Double = 0.5): DataFrame = {
    val base = enrich(docs)
    // slim exact-dup verdict: only (doc_id, fingerprint) rides the window
    val rnSlim = base.select(col("doc_id"), col("fingerprint"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("fingerprint").orderBy("doc_id")))
      .select("doc_id", "rn")
    // fingerprint is consumed by rnSlim only — past this join the fate
    // logic needs just rn; dropping it keeps the 32-char hex string out
    // of the multi-consumer cache and the id join
    val labeled = base.drop("fingerprint").join(rnSlim, "doc_id").persist()
    CacheRegistry.track(labeled)
    val s2 = labeled.filter(col("rn") === 1 &&
      col("quality_score") >= minQuality)
    // persisted: consumed by BOTH the stage-3 anti-join and the
    // contaminated fate branch — without the cache the whole 5-gram
    // sweep (df-cap anti-join, probe join, shared-ngram aggregate) runs
    // twice
    val contaminated = Dedup.crossNgramOverlap(
        s2, probes, "doc_id", "text",
        n = 5, minShared = 3, maxDocFreq = 100)
      .select("doc_id").distinct()
      .persist()
    CacheRegistry.track(contaminated)
    // s3's two consumers need only (doc_id, text, quality_score) — the
    // pair kernel the text, the keep-best window the score; rn rides no
    // further, so the survivor cache stays three columns
    val s3 = s2.select("doc_id", "text", "quality_score")
      .join(contaminated, Seq("doc_id"), "left_anti").persist()
    CacheRegistry.track(s3)
    val clusters = Dedup.connectedComponents(
      Dedup.ngramJaccard(s3, "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = 100))
    val wBest = Window.partitionBy("component")
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    // UNION-WITH-PRIORITY fate assembly (r22): the old when-chain
    // re-joined the keep-best verdict and the contamination set onto the
    // FULL labeled frame by doc_id (one broadcast + one sort-merge join
    // over every input doc). But the stage filters already partition the
    // corpus exactly — rn > 1 ∨ q < min (stage-1/2 rejects), the
    // contaminated set (⊆ s2 by construction), and s3 (everything else)
    // — so each branch can emit its fate rows directly where its verdict
    // is computed and the manifest is their disjoint union: the same
    // (doc_id, fate, quality_score) row set with ZERO final joins.
    val fate12 = labeled
      .filter(col("rn") > 1 || col("quality_score") < minQuality)
      .select(col("doc_id"),
        when(col("rn") > 1, "exact_dup").otherwise("low_quality").as("fate"),
        col("quality_score"))
    val fateCont = s2.select("doc_id", "quality_score")
      .join(contaminated, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), lit("contaminated").as("fate"),
        col("quality_score"))
    val fateNear = s3.select(col("doc_id"), col("quality_score"))
      .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_outer")
      .withColumn("component", coalesce(col("label"), col("doc_id")))
      .select(col("doc_id"),
        when(row_number().over(wBest) === 1, "kept")
          .otherwise("near_dup").as("fate"),
        col("quality_score"))
    fate12.unionByName(fateCont).unionByName(fateNear)
  }

  /** [[manifest]] plus the substring-dedup stage a production curation
    * run appends after document-level keep-best (the C4/RefinedWeb
    * lineage: drop duplicate DOCUMENTS first, then excise duplicated
    * SPANS inside the survivors): [[Dedup.dupSpans]] re-derives maximal
    * duplicated ≥`spanTokens`-token spans OVER THE KEPT SUBSET ONLY —
    * the same sees-only-its-predecessor's-survivors staging as every
    * other stage, so a span duplicated solely between a kept doc and a
    * dropped near-dup is NOT counted (its other copy is already gone).
    *
    * Two manifest columns extend the fate row (one row per input doc,
    * unchanged): `n_tokens` (kept docs' token count; NULL for docs that
    * did not survive to this stage) and `n_dup_tokens` (token mass
    * inside duplicated spans — what [[Dedup.stripDupSpans]] would
    * excise; 0 for clean kept docs, NULL for non-kept). The applied
    * strip (reassembled text) stays the standalone
    * `corpus_strip_substrings` operator; the manifest prices it.
    *
    * Scale shape: the manifest frame is persisted before its two
    * consumers (the kept-filter and the output join) — without it the
    * ngram pair kernel + closure would run twice; it is 3 slim columns
    * per doc. The span stage inherits [[Dedup.dupSpans]]'s design
    * (64-bit prefilter pass, bounds-probed broadcast semi-join, span
    * text never crosses an exchange). */
  def manifestWithStrip(docs: DataFrame, probes: DataFrame,
                        minQuality: Double = 0.5,
                        spanTokens: Int = 20): DataFrame = {
    val m = manifest(docs, probes, minQuality).persist()
    CacheRegistry.track(m)
    val keptDocs = docs.select(col("doc_id"), col("text"))
      .join(m.filter(col("fate") === "kept").select("doc_id"), "doc_id")
      .persist()
    CacheRegistry.track(keptDocs)
    val spanStats = Dedup.dupSpans(keptDocs, "doc_id", "text", spanTokens)
      .groupBy("doc_id").agg(sum(col("span_len")).as("dup_toks"))
    val keptMeta = keptDocs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(spanStats, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_toks"), lit(0L)).as("n_dup_tokens"))
    m.join(keptMeta, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("fate"), col("quality_score"),
        col("n_tokens"), col("n_dup_tokens"))
  }
}
