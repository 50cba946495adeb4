package graft.tools

import graft.operators.{Bpe, Dedup, Packing, Sampling, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CLI corpus-preparation pipeline — the extension-operator analogue of
  * [[ParseLogs]]: read a documents parquet (doc_id, text, source, …),
  * run the standard cleaning chain, and write the training-ready
  * manifests. One invocation produces:
  *
  *   <out>/clean/      cleaned corpus manifest (exact-dedup canonical,
  *                     quality-gated, language-tagged, per-doc stats)
  *   <out>/span_dedup/ sub-document span-dedup manifest over the cleaned
  *                     corpus (C4-style keep-first, SPARK_GRAFT_SPAN
  *                     tokens per span; 0 disables)
  *   <out>/curate_manifest/ per-document fate audit (exact_dup /
  *                     low_quality / contaminated / near_dup / kept) —
  *                     [[graft.operators.Curate.manifest]]; probes from
  *                     SPARK_GRAFT_EVAL parquet when set
  *   <out>/splits/     deterministic train/val/test assignment
  *   <out>/packed/     GPT-style sequence-pack manifest (seqLen tokens)
  *   <out>/bpe_merges/ learned BPE merge table (rank-ordered)
  *   <out>/nd_index/   MinHash signature standing index over the cleaned
  *                     corpus, in [[graft.streaming.StreamingAnalytics
  *                     .nearDedupIntake]]'s layout (batch_id = -1
  *                     generation) — the batch bootstrap of the
  *                     streaming intake: later crawls dedupe against
  *                     this without re-shingling it
  *   <out>/report/     one-row run summary
  *
  * Every stage is the library operator, unchanged — this tool is
  * composition + I/O only, so its outputs inherit the operators'
  * oracle-checked semantics.
  *
  * Usage: CleanCorpus <documents.parquet> <outDir> [master]
  * Env: SPARK_GRAFT_SEQLEN (default 1024), SPARK_GRAFT_BPE_MERGES
  * (default 64), SPARK_GRAFT_MIN_QUALITY (default 0.5),
  * SPARK_GRAFT_SPAN (span-dedup tokens per span, default 20, 0 = off),
  * SPARK_GRAFT_ND_INDEX (near-dedup index generation, default 1, 0 = off).
  */
object CleanCorpus {
  def main(args: Array[String]): Unit = {
    val input = args(0)
    val outDir = args(1)
    val master = if (args.length > 2) args(2) else "local[*]"
    val seqLen = sys.env.getOrElse("SPARK_GRAFT_SEQLEN", "1024").toInt
    val nMerges = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "64").toInt
    val minQuality = sys.env.getOrElse("SPARK_GRAFT_MIN_QUALITY", "0.5").toDouble
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft-clean-corpus")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(input)

    // 1. clean: the shared corpus_clean chain (TextAnalysis.cleanEnrich +
    //    cleanGate — the CLI cannot drift from the oracle-checked query).
    //    The enriched frame is persisted so the gate, the report, and
    //    the downstream steps read the input exactly ONCE.
    val enriched = TextAnalysis.cleanEnrich(docs, "text").persist()
    val clean = TextAnalysis.cleanGate(enriched, "doc_id", minQuality).persist()
    clean.write.mode("overwrite").parquet(s"$outDir/clean")

    // 1b. sub-document span dedup over the cleaned corpus: drops
    //     boilerplate spans repeated across surviving documents
    val spanTokens = sys.env.getOrElse("SPARK_GRAFT_SPAN", "20").toInt
    if (spanTokens > 0)
      Dedup.spanDedup(clean.select("doc_id", "text"), "doc_id", "text", spanTokens)
        .write.mode("overwrite").parquet(s"$outDir/span_dedup")

    // 1c. full curation fate manifest (audit artifact): exact dups,
    //     quality gate, optional eval-set decontamination
    //     (SPARK_GRAFT_EVAL = parquet of (doc_id, text) probe docs;
    //     unset = stage disabled), near-dup keep-best — the
    //     graft.operators.Curate pipeline, unchanged from the
    //     oracle-gated corpus_curate query
    if (sys.env.getOrElse("SPARK_GRAFT_CURATE", "1").toInt > 0) {
      val probes = sys.env.get("SPARK_GRAFT_EVAL") match {
        case Some(p) => spark.read.parquet(p).select("doc_id", "text")
        case None => docs.select("doc_id", "text").limit(0)
      }
      graft.operators.Curate.manifest(
          docs.select("doc_id", "text"), probes, minQuality)
        .write.mode("overwrite").parquet(s"$outDir/curate_manifest")
    }

    // 2. deterministic splits over the CLEANED corpus
    Sampling.hashSplit(clean.select("doc_id", "source"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .write.mode("overwrite").parquet(s"$outDir/splits")

    // 3. sequence packing per source shard at seqLen tokens
    Packing.packManifest(clean, "doc_id", "source",
        size(TextAnalysis.tokens(col("text"))), seqLen = seqLen)
      .write.mode("overwrite").parquet(s"$outDir/packed")

    // 3b. standing near-dedup index: PREPARED (id, sh, sig) signature
    //     rows in the streaming intake's layout, so an ingest pipeline
    //     boots from this batch build and each cleaned document is
    //     shingled exactly once, here
    if (sys.env.getOrElse("SPARK_GRAFT_ND_INDEX", "1").toInt > 0)
      Dedup.minhashPrepare(clean.select("doc_id", "text"), "doc_id", "text")
        .withColumn("batch_id", lit(-1L))
        .write.option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").mode("overwrite")
        .parquet(s"$outDir/nd_index")

    // 4. BPE merge table learned from the cleaned text
    val merges = Bpe.train(clean, "text", numMerges = nMerges)
    import spark.implicits._
    merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/bpe_merges")

    // 5. run report — aggregates over the PERSISTED enriched frame, no
    //    second input scan
    val stats = enriched.agg(count(lit(1)), count_distinct(col("fingerprint")))
      .collect().head
    val (nIn, nDistinctFp) = (stats.getLong(0), stats.getLong(1))
    val nClean = clean.count()
    val nDupDropped = nIn - nDistinctFp
    Seq((nIn, nClean, nDupDropped, merges.length.toLong, seqLen))
      .toDF("docs_in", "docs_clean", "exact_dups_dropped", "bpe_merges", "seq_len")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/report")
    clean.unpersist()
    enriched.unpersist()

    println(s"[clean-corpus] in=$nIn clean=$nClean dups=$nDupDropped " +
      s"merges=${merges.length} out=$outDir")
    spark.stop()
  }
}
