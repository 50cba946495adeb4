package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark.
  *
  * Prints ONE final JSON line — total seconds, the per-query median map
  * (name → sec), query count, load before/after, and the path of the full
  * artifact — and writes the full detail (every individual run + warmup
  * runs + per-run system load) to `target/bench.json`. The line is ~4 KB
  * for 123 queries, well inside tail-capture windows, and (with
  * `Compile / run / outputStrategy := StdoutOutput` in build.sbt) reaches
  * stdout raw, without sbt's "[info] " logger prefix.
  *
  * Contention handling — two independent re-measure triggers:
  *   1. in-process: median > 3× the fastest run this process has seen for
  *      the query (a transient spike inside the sweep);
  *   2. cross-artifact: median > 2× the query's median in the previous
  *      COMMITTED artifact (default `BENCHFULL.json`, override with
  *      SPARK_GRAFT_BENCH_PREV) and at least 0.25 s above it — catches
  *      contention *sustained* across all runs, which trigger 1 cannot see
  *      (round 9: the whole corpus_* family inflated 3-8× for the driver's
  *      entire window).
  * When either fires the query is re-measured once and the RE-MEASURED
  * median is kept unconditionally (not min-of-medians, which would bias
  * the artifact downward); the first median and the trigger reason are
  * recorded under "remeasure_detail" so the raw data stays auditable.
  * System load is sampled after every individual run ("loads_run") as well
  * as before/after the sweep.
  *
  * Failure handling: a query that throws is NOT timed — it is listed in
  * "failed" (+ first-line message in "failed_detail"), excluded from the
  * total and the per-query map, and the process exits 2 after printing the
  * artifact, so a broken query can never masquerade as a fast one (round
  * 10: 13 analysis-time failures benched as plausible small times).
  */
object Bench {
  private def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)

  /** Total bytes of data files under a scale dir (recursive; skips
    * _SUCCESS/.crc bookkeeping). Used to derive shuffle width. */
  def inputBytes(sfDir: String): Long = {
    val root = java.nio.file.Paths.get(sfDir)
    if (!java.nio.file.Files.isDirectory(root)) 0L
    else {
      val s = java.nio.file.Files.walk(root)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .filter(p => { val n = p.getFileName.toString
          !n.startsWith("_") && !n.startsWith(".") })
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
  }

  /** Shuffle width for a corpus: one partition per ~64 MB of input,
    * floored at the core count. This is how a real cluster is
    * provisioned — width tracks DATA, not the machine — and it is what
    * the r13 sf100 probe measured by hand (23 GB → 320p restored the
    * join/union families to ~linear; this rule derives 368 for the same
    * corpus). SPARK_GRAFT_SHUFFLE_PARTITIONS overrides; the artifact
    * records which path was taken. Parsed with toInt so a bad value
    * fails fast instead of silently mis-configuring the session AND
    * corrupting the JSON artifact. */
  def deriveShufflePartitions(sfDir: String, cpus: Int): (Int, Boolean, Long) =
    sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS") match {
      case Some(v) => (v.toInt, false, inputBytes(sfDir))
      case None =>
        val bytes = inputBytes(sfDir)
        val derived = math.max(cpus.toLong, bytes / (64L << 20)).toInt
        (derived, true, bytes)
    }

  /** Shuffle/broadcast/spill codec. Default lz4 (Spark's default);
    * SPARK_GRAFT_IO_CODEC overrides for A/B probes. Round 16 TRIED
    * promoting zstd to the default above 1 GiB of input (r15's focused
    * A/B had measured the sf100 ngram exchange 275→227 s) and the
    * session-wide default measured WORSE and then broke: ngram 352 s
    * (runs=2, quiet) and dedup_components a DETERMINISTIC
    * SparkOutOfMemoryError at the same closure stage across two fresh
    * JVMs, while the identical run under SPARK_GRAFT_IO_CODEC=lz4
    * passes at 304 s (bench_r16_sf100_{ngram_joint,components,
    * components_lz4}.json). The session default compresses broadcast
    * and checkpoint streams too, not just the one spill-bound exchange
    * the A/B isolated — codec choice stays a per-run knob, not a
    * default. */
  def ioCodec(): String =
    sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "lz4")

  private def loadPrevMedians(path: String): Map[String, Double] =
    try {
      val p = java.nio.file.Paths.get(path)
      if (!java.nio.file.Files.exists(p)) Map.empty
      else {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val q = om.readTree(java.nio.file.Files.readString(p)).get("queries")
        if (q == null) Map.empty
        else {
          val b = Map.newBuilder[String, Double]
          val it = q.fieldNames()
          while (it.hasNext) { val k = it.next(); b += k -> q.get(k).asDouble() }
          b.result()
        }
      }
    } catch { case _: Throwable => Map.empty }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadBefore = osBean.getSystemLoadAverage
    // Previous committed artifact: per-query medians from the last quiet,
    // committed bench run — the reference point for sustained-contention
    // detection (trigger 2).
    val prevPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_PREV", "BENCHFULL.json")
    val prevMedians = loadPrevMedians(prevPath)
    // Shuffle width tracks DATA SIZE while local[N] stays fixed — the
    // knob a real cluster would turn first. Derived from input bytes by
    // default (≈64 MB/partition, floored at core count) so every ladder
    // rung is apples-to-apples without operator care;
    // SPARK_GRAFT_SHUFFLE_PARTITIONS overrides for probes.
    val (shufflePartitions, widthDerived, inputBytesTotal) =
      deriveShufflePartitions(sfDir, cpus.toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toLong)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // lz4 unless SPARK_GRAFT_IO_CODEC overrides — see ioCodec for why
      // the zstd-by-default experiment was reverted
      .config("spark.io.compression.codec", ioCodec())
      // local mode: executor and driver share one JVM, so the heartbeat
      // is a formality — but a long GC/CPU-saturation stall (observed
      // 175 s during a 100×-rows sweep) can exceed the 120 s default
      // and HeartbeatReceiver then REMOVES the only executor, killing
      // the context and every remaining query. A cluster wants the
      // default; a single-JVM bench wants to outlast its worst stall.
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/session so the first query doesn't pay executor spin-up
    spark.range(1000000).selectExpr("sum(id)").collect()

    // *_violations / *_recall rows are correctness diagnostics (empty-set
    // and retrieval-quality proofs for the LSH family), not operators —
    // excluded so the headline total stays comparable across rounds and
    // against BASELINE.md. *_planted rows are the same class: derived-
    // corpus fixture twins that give a stage's oracle a FIRING path the
    // span-clean synthetic corpora can't (corpus_curate_substring_planted
    // re-runs the whole curate+substring pipeline its unplanted sibling
    // already prices — benching it would double-count ~8 s of identical
    // work).
    // SPARK_GRAFT_BENCH_ONLY: comma-separated name filter (local iteration)
    // SPARK_GRAFT_BENCH_EXCLUDE: comma-separated names to drop — scale-probe
    // runs (ScaleUp corpora, sf1+) use it for the exact all-pairs oracle
    // twins (dedup_embedding_exact/_twins, dedup_incremental_exact), which
    // are quadratic BY CONSTRUCTION (they exist to gate the banded
    // approximate paths) and would otherwise dominate a 10×+ corpus total
    // the production paths never pay. Excluded names are recorded in the
    // artifact ("excluded") so a reader can see the total's denominator.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val excluded = sys.env.get("SPARK_GRAFT_BENCH_EXCLUDE")
      .map(_.split(",").toSet).getOrElse(Set.empty)
    val queries = SparkEntry.headlineQueries
      .filterNot(n => excluded.contains(n._1))
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // SPARK_GRAFT_BENCH_VERBOSE: per-run times to stderr (regression
    // triage — the median hides cold-fill vs steady-state structure)
    val verbose = sys.env.contains("SPARK_GRAFT_BENCH_VERBOSE")
    // Untimed warmup runs per query (default 1, 0 restores the old
    // behavior): run 1 is consistently 2-4× steady state (JIT + parquet
    // footer/codegen caches); steady state is what the bench compares.
    val warmup = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1").toInt

    case class QResult(name: String, median: Double, timed: Seq[Double],
                       cold: Seq[Double], loads: Seq[Double],
                       remeasured: Option[(Double, String)],
                       error: Option[String])
    val results = queries.map { case (name, fn) =>
      val loadSamples = scala.collection.mutable.ArrayBuffer.empty[Double]
      // A throwing query must NOT bench as a plausible fast time (round 10:
      // 13 analysis-time failures silently absorbed into the total). The
      // first failure aborts the query's sweep; it is reported in
      // "failed"/"failed_detail" and excluded from the total.
      var error: Option[String] = None
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable => if (error.isEmpty) error = Some(
            s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(200)}")
        }
        finally graft.operators.CacheRegistry.releaseAll()
        val secs = (System.nanoTime() - t0) / 1e9
        loadSamples += osBean.getSystemLoadAverage
        secs
      }
      def median(ts: Seq[Double]): Double = { val s = ts.sorted; s(s.length / 2) }
      def sweep(n: Int): Seq[Double] =
        (1 to n).iterator.takeWhile(_ => error.isEmpty).map(_ => once()).toSeq
      val cold = sweep(warmup)
      val raw = sweep(runs)
      if (error.isDefined) {
        System.err.println(s"[bench] $name FAILED: ${error.get}")
        QResult(name, Double.NaN, Nil, Nil, loadSamples.toSeq, None, error)
      } else {
      val firstMed = median(raw)
      val best = (cold ++ raw).min
      val trigger: Option[String] =
        if (runs < 2) None
        else if (firstMed > 3 * best) Some("median_gt_3x_best")
        else prevMedians.get(name) match {
          case Some(p) if firstMed > 2 * p && firstMed - p > 0.25 =>
            Some(s"median_gt_2x_prev(${fmt(p)})")
          case _ => None
        }
      val (timed, med, re) = trigger match {
        case Some(reason) =>
          val again = sweep(runs)
          // keep the re-measured median unconditionally — min() of the two
          // could only ever lower the number, a one-sided bias
          if (error.isDefined) {
            // the PRIMARY sweep succeeded; a failure during the
            // re-measure must not discard its valid timings (that would
            // exit 2 for a query that benched cleanly once). Keep the
            // primary median and surface the re-measure failure in the
            // remeasured annotation for the audit trail.
            val msg = error.get
            error = None
            System.err.println(
              s"[bench] $name re-measure failed ($msg); keeping primary sweep")
            (raw, firstMed, Some((firstMed, s"$reason;remeasure_failed:$msg")))
          }
          else (raw ++ again, median(again), Some((firstMed, reason)))
        case None => (raw, firstMed, None)
      }
      if (verbose) System.err.println(
        s"[bench] $name: ${timed.map(fmt).mkString(" ")}" +
          (if (cold.nonEmpty) cold.map(fmt).mkString(" (warmup ", " ", ")") else ""))
      QResult(name, med, timed, cold, loadSamples.toSeq, re, None)
      }
    }
    val (failed, ok) = results.partition(_.error.isDefined)
    val total = ok.map(_.median).sum
    val loadAfter = osBean.getSystemLoadAverage
    def jarr(ts: Seq[Double]) = ts.map(fmt).mkString("[", ",", "]")
    val qs = ok.map(r => "\"" + r.name + "\":" + fmt(r.median)).mkString("{", ",", "}")
    val runsDetail = ok.map(r => "\"" + r.name + "\":" + jarr(r.timed)).mkString("{", ",", "}")
    val warmDetail = ok.map(r => "\"" + r.name + "\":" + jarr(r.cold)).mkString("{", ",", "}")
    val loadDetail = ok.map(r => "\"" + r.name + "\":" + jarr(r.loads)).mkString("{", ",", "}")
    val failedArr = failed.map("\"" + _.name + "\"").mkString("[", ",", "]")
    def jstr(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val failedDetail = failed.map(r => "\"" + r.name + "\":" + jstr(r.error.get)).mkString("{", ",", "}")
    val remeasured = results.filter(_.remeasured.isDefined).map("\"" + _.name + "\"").mkString("[", ",", "]")
    val remeasureDetail = results.flatMap(r => r.remeasured.map { case (first, reason) =>
      s""""${r.name}":{"first_median":${fmt(first)},"kept_median":${fmt(r.median)},"trigger":"$reason"}"""
    }).mkString("{", ",", "}")
    val meta = Seq(
      s""""excluded":${excluded.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")}""",
      s""""runs":$runs""",
      s""""warmup":$warmup""",
      s""""shuffle_partitions":$shufflePartitions""",
      s""""shuffle_partitions_derived":$widthDerived""",
      s""""input_bytes":$inputBytesTotal""",
      s""""io_codec":"${ioCodec()}"""",
      s""""load_before":${fmt(loadBefore)}""",
      s""""load_after":${fmt(loadAfter)}""",
      s""""prev_artifact":"$prevPath"""",
      s""""prev_queries_n":${prevMedians.size}""",
      s""""available_cpus":${Runtime.getRuntime.availableProcessors}""",
      s""""jvm":"${sys.props.getOrElse("java.version", "?")}"""",
      s""""spark":"${spark.version}"""").mkString(",")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json")
    val full =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"runs_sec":$runsDetail,"warmup_sec":$warmDetail,"loads_run":$loadDetail,"failed":$failedArr,"failed_n":${failed.length},"failed_detail":$failedDetail,"remeasured":$remeasured,"remeasure_detail":$remeasureDetail,"sf":"$sfDir",$meta}"""
    val out = java.nio.file.Paths.get(outPath)
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(out, full + "\n")
    // Final line: total + the per-query median map (~4 KB for 123 queries)
    // so the driver can verify per-query speedups and scaling without the
    // uncommitted target/bench.json (r21 judge item 1 — PERF had
    // n_common: 0 every round). Raw runs/warmups/loads stay file-only.
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"queries_n":${ok.length},"failed":$failedArr,"failed_n":${failed.length},"queries_file":"$outPath","remeasured":$remeasured,"sf":"$sfDir",$meta}"""
    println(line)
    spark.stop()
    // last stdout line of the process, AFTER Spark's shutdown chatter —
    // a tail capture that sees anything sees this
    println(line)
    // loud failure: the artifact above is complete (total covers only the
    // queries that ran), but a broken query must not exit 0
    if (failed.nonEmpty) sys.exit(2)
  }
}
