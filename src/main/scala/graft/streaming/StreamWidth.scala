package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming shuffle/state width sized to the MICRO-BATCH, not the core
  * count — the default the r18 ladder measurements demand.
  *
  * Why: the HDFS-backed streaming state store pays ~400 ms of commit
  * file ops PER PARTITION PER BATCH (`target/stream_ladder_r18.txt`:
  * stateCommit summed over partitions at 20 batches — 12.9 s at w32 vs
  * 0.12 s at w4, identical outputs), so the state/shuffle width that
  * minimizes wall clock is bounded by the micro-batch's row count, not
  * by how many cores the box has. The measured knees: 500k-row batches
  * knee at width 4, 1M-row at 8, and 10M-row batches STILL knee at 8
  * (38.8 s vs 44.3 s at w32) — past the knee the per-partition commit
  * cost eats the extra parallelism. On a real cluster the same rule
  * holds per-executor-group; RocksDB narrows but does not remove the
  * per-partition commit cost (instance open + changelog per partition).
  *
  * Resolution order (CLI contract): explicit
  * `SPARK_GRAFT_SHUFFLE_PARTITIONS` env always wins; else the width is
  * DERIVED from an estimate of rows per trigger; else a conservative
  * fallback of 8 (the measured knee for every batch size ≥ 1M rows).
  *
  * `spark.sql.shuffle.partitions` is runtime-settable, and a stateful
  * query pins its state partition count from it at FIRST start (new
  * checkpoint) — so [[apply]] sets it on the live session before the
  * query starts and records the decision on stdout, in
  * `<outDir>/width.json` (truncate semantics — the authoritative
  * consumer artifact), and as a `"graft":"stream_width"` record
  * appended to `<outDir>/progress.jsonl` (scan for the record; its
  * position is not guaranteed on re-runs). */
object StreamWidth {

  /** The measured knee as a pure function of batch rows:
    * clamp(ceil(rows / 125k), 4, 8). Reproduces every r18 sweep
    * optimum: 500k → 4, 1M → 8, 10M → 8 (capped). */
  def derive(estRowsPerTrigger: Long): Int =
    math.min(8L, math.max(4L,
      (math.max(estRowsPerTrigger, 1L) + 125000L - 1L) / 125000L)).toInt

  /** @param width  the width to set
    * @param source "env" | "env-cpus" | "derived" | "fallback"
    * @param estRowsPerTrigger the estimate the derivation saw (-1 = none) */
  final case class Resolved(width: Int, source: String, estRowsPerTrigger: Long)

  /** env override → legacy `SPARK_GRAFT_CPUS` override →
    * derived-from-batch → measured-knee fallback (8).
    *
    * `SPARK_GRAFT_CPUS` set shuffle width in every streaming CLI before
    * the derived default existed; scripts that pin it must keep getting
    * the width they pinned (one env contract across ALL CLIs), so it
    * stays honored as a secondary override — with a stdout note, since
    * the derived width is usually the better choice. */
  def resolve(estRowsPerTrigger: Option[Long],
              env: Map[String, String] = sys.env): Resolved =
    env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS").flatMap { v =>
      // same graceful contract as the legacy SPARK_GRAFT_CPUS arm: a
      // non-numeric value cannot name a width, so it falls through to
      // the derived default (with a note) instead of crashing the CLI
      val n = v.toIntOption
      if (n.isEmpty) println(
        s"[stream-width] note: ignoring non-numeric SPARK_GRAFT_SHUFFLE_PARTITIONS='$v'")
      n
    } match {
      case Some(v) =>
        Resolved(v, "env", estRowsPerTrigger.getOrElse(-1L))
      case None => env.get("SPARK_GRAFT_CPUS")
          // the batch CLIs interpolate this into `local[...]`, where
          // non-numeric values like "*" are legal — those cannot name a
          // width, so they fall through to the derived default instead
          // of crashing the streaming CLIs at startup
          .flatMap(_.toIntOption) match {
        case Some(v) =>
          Resolved(v, "env-cpus", estRowsPerTrigger.getOrElse(-1L))
        case None => estRowsPerTrigger match {
          case Some(n) => Resolved(derive(n), "derived", n)
          case None    => Resolved(8, "fallback", -1L)
        }
      }
    }

  /** How many file heads [[estimateTextDir]] samples. */
  val TextSampleFiles = 8

  /** Estimate rows per trigger for a TEXT directory stream: total bytes
    * of the data files present over a sampled average line length (the
    * first 64 KiB of each of the [[TextSampleFiles]] largest files,
    * newline counts pooled — one dominant file's line length no longer
    * speaks for a directory that mixes short-line and long-line files),
    * scaled by `maxFilesPerTrigger` when it bounds the batch.
    * Metadata-plus-bounded-head-reads only — no Spark job; a missing
    * or empty directory yields None (follow-mode cold start). */
  def estimateTextDir(dir: String,
                      maxFilesPerTrigger: Option[Int]): Option[Long] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val files = fs.listStatus(p).filter(_.isFile)
      .filterNot { s =>
        val n = s.getPath.getName; n.startsWith("_") || n.startsWith(".")
      }
      .filter(_.getLen > 0L)
    if (files.isEmpty) return None
    val totalBytes = files.map(_.getLen).sum
    var sampledBytes = 0L
    var sampledLines = 0L
    files.sortBy(-_.getLen).take(TextSampleFiles).foreach { st =>
      val sampleLen = math.min(st.getLen, 65536L).toInt
      val buf = new Array[Byte](sampleLen)
      val in = fs.open(st.getPath)
      try in.readFully(0L, buf) finally in.close()
      sampledBytes += sampleLen
      sampledLines += buf.count(_ == '\n')
    }
    val avgLine = if (sampledLines == 0) sampledBytes.toDouble
                  else sampledBytes.toDouble / sampledLines
    val totalRows = math.max((totalBytes / avgLine).toLong, 1L)
    Some(scalePerTrigger(totalRows, files.length, maxFilesPerTrigger))
  }

  /** Estimate rows per trigger for a PARQUET directory stream: exact
    * row count of the largest data file (footer metadata only — a
    * zero-column count job over one file), scaled to the directory by
    * relative bytes, then to the trigger by `maxFilesPerTrigger`.
    * One tiny job regardless of corpus size. */
  def estimateParquetDir(spark: SparkSession, dir: String,
                         maxFilesPerTrigger: Option[Int]): Option[Long] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val files = fs.listStatus(p).filter(_.isFile)
      .filter(_.getPath.getName.endsWith(".parquet")).filter(_.getLen > 0L)
    if (files.isEmpty) return None
    val totalBytes = files.map(_.getLen).sum
    val largest = files.maxBy(_.getLen)
    val largestRows = spark.read.parquet(largest.getPath.toString).count()
    val totalRows = math.max(
      (largestRows.toDouble * totalBytes / largest.getLen).toLong, 1L)
    Some(scalePerTrigger(totalRows, files.length, maxFilesPerTrigger))
  }

  private def scalePerTrigger(totalRows: Long, nFiles: Int,
                              maxFilesPerTrigger: Option[Int]): Long =
    maxFilesPerTrigger match {
      case Some(m) if m < nFiles =>
        math.max(totalRows * m / nFiles, 1L)
      case _ => totalRows
    }

  /** Resolve the width, set it on the live session (before the query
    * starts), and record the decision three ways: one stdout line,
    * `<outDir>/width.json` (TRUNCATED each run — the authoritative
    * consumer artifact: on a re-run over an existing outDir an appended
    * record would land mid-file behind prior progress rows, so
    * position-based readers would see a stale width), and a
    * `"graft":"stream_width"` record appended to
    * `<outDir>/progress.jsonl` so the ladder artifact stays
    * self-contained (consumers must scan for the record, not assume
    * line 1). */
  def apply(spark: SparkSession, label: String, outDir: String,
            estRowsPerTrigger: Option[Long]): Resolved = {
    val r = resolve(estRowsPerTrigger)
    spark.conf.set("spark.sql.shuffle.partitions", r.width.toString)
    println(s"[$label] width=${r.width} source=${r.source} " +
      s"est_rows_per_trigger=${r.estRowsPerTrigger}")
    if (r.source == "env-cpus")
      println(s"[$label] note: width pinned by legacy SPARK_GRAFT_CPUS; " +
        "unset it (or set SPARK_GRAFT_SHUFFLE_PARTITIONS) to use the " +
        "micro-batch-derived width")
    val record =
      s"""{"graft":"stream_width","label":"$label","width":${r.width},""" +
        s""""source":"${r.source}","est_rows_per_trigger":${r.estRowsPerTrigger}}"""
    val widthPath = java.nio.file.Paths.get(outDir, "width.json")
    java.nio.file.Files.createDirectories(widthPath.getParent)
    java.nio.file.Files.writeString(widthPath, record + "\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outDir, "progress.jsonl"), record + "\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    r
  }
}
