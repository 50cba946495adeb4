package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // `--analyze-only`: construct every registered query against sfDir —
    // DataFrame construction runs Catalyst analysis eagerly, so this
    // catches schema/encoding breaks (the round-10 events TIMESTAMP_NTZ
    // regression failed exactly here) in seconds, with no oracle and no
    // execution. Exits non-zero on any failure.
    val analyzeOnly = args.contains("--analyze-only")
    val rest = args.filterNot(_ == "--analyze-only")
    val sfDir = rest(0)
    val outDir = if (rest.length > 1) rest(1) else "/tmp/graft-verify"
    // optional 3rd arg: comma-separated query-name filter (local iteration).
    // Unknown names fail LOUDLY: a misspelled (or bracket-wrapped) name
    // would otherwise silently run zero/partial queries with exit 0, and a
    // builder could believe a query re-verified when it never ran.
    val only: Option[Set[String]] =
      if (rest.length > 2) Some(rest(2).split(",").toSet) else None
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      if (unknown.nonEmpty) {
        System.err.println("[verify] unknown query name(s) in filter: " +
          unknown.toSeq.sorted.mkString(", ") +
          " — pass a bare comma-separated list of SparkEntry.queries keys")
        sys.exit(3)
      }
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // width ∝ input bytes like Bench (64 MB/partition, floor = cores),
    // so a Verify run against a scaled corpus gets a scaled shuffle too
    val (shufflePartitions, _, _) =
      Bench.deriveShufflePartitions(sfDir, cpus.toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toLong)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // codec is a fixed lz4 default; SPARK_GRAFT_IO_CODEC overrides it
      // per-run (see Bench.ioCodec's scaladoc for the measured rationale)
      .config("spark.io.compression.codec", Bench.ioCodec())
      // single-JVM local mode: outlast GC stalls, never self-remove the
      // only executor (see Bench)
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Stale-dump guard: stamp the RUN START into the out-dir so
    // scripts/oracle_check.py can warn about query dumps that predate
    // this run (leftovers from an older HEAD in a reused out-dir — the
    // r20 judge's first pass "failed" 4 queries on exactly that).
    // Written before any dump so every dump of THIS run is newer.
    if (!analyzeOnly) {
      val head = try {
        val p = new ProcessBuilder("git", "rev-parse", "HEAD")
          .redirectErrorStream(true).start()
        val out = new String(p.getInputStream.readAllBytes()).trim
        if (p.waitFor() == 0) out else "unknown"
      } catch { case _: Throwable => "unknown" }
      // the run's query filter rides along so oracle_check can scope the
      // stale warning to queries THIS run actually (re-)dumped — after a
      // filtered run every other dump is legitimately older than the
      // manifest, and warning on all of them trained users to ignore
      // the guard (r21 advice)
      val filterJson = only.fold("null")(
        _.toSeq.sorted.mkString("[\"", "\",\"", "\"]"))
      Files.writeString(Paths.get(s"$outDir/_manifest.json"),
        s"""{"git_head":"$head","started_utc":"${java.time.Instant.now()}","filter":$filterJson}""")
    }
    if (analyzeOnly) {
      val failures = SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .flatMap { case (name, fn) =>
          val r = try { fn(spark, sfDir).schema; None } catch {
            case e: Throwable =>
              System.err.println(s"[verify] ANALYZE FAIL $name: ${e.getMessage}")
              Some(name)
          }
          graft.operators.CacheRegistry.releaseAll()
          r
        }
      println(s"[verify] analyze-only: ${failures.length} failures" +
        (if (failures.nonEmpty) failures.mkString(" (", ", ", ")") else ""))
      spark.stop()
      if (failures.nonEmpty) sys.exit(1) else return
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally graft.operators.CacheRegistry.releaseAll()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
