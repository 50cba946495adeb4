package graft.tools

import graft.operators.{CacheRegistry, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Parameter-sweep probe for the embedding-dedup candidate geometries:
  * recall vs the exact all-pairs twin, candidate-stage pair volume, and
  * wall time, per (scheme, params) — the measurement loop behind the
  * `dedup_embedding_*` query tuning. Diagnostic CLI, not a registered
  * query (the driver-facing floors live in `dedup_embedding_recall`).
  *
  * Usage: RecallProbe <sfDir> [threshold]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val threshold = if (args.length > 1) args(1).toDouble else 0.4
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-recall-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorExpressions.vecDot

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"),
      Similarity.vecNorm(col("embedding")).as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
      Similarity.vecNorm(col("embedding")).as("nb"))
    val exact = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("sim", vecDot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[probe] sf=$sfDir n=${e.count()} exact_pairs=${exact.size}")

    def measure(label: String)(run: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val got = run.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val secs = (System.nanoTime() - t0) / 1e9
      CacheRegistry.releaseAll()
      val hit = exact.count(got.contains)
      val recall = if (exact.isEmpty) 1.0 else hit.toDouble / exact.size
      println(f"[probe] $label%-40s pairs=${got.size}%6d recall=$recall%.3f time=$secs%6.2fs")
    }

    val t0 = System.nanoTime()
    val trained = Similarity.trainCentroids(e,
      Similarity.autoNlist(e.count()), trainIters = 2)
    println(f"[probe] trainCentroids nlist=${trained._2.length} " +
      f"time=${(System.nanoTime() - t0) / 1e9}%6.2fs")
    for (p <- Seq(2, 3, 4, 6); mc <- Seq(256)) {
      measure(s"cells probe=$p maxCell=$mc pretrained") {
        Similarity.cosineDedupCells(e, threshold, maxCell = mc, probeCells = p,
          pretrained = Some(trained))
      }
    }
    measure("lsh 16x4 maxBucket=256 (current)") {
      Similarity.cosineDedup(e, threshold, tables = 16, bitsPerTable = 4,
        maxBucket = 256)
    }

    // -- ANN recall@5 sweep: brute-force truth over the first 10 ids --
    val q = e.filter(col("vec_id") < 10)
    val truth = Similarity.bruteForceTopK(q, e, 5)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    CacheRegistry.releaseAll()
    def annMeasure(label: String)(run: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val got = run.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val secs = (System.nanoTime() - t0) / 1e9
      CacheRegistry.releaseAll()
      val recall = if (truth.isEmpty) 1.0
        else truth.count(got.contains).toDouble / truth.size
      println(f"[probe] ann $label%-36s recall@5=$recall%.3f time=$secs%6.2fs")
    }
    // probes pinned to 1: this row demonstrates the HISTORICAL fixed
    // exact-bucket geometry's decay (lshTopK's default is AUTO since r16)
    annMeasure("lsh 16x3 (historical fixed)") {
      Similarity.lshTopK(q, e, 5, tables = 16, bitsPerTable = 3, probes = 1)
    }
    val bitsList = sys.env.get("PROBE_BITS").map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(0))
    val tablesList = sys.env.get("PROBE_TABLES").map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(16, 24))
    val probesList = sys.env.get("PROBE_PROBES").map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(4, 8, 16))
    for (bits <- bitsList; t <- tablesList; pr <- probesList) {
      annMeasure(s"lsh bits=$bits tables=$t probes=$pr") {
        Similarity.lshTopK(q, e, 5, tables = t, bitsPerTable = bits, probes = pr)
      }
    }
    spark.stop()
  }
}
