package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B measurement of the probed-cell scan pushdown
  * ([[Similarity.ivfTopKPrepared]] `pruneCells`) on a persisted,
  * cent_id-clustered IVF store at a production-shaped cell count:
  * builds the store once (nlist cells, files repartitioned AND sorted
  * by cell — the [[graft.streaming.StreamingAnalytics
  * .compactVectorIndex]] layout), then times the serve query with and
  * without the pushdown. Results are asserted bit-identical — the
  * filter is semantically a no-op; only scan bytes move.
  *
  * Usage: CellPruneProbe <sfDir> [nlist] [nprobe]
  */
object CellPruneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nlist = if (args.length > 1) args(1).toInt else 256
    val nprobe = if (args.length > 2) args(2).toInt else 16
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-cell-prune-probe")
      .config("spark.sql.shuffle.partitions",
        math.max(32, graft.Bench.inputBytes(sfDir) / (64L << 20)).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 10)
    val store = java.nio.file.Files.createTempDirectory("cell_prune").toString
    val t0 = System.nanoTime()
    val quant = Similarity.trainCentroids(e, nlist, trainIters = 2)
    Similarity.ivfPrepare(e, quant)
      .repartition(64, col("cent_id")).sortWithinPartitions("cent_id")
      .write.parquet(s"$store/lists")
    println(f"[cell-prune] built nlist=$nlist store in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    val lists = spark.read.parquet(s"$store/lists")

    def rows(df: DataFrame): Seq[String] =
      df.select("query_id", "cand_id", "sim", "rank").collect()
        .map(_.mkString(",")).sorted.toSeq
    var base: Seq[String] = null
    for (prune <- Seq(false, true, false, true)) {
      val t1 = System.nanoTime()
      val r = rows(Similarity.ivfTopKPrepared(lists, q, k = 5, quant,
        nprobe = nprobe, pruneCells = prune))
      val w = (System.nanoTime() - t1) / 1e9
      if (base == null) base = r
      println(f"[cell-prune] prune=$prune wall=$w%.1fs rows=${r.length} " +
        s"identical=${r == base}")
    }
    // show the pushdown actually reached the scan
    val pruned = Similarity.ivfTopKPrepared(lists, q, k = 5, quant,
      nprobe = nprobe, pruneCells = true)
    val plan = pruned.queryExecution.executedPlan.toString
    println("[cell-prune] PushedFilters present: " +
      plan.contains("PushedFilters: [In(cent_id"))
    spark.stop()
  }
}
