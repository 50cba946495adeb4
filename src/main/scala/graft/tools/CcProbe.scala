package graft.tools

import graft.operators.Dedup
import graft.queries.Tables
import org.apache.spark.sql.SparkSession

/** Stage-cost probe for the ngram-pair → connected-components chain —
  * the `dedup_components` / `dedup_keep_best` cost structure at scale.
  * Times the pair kernel and the label closure separately (the bench
  * rows blend them), prints the closure's round count, and with
  * GRAFT_CC_DEBUG=1 the per-round wall-clock from
  * [[Dedup.connectedComponentsWithStats]].
  *
  * Usage: CcProbe <sfDir> [shufflePartitions]
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val shuffle = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cc-probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = Tables(spark, sfDir, "documents")
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text",
      n = 3, threshold = 0.5, maxDocFreq = 100)
    val materialized = time("ngram pairs (cold)") {
      val p = pairs.persist()
      println(s"[cc-probe] pair rows: ${p.count()}")
      p
    }
    val (labels, stats) = time("cc closure") {
      val (l, s) = Dedup.connectedComponentsWithStats(materialized)
      println(s"[cc-probe] labeled nodes: ${l.count()}")
      (l, s)
    }
    println(s"[cc-probe] rounds=${stats.iterations} converged=${stats.converged}")
    val comp = labels.groupBy("label").count()
    val top = comp.orderBy(org.apache.spark.sql.functions.desc("count")).head(3)
    println(s"[cc-probe] components=${comp.count()} largest=${top.map(_.getLong(1)).mkString(",")}")
    spark.stop()
  }
}
