package graft.tools

import graft.operators.Sessionize
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-cost probe for the batch sessionize path: times classify,
  * classify+shuffle+fold, and the full events pipeline (with and without
  * intermediate persistence) over a replayed log, after a JIT warmup
  * pass. Used to locate where wall-clock goes before optimizing (it
  * motivated the single-pass dovecot enrichment: caching the wide fold
  * rows measured SLOWER than recomputing the chain).
  *
  * Usage: Probe <logFile> [repeat]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val repeat = if (args.length > 1) args(1).toInt else 20
    val lines = scala.io.Source.fromFile(path).getLines().toArray
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val repeated = (0 until repeat).flatMap(k =>
      lines.iterator.zipWithIndex.map { case (l, i) => (k.toLong * 10000000L + i, l) })
    val ds = spark.createDataset(repeated).repartition(32)
    ds.cache().count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (n=$n)")
    }
    // JIT warmup
    Sessionize(spark, ds).events.count()
    time("classify.count")(Sessionize.classify(spark, ds).count())
    val cls = Sessionize.classify(spark, ds)
    time("classify+shuffle+fold") {
      cls.where($"kind" === 0)
        .repartition($"queueId")
        .sortWithinPartitions($"queueId", $"seq")
        .as[Sessionize.ClassifiedRow]
        .mapPartitions(Sessionize.foldRuns _)
        .count()
    }
    time("full events.count")(Sessionize(spark, ds).events.count())
    time("full events.count (persist)")(
      Sessionize(spark, ds, persistIntermediate = true).events.count())
    time("full, folded-only persist") {
      val classified = Sessionize.classify(spark, ds)
      val folded = classified.where($"kind" === 0)
        .repartition($"queueId")
        .sortWithinPartitions($"queueId", $"seq")
        .as[Sessionize.ClassifiedRow]
        .mapPartitions(Sessionize.foldRuns _)
        .persist()
      val doveActs = classified.where($"kind" === 1)
        .select($"msgid".as("d_msgid"), $"seq".as("d_seq"), $"action")
      val matched = folded.where($"event".isNotNull)
        .select($"emitSeq", explode($"intervals").as("iv"))
        .join(doveActs, $"iv.msgid" === $"d_msgid" &&
          $"d_seq" > $"iv.fromSeq" && $"d_seq" <= $"iv.toSeq")
        .groupBy($"emitSeq")
        .agg(max_by($"action", $"d_seq").as("dovecot_action"))
      val n = folded.where($"event".isNotNull)
        .select($"event", $"emitSeq")
        .join(matched, Seq("emitSeq"), "left_outer")
        .select($"event".withField("dovecot_fileinto_action",
          coalesce($"dovecot_action", $"event.dovecot_fileinto_action")).as("event"))
        .select("event.*")
        .count()
      folded.unpersist(false)
      n
    }
    spark.stop()
  }
}
