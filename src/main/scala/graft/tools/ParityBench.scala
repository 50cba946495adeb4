package graft.tools

import graft.core.{IncrementalSessionizer, ParseFault, PostfixEvent}
import graft.operators.Sessionize
import org.apache.spark.sql.SparkSession

/** Parity micro-benchmark (BASELINE.md): lines/s of
  *   (a) the single-node incremental mode (apples-to-apples with the
  *       reference's single-threaded Python loop), and
  *   (b) the Spark batch operator at local[32].
  * Input: a log file replayed `repeat` times.
  *
  * Usage: ParityBench <logFile> [repeat]
  */
object ParityBench {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val repeat = if (args.length > 1) args(1).toInt else 10
    val lines = scala.io.Source.fromFile(path).getLines().toArray
    val total = lines.length.toLong * repeat

    // (a) incremental single-thread
    var events = 0L
    var faults = 0L
    val inc = new IncrementalSessionizer(
      (_: PostfixEvent) => events += 1, (_: ParseFault) => faults += 1)
    // JIT warmup pass
    lines.foreach(inc.feedLine)
    val t0 = System.nanoTime()
    var r = 0
    while (r < repeat) {
      lines.foreach(inc.feedLine)
      r += 1
    }
    val incSec = (System.nanoTime() - t0) / 1e9
    println(f"[parity] incremental: ${total / incSec}%.0f lines/s " +
      f"($total lines in $incSec%.2f s; events=$events faults=$faults)")

    // (b) Spark batch
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val repeated = (0 until repeat).flatMap(k =>
      lines.iterator.zipWithIndex.map { case (l, i) =>
        // distinct queue-id space per repetition via a seq offset
        (k.toLong * 10000000L + i, l)
      })
    val ds = spark.createDataset(repeated).repartition(32)
    ds.cache().count()   // exclude input materialization from timing
    Sessionize(spark, ds).events.count() // JIT/codegen warmup, like (a)
    val t1 = System.nanoTime()
    val n = Sessionize(spark, ds).events.count()
    val sparkSec = (System.nanoTime() - t1) / 1e9
    println(f"[parity] spark-batch: ${total / sparkSec}%.0f lines/s " +
      f"($total lines in $sparkSec%.2f s; events=$n)")
    spark.stop()
  }
}
