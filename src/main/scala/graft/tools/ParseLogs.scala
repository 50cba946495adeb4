package graft.tools

import graft.operators.Sessionize
import org.apache.spark.sql.SparkSession

/** CLI batch replay — the engine's equivalent of the reference's
  * `cat /var/log/mail.log* | parse.py` entry point (parse.py:508-520,
  * README.md:4): read syslog text files, sessionize, write the `events`
  * analytic table (parquet, time-ordered) plus a fault side-channel.
  *
  * Usage: ParseLogs <logPathGlob> <outDir> [master]
  */
object ParseLogs {
  def main(args: Array[String]): Unit = {
    val input = args(0)
    val outDir = args(1)
    val master = if (args.length > 2) args(2) else "local[*]"
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft-parse-logs")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val res = Sessionize.fromTextFiles(spark, input)
    graft.sources.EventsTable.write(res.events, s"$outDir/events")
    res.faults.write.mode("overwrite").parquet(s"$outDir/faults")

    val n = spark.read.parquet(s"$outDir/events").count()
    val f = spark.read.parquet(s"$outDir/faults").count()
    println(s"[parse-logs] events=$n faults=$f out=$outDir")
    spark.stop()
  }
}
