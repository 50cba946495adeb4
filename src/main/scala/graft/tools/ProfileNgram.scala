package graft.tools

import graft.operators.{CacheRegistry, Dedup, Par}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sub-stage wall-clock breakdown of the packed inverted-index pair
  * kernel (optimization-round measurement tool). Stages are rebuilt
  * standalone (no persists) so each number is the raw compute of that
  * prefix; diffs between prefixes attribute the increments. */
object ProfileNgram {
  private def time(spark: SparkSession, label: String)(f: => DataFrame): Double = {
    spark.sparkContext.setJobDescription(label)
    val t0 = System.nanoTime()
    f.write.format("noop").mode("overwrite").save()
    val secs = (System.nanoTime() - t0) / 1e9
    CacheRegistry.releaseAll()
    println(f"[profile] $label%-28s $secs%7.3f s")
    spark.sparkContext.setJobDescription(null)
    secs
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (sp, _, _) = graft.Bench.deriveShufflePartitions(sfDir, cpus.toInt)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sp.toLong)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val docs = graft.queries.Tables(spark, sfDir, "documents")
      .select("doc_id", "text")

    def grams = Par.widen(docs).select(col("doc_id"),
      Dedup.shingleHashes(col("text"), 3).as("grams"))
      .filter(size(col("grams")) > 0)
    def inverted = grams.select(col("doc_id"),
      size(col("grams")).as("n_grams"), explode(col("grams")).as("g"))
    def hot = inverted.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") > 100).select("g")
    def capped = inverted.join(broadcast(hot), Seq("g"), "left_anti")
      .select(col("g"), shiftleft(col("doc_id"), 32)
        .bitwiseOR(col("n_grams").cast("long")).as("sn"))
    val lo32 = 0xFFFFFFFFL
    def su(c: org.apache.spark.sql.Column) =
      call_function("shiftright", c, lit(32)).bitwiseAND(lo32)
    def pairsAgg = {
      val c = capped
      val nx = col("x.sn").bitwiseAND(lo32)
      val ny = col("y.sn").bitwiseAND(lo32)
      c.as("x").hint("shuffle_hash").join(c.as("y"), col("x.g") === col("y.g"))
        .filter(su(col("x.sn")) < su(col("y.sn")) &&
          least(nx, ny).cast("double") >= lit(0.5) * greatest(nx, ny))
        .groupBy(shiftleft(su(col("x.sn")), 32).bitwiseOR(su(col("y.sn"))).as("p"))
        .agg(count(lit(1)).as("shared"))
    }
    val reps = sys.env.getOrElse("GRAFT_PROFILE_REPS", "5").toInt
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
    def rec(l: String)(f: => DataFrame): Unit =
      acc(l) = time(spark, l)(f) :: acc.getOrElse(l, Nil)
    for (r <- 1 to reps) {
      println(s"--- rep $r ---")
      rec("p1:grams")(grams)
      rec("p2:inverted")(inverted)
      rec("p3:hotgrams")(hot)
      rec("p4:capped")(capped)
      rec("p5:pairs+agg")(pairsAgg)
      rec("p6:full")(Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5, 100))
    }
    println("=== mins ===")
    acc.toSeq.sortBy(_._1).foreach { case (l, ts) =>
      println(f"[min] $l%-28s ${ts.min}%7.3f s  (med ${ts.sorted.apply(ts.size / 2)}%7.3f)")
    }
    spark.stop()
  }
}
