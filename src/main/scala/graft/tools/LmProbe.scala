package graft.tools

import graft.operators.{LanguageModel, Par}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-cost probe for the n-gram LM scoring path ([[LanguageModel
  * .scoreMeanLikelihood]]) — locates where scoring wall-clock goes
  * (transition explode vs model joins vs the per-doc agg) before
  * optimizing, the way [[Probe]] did for the sessionize path. Loads the
  * persisted model artifact if present (the bench-measured shape);
  * trains one otherwise.
  *
  * Usage: LmProbe <sfDir> [artifactDir]
  */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.Tables(spark, sfDir, "documents")
      .select("doc_id", "text")
    val model =
      if (args.length > 1) LanguageModel.load(spark, args(1))
      else LanguageModel.train(docs, "text")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[lm-probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (n=$n)")
    }
    // warmup
    LanguageModel.scoreMeanLikelihood(docs, "doc_id", "text", model).count()
    val toks = split(col("text"), " ")
    time("tokenize+explode")(
      Par.widen(docs).select(col("doc_id"), explode(toks).as("t")).count())
    // both formulations, so the probe keeps measuring the kernel's win
    // over the interpreted-lambda HOF chain it replaced
    // size guard matches the replaced production chain: a <2-token doc
    // yields NO transitions (sequence(1,0) would otherwise step DOWN to
    // [1,0] and element_at(toks, 0) throws INVALID_INDEX_OF_ZERO)
    val trHof = Par.widen(docs).select(col("doc_id"),
        explode(when(size(toks) >= 2,
          transform(sequence(lit(1), size(toks) - 1),
            i => struct(element_at(toks, i).as("prev"),
              element_at(toks, i + 1).as("cur"))))).as("bg"))
      .select(col("doc_id"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
    time("transitions HOF (old)")(trHof.count())
    val tr = Par.widen(docs).select(col("doc_id"),
        explode(graft.functions.TextExpressions.ngramTransitions(toks, 2)).as("bg"))
      .select(col("doc_id"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
    time("transitions kernel")(tr.count())
    time("transitions+joins") {
      tr.join(model.bigrams, Seq("prev", "cur"), "left")
        .join(model.contexts, Seq("prev"), "left").count()
    }
    for (i <- 1 to 3)
      time(s"full score #$i")(
        LanguageModel.scoreMeanLikelihood(docs, "doc_id", "text", model).count())
    spark.stop()
  }
}
