package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the model-based document
  * filter of a CCNet-style training-data pipeline: train a smoothed
  * order-n LM (default bigram; any n ≥ 2 via the composite context key)
  * on the corpus (or a trusted reference corpus), score every
  * document by how well the model predicts its token transitions, and
  * gate or bucket on the score. Low-likelihood documents are boilerplate,
  * non-linguistic noise, or out-of-domain text.
  *
  * Two scores over the same model:
  *  - [[scoreMeanLikelihood]]: arithmetic mean of the per-transition
  *    smoothed probability, kept in IEEE `+,-,*,/` with per-transition
  *    fixed-point rounding so the per-document SUM is an exact integer —
  *    order-independent, map-side combinable, and bit-equal to the
  *    DuckDB oracle (same discipline as [[Relevance.bm25]]'s rational
  *    idf mode).
  *  - [[scorePerplexity]]: the textbook exp(−mean ln p) perplexity —
  *    log-based, so it is ScalaTest-verified against a local reference
  *    implementation rather than hash-gated (transcendental libm
  *    results are not bit-portable across engines).
  *
  * Scale shape (100 TB corpus): training is two map-side-combinable
  * groupBys over exploded transitions (bigram- and context-keyed) plus
  * one vocab-sized distinct count; the model is data-bounded (distinct
  * bigrams), not corpus-bounded. Scoring is a many-to-one fact-to-dim
  * join of transitions against the counts — broadcast when the model is
  * small, shuffle-hash with AQE skew handling otherwise (hot function
  * words are unique keys on the model side, so skew is one-sided and
  * AQE-splittable) — followed by an exact long-SUM re-agg per document.
  * Nothing holds a vocabulary or a document in driver memory except the
  * single vocab-size count.
  */
object LanguageModel {

  /** A trained bigram model: transition counts, context (previous-token)
    * counts, and the vocabulary size used for add-k smoothing. Both
    * frames persist via [[Artifacts]]-style parquet round-trips (plain
    * string/long columns). */
  final case class NgramLm(bigrams: DataFrame, contexts: DataFrame,
                           vocabSize: Long)

  /** Token transitions (context → next token) of a single-space-
    * tokenized text column as an array of (prev, cur) structs — built
    * inside the row, so extraction adds no shuffle. The context is the
    * n−1 preceding tokens re-joined on the tokenizer's separator:
    * tokens cannot contain a space, so the joined string is an
    * unambiguous composite key (no struct/array join keys needed).
    * Extraction is the codegen'd [[graft.functions.TextExpressions
    * .NgramTransitions]] kernel — the declarative
    * transform(sequence)+struct chain it replaced ran an interpreted
    * lambda per transition and was 85% of LM scoring wall at the sf1
    * probe (tools.LmProbe: 1.6 s of 1.9 s; model joins near-free). */
  private def transitions(toks: Column, n: Int): Column = {
    require(n >= 2, "n-gram order must be >= 2")
    graft.functions.TextExpressions.ngramTransitions(toks, n)
  }

  /** Train an order-`n` LM over `textCol`: c(context, next), c(context),
    * |V| (unigram vocabulary — the standard smoothing denominator at any
    * order). Reference corpora and target corpora share tokenizer
    * semantics ([[TextAnalysis.tokens]]), so a model trained on one
    * scores the other. */
  def train(docs: DataFrame, textCol: String, n: Int = 2): NgramLm = {
    val toks = TextAnalysis.tokens(col(textCol))
    val tr = Par.widen(docs)
      .select(explode(transitions(toks, n)).as("bg"))
      .select(col("bg.prev").as("prev"), col("bg.cur").as("cur"))
    val bigrams = tr.groupBy("prev", "cur").agg(count(lit(1)).as("c_big"))
    val contexts = tr.groupBy("prev").agg(count(lit(1)).as("c_ctx"))
    val vocab = docs.select(explode(toks).as("tok"))
      .agg(countDistinct(col("tok"))).head().getLong(0)
    NgramLm(bigrams, contexts, vocab)
  }

  private val FxScale = 1000000000.0

  /** Per-document mean smoothed transition likelihood:
    * p(cur|prev) = (c(prev,cur)+k) / (c(prev)+k·|V|), each transition's
    * p rounded to 1e-9 fixed point, summed exactly per document.
    * Documents with fewer than two tokens have no transitions and are
    * absent from the output (nothing to score). Unseen transitions and
    * unseen contexts (scoring a corpus the model wasn't trained on)
    * back off to the smoothing mass via the left joins' coalesce(0).
    *
    * Output: (idCol, n_trans, sum_fx, lm_score) with
    * lm_score = sum_fx / n_trans / 1e9 ∈ (0, 1]. */
  def scoreMeanLikelihood(docs: DataFrame, idCol: String, textCol: String,
                          model: NgramLm, k: Double = 1.0,
                          n: Int = 2): DataFrame = {
    // ((cb + k) / (cc + k·V)) · 1e9 + 0.5, floored — EXACTLY this
    // operation order in the oracle SQL, so the doubles are bit-equal
    val (joined, p) = joinedTransitions(docs, idCol, textCol, model, k, n)
    val fx = floor(p * lit(FxScale) + lit(0.5)).cast("long")
    joined.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trans"), sum(fx).as("sum_fx"))
      .withColumn("lm_score",
        col("sum_fx").cast("double") / col("n_trans").cast("double") /
          lit(FxScale))
  }

  /** Shared scoring scaffold: per-doc transitions left-joined to the
    * model's bigram and context counts, plus the smoothed probability
    * column (unseen transition/context back off via coalesce(0)). */
  private def joinedTransitions(docs: DataFrame, idCol: String,
                                textCol: String, model: NgramLm,
                                k: Double, n: Int): (DataFrame, Column) = {
    require(k > 0, "smoothing k must be positive")
    val toks = TextAnalysis.tokens(col(textCol))
    val joined = Par.widen(docs)
      .select(col(idCol), explode(transitions(toks, n)).as("bg"))
      .select(col(idCol), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
      .join(model.bigrams, Seq("prev", "cur"), "left")
      .join(model.contexts, Seq("prev"), "left")
    val p = (coalesce(col("c_big"), lit(0L)).cast("double") + lit(k)) /
      (coalesce(col("c_ctx"), lit(0L)).cast("double") +
        lit(k) * lit(model.vocabSize.toDouble))
    (joined, p)
  }

  /** Persist a trained model as parquet under `path` ([[Artifacts]]
    * discipline: plain columns, Hadoop-FS-portable). `meta` is written
    * LAST, so its presence marks a complete artifact. */
  def save(spark: org.apache.spark.sql.SparkSession, path: String,
           model: NgramLm): Unit = {
    model.bigrams.write.mode("overwrite").parquet(path + "/bigrams")
    model.contexts.write.mode("overwrite").parquet(path + "/contexts")
    spark.range(1).select(lit(model.vocabSize).as("vocab_size"))
      .write.mode("overwrite").parquet(path + "/meta")
  }

  /** Load a model persisted by [[save]]. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): NgramLm =
    NgramLm(
      spark.read.parquet(path + "/bigrams"),
      spark.read.parquet(path + "/contexts"),
      spark.read.parquet(path + "/meta").head().getLong(0))

  /** Textbook bigram perplexity exp(−(1/n)·Σ ln p(cur|prev)) per
    * document — lower is more model-like. Same joins and smoothing as
    * [[scoreMeanLikelihood]]; log arithmetic, so verified by ScalaTest
    * against a reference fold rather than the cross-engine hash gate. */
  def scorePerplexity(docs: DataFrame, idCol: String, textCol: String,
                      model: NgramLm, k: Double = 1.0,
                      n: Int = 2): DataFrame = {
    val (joined, p) = joinedTransitions(docs, idCol, textCol, model, k, n)
    joined.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trans"), sum(log(p)).as("sum_ln"))
      .withColumn("perplexity",
        exp(-col("sum_ln") / col("n_trans").cast("double")))
      .drop("sum_ln")
  }
}
