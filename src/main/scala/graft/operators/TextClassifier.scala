package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multinomial naive-Bayes text classifier — the model-based routing /
  * filtering stage of a training-data pipeline (fastText-style quality
  * and language classifiers in the GPT-3 / CCNet recipes are exactly
  * this shape: a linear scorer over token counts, trained once, applied
  * corpus-wide). Train on a labeled slice, classify the rest.
  *
  * Determinism discipline (same as [[LanguageModel]] / [[Bpe]]): the
  * TRAINED weights are log-probabilities quantized to 1e-9 fixed point
  * (`floor(1e9·ln p)`, a long). Scoring is then EXACT integer
  * arithmetic — per-document class scores are sums of longs, the argmax
  * is a total order (ties broken toward the lexicographically larger
  * label via struct-max), and the DuckDB oracle REPLAYS the persisted
  * weight table rather than recomputing `ln` (transcendental libm
  * results are not bit-portable across engines; integer sums are).
  * Training math itself is ScalaTest-verified against an in-memory
  * reference implementation.
  *
  * Model shape, chosen so the weight table stays SPARSE (one row per
  * (token, label) seen in training — no vocab × classes densification)
  * while scoring stays exact:
  *
  *   score_c(d) = prior_c + Σ_{t∈d∩V_c} m_t·w_{t,c} + (L_d − M_{d,c})·w0_c
  *
  * where w_{t,c} = fx(ln((n_tc+1)/(n_c+|V|))) for trained (t,c) rows,
  * w0_c = fx(ln(1/(n_c+|V|))) is the add-1 backoff weight — EXACTLY the
  * weight an n_tc=0 row would get, so sparse-with-backoff is bit-equal
  * to the dense formulation — L_d is the document's token count and
  * M_{d,c} the count of its tokens that have a (t,c) weight row.
  * |V| is the training vocabulary (all classes pooled), the standard
  * add-1 denominator.
  *
  * Scale shape (100 TB corpus): training is one map-side-combinable
  * groupBy over exploded (label, token) pairs plus class- and
  * vocab-sized aggregates; the model is data-bounded (distinct
  * (token, label) pairs), never corpus-bounded, and nothing but the
  * class list and vocab size ever reaches the driver. Scoring shuffles
  * the per-document distinct-token stream once (join on token against
  * the model — many-to-one, hot function words are unique on the model
  * side so skew is one-sided and AQE-splittable), then re-aggregates
  * (doc, label) with map-side combine. The class table (a handful of
  * rows) broadcasts.
  */
object TextClassifier {

  /** A trained model: sparse token weights (tok, label, w_fx), the class
    * table (label, prior_fx, w0_fx), and the label list sorted
    * ascending (driver-sized: one entry per class). */
  final case class NbModel(weights: DataFrame, classes: DataFrame,
                           labels: Seq[String])

  private val FxScale = 1e9

  /** floor(1e9 · ln x) as a long column. */
  private def fxLn(x: org.apache.spark.sql.Column) =
    floor(log(x) * lit(FxScale)).cast("long")

  /** Train add-1-smoothed multinomial NB over whitespace tokens of
    * `textCol`, classes from `labelCol`. */
  def train(docs: DataFrame, labelCol: String, textCol: String): NbModel = {
    val occ = Par.widen(docs).select(col(labelCol).as("label"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    // |V|: pooled training vocabulary — one number on the driver
    val vocab = occ.select("tok").distinct().count()
    // per-class token totals n_c — class-count-sized
    val nC = occ.groupBy("label").agg(count(lit(1)).as("n_c"))
    val nDocs = docs.count()
    val classes = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("docs_c"))
      .join(nC, "label")
      .select(col("label"),
        fxLn(col("docs_c").cast("double") / lit(nDocs.toDouble)).as("prior_fx"),
        fxLn(lit(1.0) / (col("n_c").cast("double") + lit(vocab.toDouble)))
          .as("w0_fx"))
    val weights = occ.groupBy("tok", "label")
      .agg(count(lit(1)).as("n_tc"))
      .join(broadcast(nC), "label")
      .select(col("tok"), col("label"),
        fxLn((col("n_tc").cast("double") + lit(1.0)) /
          (col("n_c").cast("double") + lit(vocab.toDouble))).as("w_fx"))
    val labels = classes.select("label").collect().map(_.getString(0))
      .toSeq.sorted
    NbModel(weights, classes, labels)
  }

  /** Classify `docs`: (idCol, predicted, score_fx) — one row per
    * document; `score_fx` is the winning class's exact integer score.
    * Ties break toward the lexicographically larger label (struct-max
    * over (score, label) — the same total order `ORDER BY score DESC,
    * label DESC LIMIT 1` yields in SQL). */
  def classify(docs: DataFrame, idCol: String, textCol: String,
               model: NbModel): DataFrame = {
    val occ = Par.widen(docs)
      .select(col(idCol).as("id"), explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy("id", "tok").agg(count(lit(1)).as("m"))
    val lens = occ.groupBy("id").agg(sum(col("m")).as("len"))
    // matched mass per (doc, class): inner join keeps the stream slim —
    // unmatched tokens are accounted for exactly via len − m_matched
    val matched = occ.join(model.weights, Seq("tok"))
      .groupBy("id", "label")
      .agg(sum(col("m") * col("w_fx")).as("s_w"), sum(col("m")).as("m_matched"))
    val scored = lens.crossJoin(broadcast(model.classes))
      .join(matched, Seq("id", "label"), "left")
      .withColumn("score_fx",
        col("prior_fx") + coalesce(col("s_w"), lit(0L)) +
          (col("len") - coalesce(col("m_matched"), lit(0L))) * col("w0_fx"))
    scored.groupBy("id")
      .agg(max(struct(col("score_fx"), col("label"))).as("top"))
      .select(col("id").as(idCol), col("top.label").as("predicted"),
        col("top.score_fx").as("score_fx"))
  }

  /** Persist a trained model ([[Artifacts]] discipline: plain columns,
    * Hadoop-FS portable; `classes` written LAST as the completion
    * marker — its `_SUCCESS` is what [[Artifacts.exists]] checks). */
  def save(spark: SparkSession, path: String, model: NbModel): Unit = {
    model.weights.write.mode("overwrite").parquet(path + "/weights")
    model.classes.coalesce(1).write.mode("overwrite").parquet(path + "/classes")
  }

  /** Load a [[save]]d model. */
  def load(spark: SparkSession, path: String): NbModel = {
    val classes = spark.read.parquet(path + "/classes")
    NbModel(spark.read.parquet(path + "/weights"), classes,
      classes.select("label").collect().map(_.getString(0)).toSeq.sorted)
  }
}
