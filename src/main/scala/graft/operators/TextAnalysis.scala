package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, document fingerprinting.
  *
  * All are pure narrow column expressions (no shuffle, whole-stage
  * codegen) — at 100 TB these run at scan speed and the only exchange is
  * whatever aggregation the caller adds downstream. Determinism: only
  * IEEE double +,*,/ and integer ops, so results are bit-stable across
  * engines and partitionings (no round(), no double→decimal casts).
  */
object TextAnalysis {

  /** The one token separator, shared by the Column-level [[tokens]] and
    * the JVM-side scan in [[heavyHitters]] — the sketch's exactness
    * proof requires the candidate pass and the recount to tokenize
    * IDENTICALLY, so both must derive from this constant. */
  val TokenSep = " "

  /** Whitespace tokens (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, TokenSep)

  /** GPT-style pre-tokenizer pattern: letter runs, digit runs, and
    * punctuation runs are separate pieces (ASCII variant so Java regex
    * and RE2-based engines agree). */
  val BpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"

  /** (whitespace word count, BPE-ish piece count). */
  def tokenCounts(text: Column): (Column, Column) = {
    val words = tokens(text)
    val pieces = size(regexp_extract_all(text, lit(BpePattern), lit(0)))
    (size(words), pieces)
  }

  // Small deterministic English stopword profile (public common-word
  // list) — the quality score's stopword-ratio feature.
  val StopEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  private def countIn(words: Column, set: Seq[String]): Column =
    size(filter(words, w => w.isin(set.map(lit(_)): _*)))

  /** Character-profile language ID over 21 languages: script detection
    * (CJK/Kana/Hangul/Cyrillic/Arabic/Hebrew/Greek/Thai/Devanagari),
    * then length-weighted character-n-gram profiles within Latin script
    * — see [[graft.functions.LangProfiles]] for the profile data, the
    * single-pass kernel, and the matching DuckDB oracle generator. */
  def langId(text: Column): Column =
    graft.functions.LangIdExpression.langId(text)

  /** Quality features + a composite score in [0,1]:
    * length prior + stopword-ratio prior + penalty for very long words
    * (all plain double arithmetic). */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val words = tokens(text)
    val nTok = size(words)
    val nChars = length(text)
    val nStop = countIn(words, StopEn)
    val nPunct = nChars - length(regexp_replace(text, "[.,!?;:]", ""))
    val stopRatio = nStop.cast("double") / nTok
    val meanLen = (nChars - (nTok - lit(1))).cast("double") / nTok
    val lenPrior = when(nTok >= 20 && nTok <= 2000, lit(0.4)).otherwise(lit(0.1))
    val score = lenPrior + lit(0.4) * stopRatio +
      when(meanLen >= 3.0 && meanLen <= 9.0, lit(0.2)).otherwise(lit(0.0))
    Seq(
      "n_tokens" -> nTok.cast("long"),
      "n_chars_calc" -> nChars.cast("long"),
      "n_stopwords" -> nStop.cast("long"),
      "n_punct" -> nPunct.cast("long"),
      "stopword_ratio" -> stopRatio,
      "mean_token_len" -> meanLen,
      "quality_score" -> score)
  }

  /** Whitespace-normalized md5 content fingerprint. */
  def fingerprintMd5(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** PII scrubbing for training corpora: emails, IPv4 addresses, and
    * long digit runs (phone/account numbers) replaced with typed
    * placeholder tokens. Patterns use only character classes, bounded
    * repetition, and word boundaries, so Java regex (Spark) and RE2
    * (DuckDB/ClickHouse) agree exactly; applied in a fixed order (email
    * first — its local part may contain digits an earlier <NUM> pass
    * would corrupt). Pure per-row expressions: scan-speed, shuffle-free. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val LongNumRe = "\\b[0-9]{7,}\\b"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      LongNumRe, "<NUM>")

  /** Per-document counts of each redacted PII class. */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long"),
    "n_ips" -> size(regexp_extract_all(regexp_replace(text, EmailRe, "<EMAIL>"),
      lit(Ipv4Re), lit(0))).cast("long"),
    "n_longnums" -> size(regexp_extract_all(
      regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"),
      lit(LongNumRe), lit(0))).cast("long"))

  /** Word n-grams of the document as strings; empty array below n tokens. */
  def wordGrams(text: Column, n: Int): Column = {
    val words = tokens(text)
    when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Highest occurrence count of any element (0 for an empty array):
    * sort, then fold counting the longest equal-run — O(n log n) per doc,
    * no per-element quadratic rescan. */
  private def maxCount(arr: Column): Column =
    aggregate(array_sort(arr),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Intra-document repetition signals (the Gopher/MassiveText repetition
    * filters, Rae et al. 2021 §A1.1, re-expressed word-level for a
    * single-line corpus): duplicate-word fraction, the fraction of word
    * bigrams claimed by the single most frequent bigram, and the fraction
    * of trigram occurrences that are repeats. Pure per-row expressions —
    * scan-speed at 100 TB, shuffle-free; integer counts divided once at
    * the end keep results bit-stable vs an oracle doing the same. */
  def repetitionColumns(text: Column): Seq[(String, Column)] = {
    val words = tokens(text)
    val nTok = size(words)
    val bi = wordGrams(text, 2)
    val nBi = size(bi)
    val tri = wordGrams(text, 3)
    val nTri = size(tri)
    Seq(
      "dup_word_fraction" ->
        (nTok - size(array_distinct(words))).cast("double") / nTok,
      "top_bigram_fraction" ->
        when(nBi > 0, maxCount(bi).cast("double") / nBi).otherwise(lit(0.0)),
      "dup_trigram_fraction" ->
        when(nTri > 0, (nTri - size(array_distinct(tri))).cast("double") / nTri)
          .otherwise(lit(0.0)))
  }

  def withQuality(df: DataFrame, textCol: String): DataFrame =
    qualityColumns(col(textCol)).foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }

  /** The corpus-clean enrichment: quality columns + normalized content
    * fingerprint + language tag — one stateless scan. Shared by the
    * batch corpus_clean query, the CleanCorpus CLI, and (columns only)
    * the streaming intake, so the three gates cannot drift. */
  def cleanEnrich(df: DataFrame, textCol: String): DataFrame =
    withQuality(df, textCol)
      .withColumn("fingerprint", fingerprintMd5(col(textCol)))
      .withColumn("predicted_lang", langId(col(textCol)))

  /** The corpus-clean keep/drop decision over [[cleanEnrich]] output:
    * exact-dedup canonicalization (keep the smallest id per normalized
    * fingerprint) + quality gate. */
  def cleanGate(enriched: DataFrame, idCol: String,
                minQuality: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("fingerprint").orderBy(idCol)
    enriched.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("quality_score") >= minQuality)
      .drop("rn")
  }

  /** Exact heavy hitters (tokens with count·(k+1) > N) via per-partition
    * Misra–Gries summaries (Misra & Gries 1982; the "frequent" algorithm)
    * — the 100 TB shape for frequent-token discovery: the token stream
    * is NEVER shuffled. Each partition streams its tokens through a
    * k-counter summary (amortized O(1) per token — a decrement-all
    * spends credits earlier increments deposited) and emits ≤ k
    * candidate tokens; any token with global count > N/(k+1) must
    * exceed the local threshold in at least one partition (averaging
    * argument), so the union of summaries is a SUPERSET of the answer.
    * An exact recount restricted to the (broadcast) candidates then
    * removes the false positives — so the result is EXACT and
    * partitioning-independent, even though the sketch is not. All
    * threshold arithmetic is integer (`cnt * (k+1) > N`): no division,
    * bit-portable across engines.
    *
    * @return (token, cnt) for every token with cnt·(k+1) > N. */
  def heavyHitters(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val texts = df.select(col(textCol).cast("string")).na.drop().as[String]
    val candidates = texts.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { text =>
        text.split(TokenSep, -1).foreach { w =>
          counters.get(w) match {
            case Some(c) => counters.update(w, c + 1)
            case None if counters.size < k => counters.update(w, 1L)
            case None =>
              // decrement-all: snapshot keys first (no mutation mid-iterate)
              counters.keys.toArray.foreach { kk =>
                val c = counters(kk)
                if (c == 1) counters.remove(kk) else counters.update(kk, c - 1)
              }
          }
        }
      }
      counters.keysIterator.map(Tuple1(_))
    }.toDF("token").distinct()

    // N rides the plan as a 1-row cross join — no eager driver action,
    // the operator stays lazy and the corpus is scanned twice (sketch +
    // recount), not three times
    val nFrame = df.select(coalesce(sum(size(tokens(col(textCol)))), lit(0L))
      .cast("long").as("n_total"))
    df.select(explode(tokens(col(textCol))).as("token"))
      .join(broadcast(candidates), "token")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(nFrame))
      .filter(col("cnt") * (k + 1) > col("n_total"))
      .drop("n_total")
  }

  /** WEIGHTED heavy hitters (SpaceSaving, Metwally et al. 2005) — "which
    * items carry more than 1/(k+1) of the total WEIGHT": heavy sources
    * by token mass, heavy domains by bytes — where [[heavyHitters]]
    * counts occurrences. Same two-phase discipline: per-partition
    * SpaceSaving summaries with k+1 counters (an eviction inherits the
    * minimum counter + the new weight, so any item whose true partition
    * weight exceeds W_p/(k+1) is guaranteed present at partition end; a
    * globally heavy item is partition-heavy somewhere by averaging →
    * always a candidate), then an EXACT recount of the bounded candidate
    * set and the integer threshold — the emitted answer is exact, so the
    * driver oracle states it in plain SQL. Eviction scans the counter
    * table (O(k) per eviction) — right for report-sized k; use a heap
    * variant before pushing k into the thousands.
    *
    * @return (item, weight) for every item with
    *         total weight × (k+1) > Σ weights. */
  def heavyHittersWeighted(df: DataFrame, itemCol: String, weightCol: String,
                           k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(itemCol).cast("string").as("item"),
        col(weightCol).cast("long").as("w"))
      .filter(col("item").isNotNull && col("w") > 0)
      .as[(String, Long)]
    val candidates = rows.mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      val cap = k + 1
      it.foreach { case (item, w) =>
        if (counts.contains(item) || counts.size < cap)
          counts.update(item, counts.getOrElse(item, 0L) + w)
        else {
          val (minItem, minW) = counts.minBy(_._2)
          counts.remove(minItem)
          counts.update(item, minW + w) // SpaceSaving: inherit the minimum
        }
      }
      counts.keysIterator.map(Tuple1(_))
    }.toDF("item").distinct()
    val totalFrame = rows.toDF("item", "w")
      .agg(coalesce(sum(col("w")), lit(0L)).as("w_total"))
    rows.toDF("item", "w")
      .join(broadcast(candidates), "item")
      .groupBy("item").agg(sum(col("w")).as("weight"))
      .crossJoin(broadcast(totalFrame))
      .filter(col("weight") * (k + 1) > col("w_total"))
      .drop("w_total")
  }

  /** Corpus-relative token-frequency quality (the CCNet-style signal the
    * per-document [[qualityColumns]] cannot see): per document, the mean
    * document frequency of its DISTINCT tokens and its hapax ratio
    * (fraction of distinct tokens appearing in no other document). Low
    * mean-df / high hapax ⇒ vocabulary the rest of the corpus never uses
    * (OCR noise, gibberish, exotic boilerplate).
    *
    * Cost, honestly: corpus-relative by definition, so the corpus-sized
    * (doc, distinct-token) row set must ride ONE exchange keyed by token
    * to meet its df — that exchange, not the vocab-sized df aggregation,
    * dominates at scale, and its hottest keys are stopwords present in
    * EVERY document. The head of the df distribution (`hotK` highest-df
    * tokens, a bounded TakeOrdered) is therefore broadcast and matched
    * map-side — the same hot-key discipline as [[Dedup]]'s df-cap
    * blacklist — so only the cold tail shuffles, and no partition
    * receives an every-document key. The tokenize+explode scan runs
    * three times (df aggregation, hot branch, cold branch): recomputing
    * it is deliberate — it is map-side-cheap, while a corpus-sized
    * token cache (or re-uniting the branches through one join) would
    * cost more than the extra scans.
    * The vocab-sized df frame IS cached ([[CacheRegistry]]-released).
    * Determinism: integer counts and one final double division each. */
  def freqQuality(df: DataFrame, idCol: String, textCol: String,
                  hotK: Int = 1024): DataFrame = {
    val toks = df.select(col(idCol),
        explode(array_distinct(tokens(col(textCol)))).as("tok"))
    val docFreq = toks.groupBy("tok").agg(count(lit(1)).as("df")).persist()
    CacheRegistry.track(docFreq)
    val hot = docFreq.orderBy(col("df").desc, col("tok")).limit(hotK)
      .withColumnRenamed("df", "df_hot")
    val tagged = toks.join(broadcast(hot), Seq("tok"), "left_outer")
    val hotSide = tagged.filter(col("df_hot").isNotNull)
      .select(col(idCol), col("df_hot").as("df"))
    val coldSide = tagged.filter(col("df_hot").isNull)
      .select(col(idCol), col("tok"))
      .join(docFreq, "tok")
      .select(col(idCol), col("df"))
    hotSide.unionByName(coldSide)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_distinct_tokens"),
        sum(col("df")).as("df_sum"),
        count(when(col("df") === 1, 1)).as("n_hapax"))
      .select(col(idCol),
        col("n_distinct_tokens"),
        (col("df_sum").cast("double") / col("n_distinct_tokens")).as("mean_token_df"),
        (col("n_hapax").cast("double") / col("n_distinct_tokens")).as("hapax_ratio"))
  }
}
