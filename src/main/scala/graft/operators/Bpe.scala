package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Byte-pair-encoding tokenization (Sennrich et al. 2016,
  * arXiv:1508.07909) — the "count tokens the way the model will" step of
  * a training-data pipeline, as opposed to the whitespace/regex
  * approximations in [[TextAnalysis.tokenCounts]].
  *
  * Two halves, sharing one greedy-merge discipline:
  *
  *  - [[train]] — distributed merge learning. The corpus is scanned ONCE
  *    to build the word-frequency table; every subsequent iteration runs
  *    on that VOCAB-SIZED frame (never the corpus): adjacent-pair counts
  *    weighted by word frequency (partial-agg'd, so the exchange carries
  *    (pair, count) rows), argmax via a 1-row TakeOrdered with a total
  *    tie-break order, then one merge application. The frame is
  *    `localCheckpoint`ed every iteration — an iterative algorithm's
  *    lineage otherwise nests one plan per merge (the
  *    connectedComponents lesson).
  *  - [[encodeWord]] — the GPT-2-style greedy encoder: repeatedly merge
  *    the lowest-rank adjacent pair (leftmost on ties) until none
  *    applies. Replaying merges this way reproduces the training
  *    segmentation exactly (asserted differentially in BpeSpec).
  *
  * Codepoint discipline: both halves segment by Unicode codepoint (the
  * trainer via `substr`, the encoder via `codePoints`), never UTF-16
  * code units, so astral-plane characters cannot tear.
  */
object Bpe {

  /** One word's initial segmentation: one piece per codepoint. */
  private[operators] def codepoints(word: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Merge every left-to-right non-overlapping occurrence of (a, b). */
  private[operators] def mergeOnce(segs: Seq[String], a: String, b: String): Seq[String] = {
    val out = ArrayBuffer[String]()
    var i = 0
    while (i < segs.length) {
      if (i < segs.length - 1 && segs(i) == a && segs(i + 1) == b) {
        out += a + b; i += 2
      } else { out += segs(i); i += 1 }
    }
    out.toSeq
  }

  /** Greedy BPE encode of one word: repeatedly merge the adjacent pair
    * with the LOWEST merge rank (leftmost occurrence first) until no
    * learned pair remains — the GPT-2 encoder loop. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var parts: Seq[String] = codepoints(word)
    var done = parts.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i < parts.length - 1) {
        val r = ranks.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestA = parts(i); bestB = parts(i + 1) }
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        parts = mergeOnce(parts, bestA, bestB)
        done = parts.length < 2
      }
    }
    parts
  }

  /** Learn up to `numMerges` merges from the corpus. Merges with a
    * weighted pair count below `minPairCount` stop training early (a
    * pair seen once compresses nothing).
    *
    * @return merges in rank order (rank = index). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2L): Seq[(String, String)] = {
    require(numMerges >= 0)
    // ONE corpus scan: word-frequency table, then segment each distinct
    // word into codepoints. Vocab-sized from here on.
    var words = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(col("n"), transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))).as("segs"))
      .localCheckpoint()

    val merges = ArrayBuffer[(String, String)]()
    var stop = false
    while (merges.length < numMerges && !stop) {
      val npairs = greatest(size(col("segs")) - 1, lit(0))
      val best = words
        .select(col("n"), explode(arrays_zip(
          slice(col("segs"), lit(1), npairs),
          slice(col("segs"), lit(2), npairs))).as("p"))
        .select(col("n"), col("p").getField("0").as("a"), col("p").getField("1").as("b"))
        .groupBy("a", "b").agg(sum(col("n")).as("cnt"))
        // total order: deterministic argmax across partitionings
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty || best.head.getLong(2) < minPairCount) stop = true
      else {
        val (a, b) = (best.head.getString(0), best.head.getString(1))
        merges += ((a, b))
        val applyMerge = udf((segs: Seq[String]) => mergeOnce(segs, a, b))
        // localCheckpoint cuts the per-iteration lineage; unpersist the
        // SUPERSEDED checkpoint's blocks right away or numMerges copies
        // of the vocab frame pile up in executor storage (the
        // connectedComponents discipline, Dedup.scala)
        val prev = words
        words = words.withColumn("segs", applyMerge(col("segs"))).localCheckpoint()
        prev.unpersist(false)
      }
    }
    words.unpersist(false)
    merges.toSeq
  }
}
