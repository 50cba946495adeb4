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
  *    to build the word-frequency table; every subsequent ROUND runs on
  *    that VOCAB-SIZED frame (never the corpus): adjacent-pair counts
  *    weighted by word frequency (partial-agg'd, so the exchange carries
  *    (pair, count) rows), then up to `maxBatch` merges are learned from
  *    ONE count table before the frame is touched again. The frame is
  *    `localCheckpoint`ed once per round — an iterative algorithm's
  *    lineage otherwise nests one plan per merge (the
  *    connectedComponents lesson).
  *
  * Batched rounds are PROVABLY identical to one-merge-at-a-time training
  * (asserted differentially in BpeSpec against an in-memory sequential
  * reference). The batch is the longest prefix of the
  * (count desc, a, b)-sorted candidate list where each candidate:
  *
  *  1. shares no symbol with an earlier batch member (neither operand
  *     nor concatenation) and its concatenation spells no existing vocab
  *     symbol — so applying the earlier merges cannot change this
  *     candidate's count, and no token aliasing can inflate others;
  *  2. strictly out-counts every pair a prior batch member could CREATE:
  *     merging (a,b)→ab only creates pairs (x,ab) / (ab,y), whose counts
  *     are bounded by the ORIGINAL counts of (x,a) / (b,y) — so a
  *     candidate beating max(maxCount(·,a), maxCount(b,·)) for every
  *     accepted (a,b) also beats anything sequential recounting could
  *     surface (pair counts never increase under a disjoint merge).
  *
  * On prose-like corpora early rounds batch little (sequential BPE
  * genuinely picks (th,e) right after (t,h) — a dependency no stale
  * count table can see), but as counts flatten deeper into training the
  * prefix lengthens; driver round-trips drop from one-per-merge to
  * one-per-round without changing a single learned merge.
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
    * @param maxBatch candidate-list depth per round — the ceiling on
    *                 merges learned from one count table (see the
    *                 class doc for why the result is still exactly the
    *                 sequential merge sequence).
    * @return merges in rank order (rank = index). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2L, maxBatch: Int = 64): Seq[(String, String)] =
    trainWithStats(df, textCol, numMerges, minPairCount, maxBatch)._1

  /** [[train]] plus the number of driver rounds it took — exposed so
    * tests (and capacity planning) can see the batching actually batch. */
  def trainWithStats(df: DataFrame, textCol: String, numMerges: Int,
                     minPairCount: Long = 2L, maxBatch: Int = 64)
      : (Seq[(String, String)], Int) = {
    require(numMerges >= 0 && maxBatch >= 1)
    // ONE corpus scan: word-frequency table, then segment each distinct
    // word into codepoints. Vocab-sized from here on.
    var words = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(col("n"), transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))).as("segs"))
      .localCheckpoint()

    // Driver-side vocab registry: the batch-safety rules need to know
    // whether a candidate's concatenation spells a symbol that already
    // exists (token aliasing would let other pairs' counts INCREASE,
    // voiding rule 2's never-increase premise). Alphabet-sized collect
    // once; grows by one per merge thereafter.
    val symbols = scala.collection.mutable.HashSet[String]()
    words.select(explode(col("segs")).as("s")).distinct()
      .collect().foreach(r => symbols += r.getString(0))

    val merges = ArrayBuffer[(String, String)]()
    var rounds = 0
    var stop = false
    while (merges.length < numMerges && !stop) {
      rounds += 1
      val npairs = greatest(size(col("segs")) - 1, lit(0))
      val pairs = words
        .select(col("n"), explode(arrays_zip(
          slice(col("segs"), lit(1), npairs),
          slice(col("segs"), lit(2), npairs))).as("p"))
        .select(col("n"), col("p").getField("0").as("a"), col("p").getField("1").as("b"))
        .groupBy("a", "b").agg(sum(col("n")).as("cnt"))
        .persist()
      // total order: deterministic argmax across partitionings
      val top = pairs
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(maxBatch).collect()
      if (top.isEmpty || top.head.getLong(2) < minPairCount) {
        pairs.unpersist(false)
        stop = true
      } else {
        // Per-symbol count maxima for batch rule 2: the strongest pair a
        // merge (a,b) can create is bounded by max cnt over (·,a) and
        // (b,·). One vocab-sized collect serves every candidate.
        val maxima = pairs
          .select(lit(0).as("side"), col("b").as("s"), col("cnt"))
          .union(pairs.select(lit(1).as("side"), col("a").as("s"), col("cnt")))
          .groupBy("side", "s").agg(max(col("cnt")).as("m"))
          .collect()
        pairs.unpersist(false)
        val sndMax = maxima.filter(_.getInt(0) == 0)
          .map(r => r.getString(1) -> r.getLong(2)).toMap // max cnt of (·, s)
        val fstMax = maxima.filter(_.getInt(0) == 1)
          .map(r => r.getString(1) -> r.getLong(2)).toMap // max cnt of (s, ·)

        val batch = ArrayBuffer[(String, String)]()
        val used = scala.collection.mutable.HashSet[String]()
        var ubound = Long.MinValue // max count any accepted merge could create
        var open = true
        var i = 0
        while (open && i < top.length && merges.length + batch.length < numMerges) {
          val (a, b, c) = (top(i).getString(0), top(i).getString(1), top(i).getLong(2))
          val conflict = used.contains(a) || used.contains(b) || used.contains(a + b)
          if (c < minPairCount || (batch.nonEmpty && (conflict || c <= ubound))) {
            open = false // prefix rule: the first unsafe candidate closes the batch
          } else {
            batch += ((a, b))
            used += a; used += b; used += (a + b)
            ubound = math.max(ubound, math.max(
              sndMax.getOrElse(a, Long.MinValue), fstMax.getOrElse(b, Long.MinValue)))
            // aliasing with an existing symbol is fine for THIS merge
            // (its own selection never depended on later effects) but
            // poisons the never-increase premise for everything after
            if (symbols.contains(a + b)) open = false
          }
          i += 1
        }
        merges ++= batch
        batch.foreach { case (a, b) => symbols += (a + b) }
        val batchSeq = batch.toSeq
        val applyBatch = udf((segs: Seq[String]) =>
          batchSeq.foldLeft(segs) { case (s, (a, b)) => mergeOnce(s, a, b) })
        // localCheckpoint cuts the per-round lineage; unpersist the
        // SUPERSEDED checkpoint's blocks right away or numMerges copies
        // of the vocab frame pile up in executor storage (the
        // connectedComponents discipline, Dedup.scala)
        val prev = words
        words = words.withColumn("segs", applyBatch(col("segs"))).localCheckpoint()
        prev.unpersist(false)
      }
    }
    words.unpersist(false)
    (merges.toSeq, rounds)
  }
}
