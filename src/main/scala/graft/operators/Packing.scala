package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GPT-style sequence packing: within each shard, concatenate every
  * document's token stream in deterministic (doc-id) order and cut the
  * stream every `seqLen` tokens — the standard way LLM pretraining
  * pipelines turn a ragged document corpus into fixed-length training
  * sequences with zero padding waste. The output is the pack MANIFEST:
  * one row per (sequence, document) overlap saying which token span of
  * which document lands where in which sequence; the actual token
  * gather is a downstream `join` + `slice` against the tokenized
  * corpus.
  *
  * Scale design: the running token offset is a per-shard window
  * cumulative sum — the sort is distributed across shards (`partitionBy
  * shard`), which is also how production packing runs: per input shard,
  * never a global order. A document spanning a sequence boundary
  * explodes into one row per spanned sequence (`sequence(firstSeq,
  * lastSeq)`), so compute is proportional to output rows. Everything is
  * integer arithmetic — bit-identical in any engine.
  */
object Packing {

  /** Lowest-id first-fit over open-bin free capacities in O(log B) per
    * query: a growable max-segment tree keyed by bin id (internal nodes
    * hold the subtree's max free space; a fit-query descends left-first,
    * so the hit is always the LOWEST id that fits — exactly the
    * assignment the linear scan, the spec's reference fold, and the
    * recursive-CTE oracle define). Replaces an `indexWhere` scan that
    * cost O(bins) per document: bins per shard grow linearly with shard
    * volume at fixed `seqLen`, so the scan made per-shard FFD quadratic
    * per decade at fixed shard count (measured 4.9×/decade at the
    * 100×-rows probe; log-tree makes it ~linear). */
  private final class FirstFitTree(seqLen: Long) {
    private var cap = 1024
    private var tree = new Array[Long](2 * cap) // leaves at [cap, 2cap)
    private var n = 0
    private def grow(): Unit = {
      val old = tree; val oldCap = cap
      cap *= 2
      tree = new Array[Long](2 * cap)
      System.arraycopy(old, oldCap, tree, cap, oldCap)
      var i = cap - 1
      while (i >= 1) { tree(i) = math.max(tree(2 * i), tree(2 * i + 1)); i -= 1 }
    }
    private def pull(bin: Int): Unit = {
      var i = (cap + bin) / 2
      while (i >= 1) { tree(i) = math.max(tree(2 * i), tree(2 * i + 1)); i /= 2 }
    }
    def freeOf(bin: Int): Long = tree(cap + bin)
    def take(bin: Int, tok: Long): Unit = {
      tree(cap + bin) -= tok; pull(bin)
    }
    /** Opens a bin holding `tok` tokens; returns its id. */
    def open(tok: Long): Int = {
      if (n == cap) grow()
      tree(cap + n) = seqLen - tok; pull(n); n += 1; n - 1
    }
    /** Lowest bin id with free ≥ `need`, or -1. */
    def firstFit(need: Long): Int =
      if (tree(1) < need) -1
      else {
        var i = 1
        while (i < cap) i = if (tree(2 * i) >= need) 2 * i else 2 * i + 1
        i - cap
      }
    def reset(): Unit = {
      if (n > 0) { java.util.Arrays.fill(tree, 0L); n = 0 }
    }
  }

  /** Pack manifest for `docs`.
    *
    * @param nTok   per-document token count column (must be ≥ 0; empty
    *               documents produce no rows)
    * @param seqLen tokens per packed training sequence
    * @return (shard, seq_id, doc_id, seq_off, doc_off, tok_len):
    *         document tokens [doc_off, doc_off+tok_len) occupy positions
    *         [seq_off, seq_off+tok_len) of sequence seq_id (numbered
    *         from 0 within each shard).
    */
  def packManifest(docs: DataFrame, idCol: String, shardCol: String,
                   nTok: Column, seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    // tokenless (and any malformed negative-count) docs are dropped
    // BEFORE the cumulative sum — a negative count entering the window
    // would silently shift every later doc's offsets in the shard
    docs.select(col(shardCol).as("shard"), col(idCol).as("doc_id"),
        nTok.cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("tok_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      // `div` is INTEGRAL division on longs — floor(a / b) via doubles
      // would lose exactness past 2^53 cumulative tokens, which a 100 TB
      // shard can reach
      .withColumn("seq_id", explode(sequence(
        expr(s"tok_before div $seqLen"),
        expr(s"(tok_before + n_tok - 1) div $seqLen"))))
      .withColumn("seq_start", col("seq_id") * seqLen)
      .withColumn("span_start", greatest(col("tok_before"), col("seq_start")))
      .select(
        col("shard"), col("seq_id"), col("doc_id"),
        (col("span_start") - col("seq_start")).as("seq_off"),
        (col("span_start") - col("tok_before")).as("doc_off"),
        (least(col("tok_before") + col("n_tok"), col("seq_start") + seqLen)
          - col("span_start")).as("tok_len"))
  }

  /** DOCUMENT-ATOMIC packing — the no-split sibling of [[packManifest]]
    * for pipelines that must not truncate or splice documents (SFT
    * examples, contrastive pairs, anything where a half document is
    * garbage): within each shard, first-fit-decreasing bin packing of
    * whole documents into `seqLen`-token bins.
    *
    * Scale design: ONE hash exchange on the shard + an in-partition sort
    * on (shard, n_tok DESC, doc_id) — the secondary-sort pattern — then
    * a streaming per-shard FFD fold with O(log bins) first-fit
    * ([[FirstFitTree]]). FFD keeps every bin's remaining
    * capacity; documents arrive largest-first, so the classic guarantee
    * holds: AT MOST ONE bin per shard ends ≤ half full (two half-empty
    * bins contradict first-fit — the later bin's first doc, ≤ half a
    * bin by arrival order, would have fit the earlier one). That
    * invariant is the driver-checkable liveness proof
    * (`corpus_pack_bins_violations`); the assignment itself is
    * order-dependent, so the driver row is rows-only and the spec
    * differentials a reference FFD. Open-bin state is bounded by
    * bins-per-shard; for 100 TB shards cap memory by pre-splitting
    * shards (the caller owns shard granularity, same contract as
    * [[packManifest]]).
    *
    * Documents longer than `seqLen` cannot pack whole — they are
    * EMITTED with `bin_id = -1` rather than silently dropped, so the
    * caller decides (truncate, split via [[packManifest]], discard).
    *
    * @return (shard, bin_id, doc_id, n_tok, bin_off): document occupies
    *         [bin_off, bin_off + n_tok) of its shard's bin. */
  def packBins(docs: DataFrame, idCol: String, shardCol: String,
               nTok: Column, seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    val spark = docs.sparkSession
    import spark.implicits._
    val slim = docs.select(col(shardCol).cast("string").as("shard"),
        col(idCol).cast("long").as("doc_id"), nTok.cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .as[(String, Long, Long)]
    slim
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("n_tok").desc, col("doc_id"))
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[(String, Long, Long, Long, Long)] {
          private var shard: String = _
          // open-bin free capacities, first-fit in O(log bins)
          private val bins = new FirstFitTree(seqLen)
          def hasNext: Boolean = buf.hasNext
          def next(): (String, Long, Long, Long, Long) = {
            val (s, id, n) = buf.next()
            if (s != shard) { shard = s; bins.reset() }
            if (n > seqLen) (s, -1L, id, n, -1L)
            else {
              val i = bins.firstFit(n)
              if (i >= 0) {
                val off = seqLen - bins.freeOf(i)
                bins.take(i, n)
                (s, i.toLong, id, n, off)
              } else (s, bins.open(n).toLong, id, n, 0L)
            }
          }
        }
      }
      .toDF("shard", "bin_id", "doc_id", "n_tok", "bin_off")
  }

  /** Overlapping token-window chunking — the retrieval/RAG sibling of
    * [[packManifest]]: where packing concatenates documents into
    * fixed-length TRAINING sequences, chunking splits each document
    * into overlapping RETRIEVAL windows (embed-and-index units). Chunk
    * `i` covers whitespace tokens [i·stride, i·stride + window) of its
    * document; `stride < window` gives the standard overlap so no
    * semantic span is cut at a hard boundary without also appearing
    * whole in a neighbor.
    *
    * TAIL CONTRACT: a start is emitted iff it is 0 or the PREVIOUS
    * chunk did not already reach the document's end (start + window −
    * stride < n_tokens) — so the final chunk may be short, but no
    * chunk is ever a pure suffix of its predecessor (a redundant tail
    * would embed/index duplicate content and skew retrieval scores).
    * Every token lands in ≥ 1 chunk; tokens in overlap regions land in
    * exactly 2 (window/stride = 2).
    *
    * Scale shape: one corpus scan, pure map-side explode — no shuffle,
    * no window, no join; output rows ≈ n_tokens/stride per doc. At
    * 100 TB this is the ideal operator shape: embarrassingly parallel,
    * partition-count-preserving ([[Par.widen]] guards the degenerate
    * few-row-group layout like every CPU-heavy explode in the repo).
    * Integer arithmetic + order-preserving slices only — bit-identical
    * in any engine.
    *
    * @return (doc_id, chunk_idx, start_tok, n_tokens, chunk_text). */
  def chunkOverlap(docs: DataFrame, idCol: String, textCol: String,
                   window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window]: $stride")
    Par.widen(docs)
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)),
          lit(stride))).as("start"))
      .filter(col("start") === 0 ||
        col("start") + lit(window - stride) < size(col("toks")))
      .select(col("doc_id"),
        (col("start") / stride).cast("long").as("chunk_idx"),
        col("start").cast("long").as("start_tok"),
        slice(col("toks"), col("start") + 1, lit(window)).as("chunk"))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("chunk")).cast("long").as("n_tokens"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
  }
}
