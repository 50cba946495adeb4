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
}
