package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Block-keyed bounded rank-span candidate pairing — the shared skew
  * guard of the candidate-generation family ([[Dedup.minhashLsh]],
  * [[Dedup.simhashDups]], [[Similarity.cosineDedup]],
  * [[Similarity.semanticDedup]]). One definition so the boundary-block
  * correctness argument is proved once and a future change cannot
  * silently diverge between call sites.
  *
  * Rows are ranked within each `keys` group (deterministic `order`
  * sort), cut into blocks of `maxSpan` ranks, and paired only when their
  * rank distance is ≤ `maxSpan` — with the span ENFORCED IN THE JOIN
  * KEY, not as a post-join filter: sides join per rank-block, and the
  * a-side additionally reaches the NEXT block, so every span pair that
  * crosses a block boundary is still produced, while a degenerate hot
  * group (all-identical content in one bucket/cell — exactly what a
  * dirty corpus contains) costs O(rows × maxSpan) comparisons instead of
  * evaluating the full O(rows²) product before any filter could prune
  * it. Consequences callers rely on:
  *
  *  - groups of ≤ maxSpan+1 rows produce ALL their pairs — the guard is
  *    inactive and results equal the unguarded self-join;
  *  - oversized groups degrade to a rank-neighbor chain, so every member
  *    of an oversized duplicate cluster still surfaces in ≥ 1 pair and a
  *    downstream connected-components pass collapses the cluster exactly
  *    as all-pairs would (dropping whole oversized groups instead would
  *    report ZERO pairs for > maxSpan exact duplicates — a recall
  *    cliff);
  *  - the row_number sort over a hot group is one task but O(B log B)
  *    and spillable — not a scale-killer, unlike the product.
  */
private[operators] object SpanGuard {

  /** Candidate pairs within `keys` groups, rank-span-bounded.
    *
    * @param rows    one row per (group, id); only the columns named in
    *                `keys`, `idCol`, `order`, `payload` are consumed —
    *                keep it slim, this frame rides the exchange
    * @param payload extra columns carried onto both pair sides, emitted
    *                as `<name>_a` / `<name>_b`
    * @param cache   persist the ranked frame (it is consumed by both
    *                join sides; tracked in [[CacheRegistry]])
    * @param verify  row-wise transform (derived columns + filter over
    *                pair-side columns) applied BEFORE the (id_a, id_b)
    *                dedup, i.e. INSIDE the pairing stage: expensive
    *                verification (exact cosine, Jaccard) runs map-side
    *                on the join output and only SURVIVORS reach the
    *                dedup exchange — for a candidate volume of C pairs
    *                with S survivors the exchanges shrink from O(C) to
    *                O(S). A pair that meets in several shared groups is
    *                verified once per group, so `verify` must be a pure
    *                per-pair function (same columns in → same row out)
    *                for the dedup to stay deterministic — true for any
    *                expression over the pair-side columns.
    * @return (id_a, id_b, payload_a/b…) with rank(a) < rank(b) under
    *         `order` — when `order` is the id itself this means
    *         id_a < id_b — deduplicated on (id_a, id_b). */
  def pairs(rows: DataFrame, keys: Seq[String], idCol: String,
            order: Seq[String], maxSpan: Int,
            payload: Seq[String] = Nil, cache: Boolean = true,
            verify: DataFrame => DataFrame = identity): DataFrame = {
    // maxSpan = 0 would make the block key (rn-1)/0 = NaN/Infinity and
    // silently emit ZERO pairs — a recall cliff with no diagnostic
    require(maxSpan >= 1, s"maxSpan must be >= 1, got $maxSpan")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
    val ranked0 = rows
      .withColumn("rn", row_number().over(w))
      .withColumn("blk", floor((col("rn") - 1) / lit(maxSpan)))
    val ranked =
      if (cache) { val r = ranked0.persist(); CacheRegistry.track(r); r }
      else ranked0
    val a = ranked.select(keys.map(col) ++
      (col(idCol).as("id_a") +: payload.map(c => col(c).as(s"${c}_a"))) :+
      col("rn").as("rn_a") :+
      explode(array(col("blk"), col("blk") + 1)).as("jblk"): _*)
    val b = ranked.select(keys.map(col) ++
      (col(idCol).as("id_b") +: payload.map(c => col(c).as(s"${c}_b"))) :+
      col("rn").as("rn_b") :+ col("blk").as("jblk"): _*)
    verify(a.join(b, keys :+ "jblk")
        .filter(col("rn_b") > col("rn_a") && col("rn_b") - col("rn_a") <= maxSpan)
        .drop("rn_a", "rn_b", "jblk")
        .drop(keys: _*))
      .dropDuplicates("id_a", "id_b")
  }
}
