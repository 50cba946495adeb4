package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable corpus splitting — train/val/test
  * assignment that is (a) a pure function of the row id (stable under
  * re-partitioning, re-runs, incremental appends: a document NEVER
  * migrates between splits when the corpus grows), and (b) reproducible
  * in any engine, because the hash is md5 — not an engine-private hash
  * like xxhash64's seed variant or `rand()`.
  *
  * Mechanism: the first 8 hex chars of `md5(id)` are a uniform draw
  * from [0, 2^32) in hex; comparing that STRING against fixed hex
  * thresholds (lexicographic = numeric for fixed-width lowercase hex)
  * needs no hex-to-int parsing, which not every engine can express.
  * Scan-speed, shuffle-free, codegen'd.
  */
object Sampling {

  /** 8-hex-char bucket of an id column, uniform over [0, 2^32). */
  def hashBucket(id: Column): Column =
    substring(md5(id.cast("string")), 1, 8)

  /** Threshold of a cumulative fraction as fixed-width lowercase hex. */
  private[operators] def hexThreshold(cumFraction: Double): String =
    f"${math.floor(cumFraction * 4294967296.0).toLong.min(4294967295L)}%08x"

  /** Split assignment: `splits` are (name, fraction) in priority order,
    * fractions summing to ≤ 1 (any remainder falls into the last split).
    *
    * @return `df` with an extra `split` column. */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.map(_._2).sum <= 1.0 + 1e-9, "fractions must sum to <= 1")
    val bucket = hashBucket(col(idCol))
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val assign = splits.init.zip(cum.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), c)) =>
        val cond = bucket < lit(hexThreshold(c))
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
    }.fold(lit(splits.last._1))(_.otherwise(splits.last._1))
    df.withColumn("split", assign)
  }
}
