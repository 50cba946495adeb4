package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guard for CPU-heavy row generation (transition/shingle
  * explodes): a parquet file is splittable only at row-group boundaries,
  * so a single-row-group input — pandas/pyarrow writes one row group per
  * ~1M rows, and every driver-generated testdata table and ScaleUp shard
  * is far under that — reaches Spark as ONE scan partition, and
  * everything up to the first exchange runs on one core (measured: 21 of
  * the LM scorer's 23 s at sf1 were the single-threaded explode, not the
  * joins it was feeding). Widening BEFORE the generate moves only the
  * slim document rows; the generated stream (10-100× wider) then fans
  * out across cores.
  *
  * No-op when the input is already at least default-parallelism wide —
  * a real many-file corpus scan must NOT be funneled through an extra
  * exchange (at 100 TB that exchange would dwarf the work it enables). */
object Par {
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
