package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generation-addressed lifecycle for an ANN vector store — the piece
  * that turns a fired [[Similarity.ivfDriftProbe]] verdict into a SAFE
  * model rollover. A generation is an immutable (model, lists) pair:
  *
  * {{{
  * <root>/gen=<n>/centroids     coarse quantizer (Artifacts layout)
  * <root>/gen=<n>/codebooks     PQ codebooks (PQ stores only)
  * <root>/gen=<n>/lists         batch_id-partitioned list rows:
  *                              the bulk build sits at batch_id = -1,
  *                              and vectorIngestIntake appends live
  *                              batches on top — bulk backfill and
  *                              streaming growth share one layout
  * <root>/_gen_<n>_READY        commit marker, written LAST
  * }}}
  *
  * The live generation is the largest n with a READY marker — the
  * commit-marker pattern, so a crash mid-[[publish]] leaves a partial
  * gen directory that no reader can ever resolve (no delete-then-rename
  * pointer window, nothing mutated in place). Readers resolve
  * [[current]] ONCE at closure creation, which composes with the serve
  * intakes' pinned-generation contract: codes encoded under model A
  * scored through model B's LUTs would be silent garbage, so a rollover
  * NEVER swaps either half under a running query — it publishes a new
  * immutable generation, and serving moves to it at the next closure
  * (query restart). Old generations stay on disk for still-pinned
  * readers until [[dropGenerationsBelow]] reclaims them.
  *
  * Scale shape: [[publish]] is one training pass (sampled,
  * driver-traffic model-sized) plus one map-side prepare/encode scan of
  * the corpus and a columnar write — the same cost profile as the
  * ingest intake, paid once per RETRAIN (drift-gated), never per batch.
  */
object VectorStore {

  final case class Generation(gen: Long, root: String) {
    def dir: String = s"$root/gen=$gen"
    def lists: String = s"$dir/lists"
    def centroids: String = s"$dir/centroids"
    def codebooks: String = s"$dir/codebooks"
  }

  private val MarkerRe = "_gen_(\\d+)_READY".r

  private def fileSystem(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** The live generation: largest n whose READY marker exists. None
    * before the first successful [[publish]]. */
  def current(spark: SparkSession, root: String): Option[Generation] = {
    val (fs, p) = fileSystem(spark, root)
    if (!fs.exists(p)) return None
    val gens = fs.listStatus(p).iterator.flatMap { st =>
      st.getPath.getName match {
        case MarkerRe(n) => Some(n.toLong)
        case _ => None
      }
    }.toSeq
    if (gens.isEmpty) None else Some(Generation(gens.max, root))
  }

  /** Train a model on `corpus` and publish the full corpus under it as
    * the next generation: centroids (+ codebooks when `pqM > 0`), then
    * the prepared list rows as the `batch_id = -1` bulk partition, then
    * the READY marker — strictly last, so the generation is resolvable
    * only once every part of it is. Returns the new generation, which
    * [[current]] now reports. */
  def publish(spark: SparkSession, root: String, corpus: DataFrame,
              nlist: Int, pqM: Int = 0, pqKsub: Int = 256,
              trainIters: Int = 2): Generation = {
    val g = Generation(current(spark, root).map(_.gen + 1).getOrElse(1L), root)
    val quant = Similarity.trainCentroids(corpus, nlist, trainIters)
    Artifacts.saveCentroids(spark, g.centroids, quant._1, quant._2)
    val prepared =
      if (pqM > 0) {
        val cb = Similarity.trainPqCodebooks(corpus, pqM, pqKsub, trainIters)
        Artifacts.savePqCodebooks(spark, g.codebooks, cb)
        Similarity.pqPrepare(corpus, quant, cb)
      } else Similarity.ivfPrepare(corpus, quant)
    prepared.withColumn("batch_id", lit(-1L))
      .write.partitionBy("batch_id").mode("overwrite").parquet(g.lists)
    val (fs, _) = fileSystem(spark, root)
    fs.create(new org.apache.hadoop.fs.Path(root, s"_gen_${g.gen}_READY"),
      /*overwrite=*/ true).close()
    g
  }

  /** Reclaim retired generations: delete every gen directory AND marker
    * strictly below `gen`. Refuses to touch the live generation (call
    * only when no reader can still be pinned to the victims — the
    * compaction-horizon discipline applied to model generations). */
  def dropGenerationsBelow(spark: SparkSession, root: String, gen: Long): Unit = {
    val live = current(spark, root).map(_.gen)
    require(!live.exists(_ < gen),
      s"dropGenerationsBelow($gen) would delete the LIVE generation $live")
    val (fs, p) = fileSystem(spark, root)
    if (!fs.exists(p)) return
    fs.listStatus(p).foreach { st =>
      val name = st.getPath.getName
      val victim = name match {
        case MarkerRe(n) => n.toLong < gen
        case _ => name.startsWith("gen=") &&
          name.stripPrefix("gen=").toLongOption.exists(_ < gen)
      }
      if (victim) fs.delete(st.getPath, true)
    }
  }
}
