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
  *                              and the ingest intake appends live
  *                              batches on top — bulk backfill and
  *                              streaming growth share one layout
  * <root>/gen=<n>/flists        float IVF sibling rows (PQ stores):
  *                              same batch_id layout under the same
  *                              coarse quantizer — the raw-vector
  *                              source for drift probes AND for
  *                              re-encoding batches at [[catchUp]]
  *                              (the cells+codes+floats layering)
  * <root>/gen=<n>/_high_water   the publish cutover contract: the
  *                              largest ingested batch_id the
  *                              generation's bulk build already
  *                              contains (see [[publish]])
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
  * ROLLOVER UNDER LIVE INGEST (the cutover contract): a retrain
  * publishing gen N+1 runs WHILE the ingest intake keeps appending
  * batches to gen N, so some batches land in N's lists but not in
  * N+1's bulk build. The contract that makes those batches survive:
  *
  *  1. the publisher snapshots its training/bulk corpus as-of a high
  *     water batch_id over the LIVE generation ([[corpusAsOf]]) and
  *     passes that same high water to [[publish]], which records it in
  *     the generation (`_high_water`, written before the marker);
  *  2. the intake (streaming `vectorStoreIngestIntake`) re-resolves
  *     [[current]] per micro-batch; when a NEWER generation appears it
  *     first [[catchUp]]s — every batch_id partition ABOVE the new
  *     generation's high water is re-encoded from the pinned
  *     generation's raw floats under the NEW model and written to the
  *     new generation as the same batch_id partition — then re-pins
  *     and appends the arriving batch there.
  *
  * No vector is lost (a batch is either ≤ high-water, i.e. inside the
  * new bulk, or re-ingested by catch-up / appended directly) and none
  * double-serves (within one generation a vector sits either in the
  * bulk or in exactly one batch_id partition, and serving reads ONE
  * generation). Catch-up is idempotent: partitions are rewritten by
  * their original batch_id with dynamic partition overwrite, so an
  * at-least-once replay of the cutover rewrites the same bytes.
  * Chained rollovers stay lossless as long as every publisher
  * snapshots via [[corpusAsOf]] over the generation the intake is
  * actively appending to.
  *
  * SINGLE WRITER: generation numbering has no mutual exclusion — the
  * store assumes ONE publisher at a time (the drift-gated retrain
  * loop). Two concurrent publishers can race to the same gen number;
  * the READY marker is created with overwrite=false so the loser
  * fails loudly instead of silently blessing an interleaved directory.
  *
  * Scale shape: [[publish]] is one training pass (sampled,
  * driver-traffic model-sized) plus one map-side prepare/encode scan of
  * the corpus per stored frame and a columnar write — the same cost
  * profile as the ingest intake, paid once per RETRAIN (drift-gated),
  * never per batch. [[catchUp]] re-encodes only the batches inside the
  * publish window — bounded by publish wall × arrival rate, never
  * corpus-sized.
  */
object VectorStore {

  final case class Generation(gen: Long, root: String) {
    def dir: String = s"$root/gen=$gen"
    def lists: String = s"$dir/lists"
    def flists: String = s"$dir/flists"
    def centroids: String = s"$dir/centroids"
    def codebooks: String = s"$dir/codebooks"
  }

  /** The loaded model halves of a generation — resolved once per
    * pinned closure, never per batch. `codebooks` is Some for PQ
    * stores. */
  final case class Models(
      quantizer: (Array[Long], Array[Array[Float]]),
      codebooks: Option[Array[Array[Array[Float]]]]) {
    def isPq: Boolean = codebooks.isDefined
  }

  private val MarkerRe = "_gen_(\\d+)_READY".r

  private def fileSystem(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Every committed generation number (READY marker exists),
    * ascending. Empty before the first successful [[publish]]. */
  def generations(spark: SparkSession, root: String): Seq[Long] = {
    val (fs, p) = fileSystem(spark, root)
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).iterator.flatMap { st =>
      st.getPath.getName match {
        case MarkerRe(n) => Some(n.toLong)
        case _ => None
      }
    }.toSeq.sorted
  }

  /** The live generation: largest n whose READY marker exists. None
    * before the first successful [[publish]]. */
  def current(spark: SparkSession, root: String): Option[Generation] =
    generations(spark, root).lastOption.map(Generation(_, root))

  /** Load a generation's models (quantizer + codebooks when present). */
  def models(spark: SparkSession, g: Generation): Models =
    Models(Artifacts.loadCentroids(spark, g.centroids),
      if (Artifacts.exists(spark, g.codebooks))
        Some(Artifacts.loadPqCodebooks(spark, g.codebooks))
      else None)

  /** Write the high-water record ATOMICALLY: to a temp sibling, then
    * rename-with-overwrite into place — an in-place `fs.create` leaves
    * a window where a concurrent reader (a serve-side [[highWater]] in
    * another process, [[catchUp]]) observes an empty/partial file.
    * Rename is atomic on HDFS and local filesystems; the reader
    * additionally tolerates a blank read (see [[highWater]]). */
  private def writeHighWater(spark: SparkSession, g: Generation,
                             hw: Long): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val (fs, _) = fileSystem(spark, g.root)
    val tmp = new org.apache.hadoop.fs.Path(g.dir, "_high_water._tmp")
    val out = fs.create(tmp, /*overwrite=*/ true)
    try out.write(s"$hw\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, conf)
    fc.rename(fs.makeQualified(tmp),
      fs.makeQualified(new org.apache.hadoop.fs.Path(g.dir, "_high_water")),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Advance a generation's recorded high water — used by compaction
    * when batch partitions fold into the bulk (the bulk then "contains
    * everything ≤ hw" again). Never moves backwards. */
  private[graft] def recordHighWater(spark: SparkSession, g: Generation,
                                     hw: Long): Unit = {
    val prev = highWater(spark, g)
    if (prev != Long.MaxValue && hw > prev) writeHighWater(spark, g, hw)
  }

  /** The high-water batch_id recorded at [[publish]] time:
    * every ingested batch with batch_id ≤ this value is already inside
    * the generation's bulk build; batches ABOVE it are the
    * [[catchUp]] replay set. Long.MaxValue when the generation carries
    * no record (pre-contract publishes): nothing is replayed, the
    * pre-contract behavior. */
  def highWater(spark: SparkSession, g: Generation): Long = {
    val (fs, _) = fileSystem(spark, g.root)
    val p = new org.apache.hadoop.fs.Path(g.dir, "_high_water")
    // writes go through writeHighWater (temp + atomic rename), but
    // tolerate a null/blank read anyway — on a filesystem without
    // atomic rename a concurrent advance could still expose a partial
    // file; retry briefly, then degrade to "no replay" with a warning
    // instead of crashing the stream on an NPE
    var attempt = 0
    while (true) {
      if (!fs.exists(p)) return Long.MaxValue
      val in = fs.open(p)
      val line =
        try new java.io.BufferedReader(
          new java.io.InputStreamReader(in,
            java.nio.charset.StandardCharsets.UTF_8)).readLine()
        finally in.close()
      val trimmed = Option(line).map(_.trim).getOrElse("")
      if (trimmed.nonEmpty) return trimmed.toLong
      attempt += 1
      if (attempt >= 3) {
        System.err.println(
          s"[VectorStore] WARN: $p read blank after $attempt attempts — " +
            "treating as no-replay (Long.MaxValue)")
        return Long.MaxValue
      }
      Thread.sleep(50L * attempt)
    }
    Long.MaxValue // unreachable
  }

  /** The generation's corpus as-of `highWater`: raw (vec_id, embedding)
    * rows of the bulk plus every ingested batch with batch_id ≤
    * `highWater` — exactly the snapshot a publisher must train and
    * bulk-build the NEXT generation from so that [[catchUp]]'s replay
    * set (batches above the high water) completes it without loss or
    * overlap. Reads the float frame (`flists` for PQ stores, `lists`
    * for IVF stores, which carry the vectors inline). */
  def corpusAsOf(spark: SparkSession, g: Generation,
                 highWater: Long): DataFrame = {
    val src = if (Artifacts.exists(spark, g.flists)) g.flists else g.lists
    spark.read.parquet(src)
      .filter(col("batch_id") === lit(-1L) ||
        col("batch_id") <= lit(highWater))
      .select(col("cand_id").as("vec_id"), col("candv").as("embedding"))
  }

  /** Prepare one raw (vec_id, embedding) batch under a generation's
    * models and write it as the generation's `batchId` partition —
    * the ONE append path shared by the streaming ingest intake and
    * [[catchUp]], so a replayed batch is bit-identical however it
    * arrives. Dynamic partition overwrite: an at-least-once replay
    * rewrites its own partition instead of double-inserting. PQ stores
    * write both frames (codes to `lists`, floats to `flists`).
    * @return the prepared code-frame rows (lazy plan) for chaining. */
  def ingestBatch(spark: SparkSession, g: Generation, m: Models,
                  batch: DataFrame, batchId: Long): DataFrame = {
    def write(df: DataFrame, path: String): Unit =
      df.withColumn("batch_id", lit(batchId))
        .write.option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").mode("overwrite").parquet(path)
    val prepared = m.codebooks match {
      case Some(cb) =>
        write(Similarity.ivfPrepare(batch, m.quantizer), g.flists)
        spark.catalog.refreshByPath(g.flists)
        val codes = Similarity.pqPrepare(batch, m.quantizer, cb)
        write(codes, g.lists)
        codes
      case None =>
        val floats = Similarity.ivfPrepare(batch, m.quantizer)
        write(floats, g.lists)
        floats
    }
    spark.catalog.refreshByPath(g.lists)
    prepared
  }

  /** Train a model on `corpus` and publish the full corpus under it as
    * the next generation: centroids (+ codebooks when `pqM > 0`), the
    * prepared list rows as the `batch_id = -1` bulk partition (PQ
    * stores also publish the float sibling frame), the high-water
    * record, then the READY marker — strictly last, so the generation
    * is resolvable only once every part of it is. Returns the new
    * generation, which [[current]] now reports.
    *
    * @param highWater the cutover contract (see object scaladoc): the
    *   largest ingested batch_id `corpus` already contains — pass the
    *   value used with [[corpusAsOf]]. The default Long.MaxValue
    *   declares "corpus covers everything", i.e. no catch-up replay;
    *   a rollover under live ingest MUST pass the real high water or
    *   in-flight batches vanish from serving at cutover. */
  def publish(spark: SparkSession, root: String, corpus: DataFrame,
              nlist: Int, pqM: Int = 0, pqKsub: Int = 256,
              trainIters: Int = 2,
              highWater: Long = Long.MaxValue): Generation = {
    val g = Generation(current(spark, root).map(_.gen + 1).getOrElse(1L), root)
    // Clamp hyperparameters the corpus cannot TRAIN, loudly, instead of
    // refusing: a small bootstrap (a 125-vector sf0.01 bulk) cannot
    // fill 256-code codebooks — trainPqCodebooks fails, and an
    // over-wide nlist under-fills the quantizer silently. ksub ≤ n/4
    // and nlist ≤ n/8 keep a sane k-means sample-per-centroid ratio;
    // the clamp only ever REDUCES, so explicit args stay authoritative
    // whenever the corpus can honor them, and big-corpus publishes
    // (where n/8 dwarfs any sane nlist) never change. The count is one
    // column-pruned aggregate against passes publish already pays
    // (train + per-frame prepare + write).
    val n = corpus.count()
    val nlistEff = math.max(1L, math.min(nlist.toLong, n / 8)).toInt
    val ksubEff = math.max(1L, math.min(pqKsub.toLong, n / 4)).toInt
    if (nlistEff != nlist || (pqM > 0 && ksubEff != pqKsub))
      System.err.println(
        s"[VectorStore] WARN: corpus n=$n cannot train nlist=$nlist" +
          (if (pqM > 0) s", pqKsub=$pqKsub" else "") +
          s" — clamped to nlist=$nlistEff" +
          (if (pqM > 0) s", pqKsub=$ksubEff" else "") +
          " (explicit smaller values are never raised)")
    val quant = Similarity.trainCentroids(corpus, nlistEff, trainIters)
    Artifacts.saveCentroids(spark, g.centroids, quant._1, quant._2)
    def bulk(df: DataFrame, path: String): Unit =
      df.withColumn("batch_id", lit(-1L))
        .write.partitionBy("batch_id").mode("overwrite").parquet(path)
    if (pqM > 0) {
      val cb = Similarity.trainPqCodebooks(corpus, pqM, ksubEff, trainIters)
      Artifacts.savePqCodebooks(spark, g.codebooks, cb)
      bulk(Similarity.pqPrepare(corpus, quant, cb), g.lists)
      bulk(Similarity.ivfPrepare(corpus, quant), g.flists)
    } else bulk(Similarity.ivfPrepare(corpus, quant), g.lists)
    writeHighWater(spark, g, highWater)
    val (fs, _) = fileSystem(spark, root)
    // overwrite=false: under the single-writer contract this marker
    // cannot exist; a concurrent publisher that raced to the same gen
    // number fails HERE, loudly, instead of both "succeeding" over an
    // interleaved directory
    fs.create(new org.apache.hadoop.fs.Path(root, s"_gen_${g.gen}_READY"),
      /*overwrite=*/ false).close()
    g
  }

  /** The cutover replay (contract in the object scaladoc): re-encode
    * every batch_id partition of `from` ABOVE `to`'s high water from
    * `from`'s raw floats under `to`'s models, writing each as the SAME
    * batch_id partition of `to`. Idempotent (dynamic partition
    * overwrite); batch-at-a-time so each replayed batch runs exactly
    * the job the ingest intake would have run. The replay set is
    * bounded by the publish window, never corpus-sized — the distinct
    * batch_id pull is partition-metadata-sized.
    * @return the replayed batch ids, ascending. */
  def catchUp(spark: SparkSession, from: Generation,
              to: Generation): Seq[Long] = {
    val hw = highWater(spark, to)
    val src = if (Artifacts.exists(spark, from.flists)) from.flists
      else from.lists
    // partition-column inference may type batch_id int — cast, don't trust
    val ids = spark.read.parquet(src)
      .filter(col("batch_id") =!= lit(-1L) && col("batch_id") > lit(hw))
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    if (ids.isEmpty) return ids
    val m = models(spark, to)
    ids.foreach { b =>
      val raw = spark.read.parquet(src)
        .filter(col("batch_id") === lit(b))
        .select(col("cand_id").as("vec_id"), col("candv").as("embedding"))
      ingestBatch(spark, to, m, raw, b)
    }
    ids
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
