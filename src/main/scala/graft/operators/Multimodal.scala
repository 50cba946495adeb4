package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, batch feature extraction via `mapPartitions`.
  *
  * The actual codec call is STUBBED (this container has no image/audio
  * libraries): [[StubDecoder.decode]] derives deterministic fake
  * dimensions from the byte stream. Everything around it — binary column
  * schema, typed Dataset plumbing, per-partition batch iteration (the
  * shape a JNI/codec call wants: reuse one decoder instance per partition,
  * not per row), partition-count control — is real and tested.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String, source: String)
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
                           width: Int, height: Int, n_frames: Int, checksum_hex: String)

  /** The stubbed codec. A real implementation would hand `bytes` to an
    * image/audio/video decoder; we derive deterministic fake dimensions so
    * the pipeline is oracle-checkable end-to-end. */
  object StubDecoder {
    def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      val n = bytes.length
      (n % 640 + 1, n % 480 + 1, n % 30 + 1)
    }
  }

  /** Ingest: documents' text bytes stand in for media payloads; in a real
    * pipeline this is `spark.read.format("binaryFile")` or parquet with a
    * binary column. */
  def ingest(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        concat(lit("image/t"), col("doc_id") % 3).as("media_type"),
        col("source"))
      .as[MediaRow]
  }

  /** Batch feature extraction: one decoder + digest instance per
    * partition, streaming over rows — no per-row setup cost, no
    * driver-side collection. */
  def extractFeatures(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        val (w, h, f) = StubDecoder.decode(r.media)
        digest.reset()
        val sha = digest.digest(r.media).map("%02x".format(_)).mkString
        MediaFeatures(r.doc_id, r.media_type, r.media.length.toLong, w, h, f, sha)
      }
    }
  }

  case class ResizedMedia(doc_id: Long, width: Int, height: Int,
                          out_width: Int, out_height: Int, n_bytes_out: Long)
  case class FrameRef(doc_id: Long, frame_idx: Int, frame_count: Int)

  /** Resize-to-fit plumbing: aspect-preserving target-dim computation is
    * real; the pixel transform itself is the stubbed codec step (a real
    * impl hands bytes + target dims to the image library here). */
  def resizeTo(rows: Dataset[MediaRow], maxDim: Int): Dataset[ResizedMedia] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val (w, h, _) = StubDecoder.decode(r.media)
        val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
        val (ow, oh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
        // stub: a real decoder returns re-encoded bytes; we return the
        // deterministic would-be RGB buffer size
        ResizedMedia(r.doc_id, w, h, ow, oh, ow.toLong * oh * 3)
      }
    }
  }

  /** Frame sampling for video-ish media: every `everyN`-th frame index,
    * exploded one row per sampled frame — the shape a caption/embedding
    * stage consumes. The decode of each frame is the stubbed step. */
  def sampleFrames(rows: Dataset[MediaRow], everyN: Int): Dataset[FrameRef] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.flatMap { r =>
        val (_, _, frames) = StubDecoder.decode(r.media)
        (0 until frames by everyN).iterator.map(i => FrameRef(r.doc_id, i, frames))
      }
    }
  }
}
