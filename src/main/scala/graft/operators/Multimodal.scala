package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, batch feature extraction via `mapPartitions`.
  *
  * IMAGE decode is REAL: [[MediaCodec]] hands the bytes to the JDK's own
  * `javax.imageio` (no external dependency), including true
  * width/height, GIF frame counts, and a real resize + re-encode path —
  * for payloads that pass the POSITIVE signature guard: PNG, JPEG,
  * GIF (magic + trailer + binary screen descriptor), and strict BMP
  * (declared file size must equal the payload; encoders that write a
  * bogus bfSize are deliberately refused). Everything else — video/audio
  * containers whose codecs genuinely aren't in this container, WBMP
  * (whose format has no magic bytes at all), malformed images — falls
  * back to [[StubDecoder]]'s deterministic fake dimensions so the
  * pipeline stays oracle-checkable end-to-end. The
  * Spark-side shape — binary column schema, typed Dataset plumbing,
  * per-partition batch iteration (one decoder context per partition, not
  * per row), partition-count control — is identical for both paths.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String, source: String)
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
                           width: Int, height: Int, n_frames: Int, checksum_hex: String)

  /** Fallback codec for payloads `javax.imageio` cannot read (video /
    * audio containers): deterministic fake dimensions derived from the
    * byte stream, so the pipeline is oracle-checkable end-to-end. */
  object StubDecoder {
    def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      val n = bytes.length
      (n % 640 + 1, n % 480 + 1, n % 30 + 1)
    }
  }

  /** Real image decoding via the JDK's `javax.imageio` with the stub as
    * fallback. All entry points sniff the container from the magic bytes
    * (`ImageIO.getImageReaders`); disk caching is disabled so per-row
    * decode never touches temp files. */
  object MediaCodec {
    javax.imageio.ImageIO.setUseCache(false)

    /** POSITIVE image-container guard: decode is attempted only when the
      * payload carries a real image signature, never because a decoder
      * merely didn't throw on arbitrary bytes (GIF/BMP headers have no
      * checksum, so "reader didn't throw" can hand back garbage dims
      * parsed out of text). PNG and JPEG magics contain non-text bytes
      * and stand alone; the two all-ASCII magics get corroboration —
      * BMP's declared file size must equal the payload length, and GIF
      * must end with its 0x3B trailer and have at least one non-printable
      * byte in the logical screen descriptor (true for any real GIF with
      * dims < 0x2020 or a global color table; a false negative only means
      * the conservative stub path). Deterministic by construction either
      * way — which is what the oracle-checked queries feeding text bytes
      * through here rely on. */
    private[operators] def looksLikeImage(b: Array[Byte]): Boolean = {
      def u(i: Int) = b(i) & 0xFF
      def printable(i: Int) = u(i) >= 0x20 && u(i) <= 0x7E
      if (b.length >= 8 && u(0) == 0x89 && u(1) == 'P' && u(2) == 'N' && u(3) == 'G')
        true
      else if (b.length >= 3 && u(0) == 0xFF && u(1) == 0xD8 && u(2) == 0xFF)
        true
      else if (b.length >= 14 &&
               (b.startsWith("GIF87a".getBytes) || b.startsWith("GIF89a".getBytes)))
        u(b.length - 1) == 0x3B && (6 until 13).exists(!printable(_))
      else if (b.length >= 14 && u(0) == 'B' && u(1) == 'M' &&
               (u(2) | (u(3) << 8) | (u(4) << 16) | (u(5).toLong << 24)) == b.length)
        true
      else false
    }

    /** (width, height, frames) — real for recognized image containers
      * (frames > 1 for animated GIF), stub otherwise. */
    def dims(bytes: Array[Byte]): (Int, Int, Int) = {
      if (!looksLikeImage(bytes)) return StubDecoder.decode(bytes)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) StubDecoder.decode(bytes)
        else {
          val r = readers.next()
          try {
            r.setInput(iis, /*seekForwardOnly=*/ false, /*ignoreMetadata=*/ true)
            val frames =
              try math.max(1, r.getNumImages(/*allowSearch=*/ true))
              catch { case _: Exception => 1 }
            (r.getWidth(0), r.getHeight(0), frames)
          } finally r.dispose()
        }
      } catch { case _: Exception => StubDecoder.decode(bytes) }
      finally iis.close()
    }

    /** Aspect-preserving resize of a real image: decode, bilinear-scale
      * so max(w, h) == min(maxDim, max(w, h)), re-encode as PNG. Returns
      * None for non-image payloads (callers stub those). */
    def resize(bytes: Array[Byte], maxDim: Int): Option[(Int, Int, Int, Int, Long)] = {
      val img =
        if (!looksLikeImage(bytes)) None
        else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        catch { case _: Exception => None }
      img.map { in =>
        val (w, h) = (in.getWidth, in.getHeight)
        val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
        val (ow, oh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
        val out = new java.awt.image.BufferedImage(ow, oh,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(in, 0, 0, ow, oh, null)
        } finally g.dispose()
        val buf = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", buf)
        (w, h, ow, oh, buf.size().toLong)
      }
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
        val (w, h, f) = MediaCodec.dims(r.media)
        digest.reset()
        val sha = digest.digest(r.media).map("%02x".format(_)).mkString
        MediaFeatures(r.doc_id, r.media_type, r.media.length.toLong, w, h, f, sha)
      }
    }
  }

  case class ResizedMedia(doc_id: Long, width: Int, height: Int,
                          out_width: Int, out_height: Int, n_bytes_out: Long)
  case class FrameRef(doc_id: Long, frame_idx: Int, frame_count: Int)

  /** Aspect-preserving resize. Real images go through
    * [[MediaCodec.resize]] (decode → bilinear scale → PNG re-encode;
    * `n_bytes_out` is the true re-encoded size). Non-image payloads keep
    * the stub dims and report the would-be RGB buffer size. */
  def resizeTo(rows: Dataset[MediaRow], maxDim: Int): Dataset[ResizedMedia] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        MediaCodec.resize(r.media, maxDim) match {
          case Some((w, h, ow, oh, nOut)) =>
            ResizedMedia(r.doc_id, w, h, ow, oh, nOut)
          case None =>
            val (w, h, _) = StubDecoder.decode(r.media)
            val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
            val (ow, oh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
            ResizedMedia(r.doc_id, w, h, ow, oh, ow.toLong * oh * 3)
        }
      }
    }
  }

  /** Frame sampling for multi-frame media: every `everyN`-th frame index,
    * exploded one row per sampled frame — the shape a caption/embedding
    * stage consumes. Frame counts are real for ImageIO-readable media
    * (animated GIF; 1 for static images) and stubbed for video containers
    * whose codecs aren't available. */
  def sampleFrames(rows: Dataset[MediaRow], everyN: Int): Dataset[FrameRef] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.flatMap { r =>
        val (_, _, frames) = MediaCodec.dims(r.media)
        (0 until frames by everyN).iterator.map(i => FrameRef(r.doc_id, i, frames))
      }
    }
  }
}
