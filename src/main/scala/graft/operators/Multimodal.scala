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

    /** 64-bit perceptual difference hash (dHash) of a real image —
      * the fingerprint half of near-duplicate IMAGE dedup
      * ([[graft.operators.Dedup.imagePhashDups]] pairs these through
      * the SimHash banded-Hamming kernel). INTEGER-EXACT by spec, so a
      * relational oracle re-derives the hash from planted closed-form
      * pixels:
      *
      *  1. decode via `javax.imageio` behind [[looksLikeImage]];
      *  2. luminance per pixel `(77·R + 150·G + 29·B) >> 8` (BT.601
      *     integer weights summing to 256, so a gray pixel R=G=B=v has
      *     luminance EXACTLY v — which is what the planted BMP fixtures
      *     exploit);
      *  3. average into a 9-column × 8-row grid — pixel (x, y) belongs
      *     to cell `(y·8/H, x·9/W)` (integer floor division; the
      *     mapping is surjective for W ≥ 9, H ≥ 8, so no cell is
      *     empty), cell value = `floor(sum / count)`;
      *  4. bit `r·8 + c` is set iff `cell(r, c) > cell(r, c+1)` —
      *     row-major brightness-falls-to-the-right, 8 comparisons per
      *     row over 9 columns = 64 bits.
      *
      * The grid average IS the fixed small resize (area box filter):
      * unlike `java.awt`'s opaque bilinear path it has a two-line
      * integer spec both engines can state. Refusals return null: a
      * payload that is not a recognized image, fails to decode, or is
      * smaller than the 9×8 grid (a cell would be empty — there is no
      * honest hash for it). */
    def dhash64(bytes: Array[Byte]): java.lang.Long = {
      if (!looksLikeImage(bytes)) return null
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img == null) return null
      val w = img.getWidth; val h = img.getHeight
      if (w < 9 || h < 8) return null
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      val sum = new Array[Long](72)
      val cnt = new Array[Long](72)
      var y = 0
      while (y < h) {
        val r = y * 8 / h
        var x = 0
        while (x < w) {
          val p = px(y * w + x)
          val lum = (77 * ((p >> 16) & 0xFF) + 150 * ((p >> 8) & 0xFF) +
            29 * (p & 0xFF)) >> 8
          val i = r * 9 + x * 9 / w
          sum(i) += lum; cnt(i) += 1
          x += 1
        }
        y += 1
      }
      var hash = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          if (sum(r * 9 + c) / cnt(r * 9 + c) >
              sum(r * 9 + c + 1) / cnt(r * 9 + c + 1))
            hash |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
      java.lang.Long.valueOf(hash)
    }

    /** 64-bit perceptual ENVELOPE hash of a decodable audio payload —
      * [[dhash64]]'s audio counterpart (the fingerprint half of
      * near-duplicate AUDIO dedup, paired by
      * [[graft.operators.Dedup.audioEnvDups]]). INTEGER-EXACT by spec,
      * so a relational oracle re-derives the hash from planted
      * closed-form samples:
      *
      *  1. decode interleaved samples through the SAME dispatch as
      *     [[graft.operators.Multimodal.audioStats]] — linear PCM
      *     ([[ContainerCodec.decodeWavPcm]]), G.711
      *     ([[ContainerCodec.decodeWavCompanded]]), IMA ADPCM
      *     ([[ContainerCodec.decodeWavAdpcm]]), AIFF big-endian PCM
      *     ([[ContainerCodec.decodeAiffPcm]] — so a WAV and an AIFF
      *     carrying identical samples fingerprint identically,
      *     spec-pinned);
      *  2. bucket sample i into segment `i·65/n` (integer floor — 65
      *     segments so 64 adjacent comparisons yield 64 bits, the
      *     9-column/8-comparison trick in time; surjective for
      *     n ≥ 65);
      *  3. segment value = `floor(sum(|sample|) / count)` — the mean
      *     absolute amplitude, i.e. the loudness envelope (abs, not
      *     sample², keeps every intermediate far inside 63 bits at any
      *     clip length);
      *  4. bit s (0..63) is set iff `env(s) > env(s+1)` —
      *     loudness-falls-to-the-right along time.
      *
      * The envelope shape survives amplitude-preserving re-encodes
      * (G.711/ADPCM round trips, small noise), which is what makes the
      * Hamming radius meaningful for near-dup audio. Refusals return
      * null: a payload the decode dispatch rejects, or fewer than 65
      * samples (a segment would be empty — no honest envelope). */
    def audioEnvHash64(bytes: Array[Byte]): java.lang.Long = {
      val dec = ContainerCodec.decodeWavPcm(bytes)
        .orElse(ContainerCodec.decodeWavCompanded(bytes))
        .orElse(ContainerCodec.decodeWavAdpcm(bytes))
        .orElse(ContainerCodec.decodeAiffPcm(bytes))
      dec match {
        case Some((_, samples)) if samples.length >= 65 =>
          val n = samples.length
          val sum = new Array[Long](65)
          val cnt = new Array[Long](65)
          var i = 0
          while (i < n) {
            val s = (i.toLong * 65L / n).toInt
            sum(s) += math.abs(samples(i).toLong); cnt(s) += 1
            i += 1
          }
          var hash = 0L
          var s = 0
          while (s < 64) {
            if (sum(s) / cnt(s) > sum(s + 1) / cnt(s + 1))
              hash |= 1L << s
            s += 1
          }
          java.lang.Long.valueOf(hash)
        case _ => null
      }
    }

    /** 64-bit perceptual CLIP signature of a decodable video payload —
      * [[dhash64]]'s video counterpart (the fingerprint half of
      * near-duplicate VIDEO dedup, paired by
      * [[graft.operators.Dedup.videoSigDups]]), closing the
      * text/image/audio/video fingerprint matrix. INTEGER-EXACT by
      * spec, so a relational oracle re-derives the signature from
      * planted closed-form frames:
      *
      *  1. walk the container's video frame chunks with the REAL
      *     header arithmetic ([[ContainerCodec.aviFrames]] — `##dc`/
      *     `##db` chunks of the `movi` LIST, flat or `rec `-interleaved,
      *     word-aligned, truncation-refusing);
      *  2. [[dhash64]] each frame payload through the real image decode
      *     (the per-frame fingerprint IS the image kernel — one spec,
      *     one oracle CTE, shared);
      *  3. clip bit b is set iff a STRICT MAJORITY of frames set bit b
      *     (`2·count > n_frames`; ties fall to 0) — the majority vote
      *     keeps the signature stable under frame drops/inserts at
      *     either end, which is what makes the Hamming radius
      *     meaningful for re-encoded or trimmed clips.
      *
      * Refusals return null: a payload with no walkable video frames,
      * or ANY frame the image kernel refuses (not a decodable image /
      * below the 9×8 grid) — a clip whose frames cannot all be
      * fingerprinted has no honest signature (the strict-all discipline
      * keeps the spec one sentence; partially-decodable clips are a
      * caller-side filter, not a silent guess here). */
    /** DISTINCT per-frame dHashes of a decodable video payload, in
      * first-appearance order — the frame-SET view of a clip behind
      * [[graft.operators.Dedup.videoFrameContainment]] (subclip/trim
      * detection: [[videoSigHash64]]'s majority vote is stable under
      * SMALL frame perturbations, but a clip sharing only half its
      * frames sits far outside any Hamming radius — frame-set
      * containment is the asymmetric signal for that, exactly as
      * n-gram containment is for quoted text). Same walk + per-frame
      * kernel + strict-all refusal contract as [[videoSigHash64]]:
      * null when there are no walkable frames or ANY frame refuses. */
    def videoFrameHashes64(bytes: Array[Byte]): Array[Long] = {
      val frames = ContainerCodec.aviFrames(bytes)
      if (frames.isEmpty) return null
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      val it = frames.iterator
      while (it.hasNext) {
        val (off, len) = it.next()
        val h = dhash64(java.util.Arrays.copyOfRange(
          bytes, off.toInt, (off + len).toInt))
        if (h == null) return null
        seen.add(h)
      }
      val out = new Array[Long](seen.size)
      var i = 0
      val si = seen.iterator()
      while (si.hasNext) { out(i) = si.next().longValue(); i += 1 }
      out
    }

    def videoSigHash64(bytes: Array[Byte]): java.lang.Long = {
      val frames = ContainerCodec.aviFrames(bytes)
      if (frames.isEmpty) return null
      val cnt = new Array[Int](64)
      var nf = 0
      val it = frames.iterator
      while (it.hasNext) {
        val (off, len) = it.next()
        val h = dhash64(java.util.Arrays.copyOfRange(
          bytes, off.toInt, (off + len).toInt))
        if (h == null) return null
        val hv = h.longValue()
        var b = 0
        while (b < 64) {
          if (((hv >>> b) & 1L) != 0L) cnt(b) += 1
          b += 1
        }
        nf += 1
      }
      var sig = 0L
      var b = 0
      while (b < 64) {
        if (2 * cnt(b) > nf) sig |= 1L << b
        b += 1
      }
      java.lang.Long.valueOf(sig)
    }
  }

  /** Parsed audio/video container header metadata. `duration_ms`,
    * `sample_rate`, `channels` are -1 where the container doesn't carry
    * them (MP4/WebM have no fmt chunk; `kind = "none"` has nothing). */
  case class ContainerMeta(kind: String, duration_ms: Long,
                           sample_rate: Int, channels: Int)

  /** Audio/video CONTAINER header parsing — pure JVM, public byte-format
    * specs only (RIFF/WAVE, ISO BMFF `moov/mvhd`, Matroska/WebM EBML).
    * Full codecs need external libraries this container doesn't ship;
    * container DURATION does not: it sits in fixed header fields. Same
    * positive-signature discipline as [[MediaCodec.looksLikeImage]] —
    * parse only payloads that present a real magic AND whose declared
    * structure stays inside the buffer; anything else returns
    * `ContainerMeta("none", -1, -1, -1)` so callers fall back to the
    * deterministic stub, never to garbage read out of text bytes. */
  object ContainerCodec {
    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
    private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    private def le32(b: Array[Byte], i: Int): Long =
      (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
        (u8(b, i + 3).toLong << 24)) & 0xFFFFFFFFL
    private def be32(b: Array[Byte], i: Int): Long =
      ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
        (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xFFFFFFFFL
    private def be64(b: Array[Byte], i: Int): Long =
      (be32(b, i) << 32) | be32(b, i + 4)
    private def fourcc(b: Array[Byte], i: Int): String =
      new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** RIFF/WAVE: `fmt ` chunk (sample rate, channels, bits/sample) +
      * `data` chunk size → exact PCM duration. Chunk sizes are validated
      * against the buffer; a truncated or lying header → None. */
    /** One parsed RIFF/WAVE layout: the metadata path reads the sizes,
      * the sample decoders also need WHERE the data chunk lives and the
      * format tag; the block codecs (IMA ADPCM) additionally need
      * `blockAlign` and the fmt extension's samples-per-block
      * (`spbExt` = -1 when the fmt chunk has no extension). */
    private[operators] final case class WavLayout(
      tag: Int, rate: Int, ch: Int, bits: Int,
      dataOff: Int, dataLen: Long, blockAlign: Int, spbExt: Int)

    private def wavChunks(b: Array[Byte]): Option[WavLayout] = {
      if (b.length < 44 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "WAVE")
        return None
      var off = 12
      var fmt: Option[WavLayout] = None
      var dataOff = -1
      var dataLen = -1L
      while (off + 8 <= b.length && (fmt.isEmpty || dataLen < 0)) {
        val id = fourcc(b, off)
        val sz = le32(b, off + 4)
        if (sz > b.length) return None // declared size can't fit the buffer
        if (id == "fmt " && sz >= 16 && off + 8 + 16 <= b.length) {
          // cbSize (+16) and wSamplesPerBlock (+18) exist only in the
          // extended fmt layout the block codecs write
          val spb = if (sz >= 20 && off + 8 + 20 <= b.length &&
              le16(b, off + 24) >= 2) le16(b, off + 26) else -1
          fmt = Some(WavLayout(le16(b, off + 8), le32(b, off + 12).toInt,
            le16(b, off + 10), le16(b, off + 22), -1, -1L,
            le16(b, off + 20), spb))
        } else if (id == "data") {
          if (off + 8 + sz > b.length) return None // declared past the buffer
          dataOff = off + 8
          dataLen = sz
        }
        off += 8 + sz.toInt + (sz.toInt & 1) // RIFF chunks are word-aligned
      }
      fmt.collect { case w if w.rate > 0 && w.ch > 0 && w.bits > 0 && dataLen >= 0 =>
        w.copy(dataOff = dataOff, dataLen = dataLen)
      }
    }

    private[operators] def parseWav(b: Array[Byte]): Option[ContainerMeta] =
      wavChunks(b).map { w =>
        ContainerMeta("wav",
          w.dataLen * 8000L / (w.rate.toLong * w.ch * w.bits), w.rate, w.ch)
      }

    /** REAL PCM sample decode — the payload family decodable with no
      * codec dependency: WAVE format tag 1, 16-bit signed LE or 8-bit
      * unsigned (rebased to signed), channels interleaved. G.711
      * companded tags decode via [[decodeWavCompanded]]; anything else
      * (float WAV, other compressed tags, truncated data) returns None
      * and falls to the documented stub path. */
    private[operators] def decodeWavPcm(b: Array[Byte])
        : Option[(ContainerMeta, Array[Int])] =
      wavChunks(b).collect {
        case WavLayout(1, rate, ch, bits, dataOff, dataLen, _, _)
            if (bits == 16 && dataLen % 2 == 0) || bits == 8 =>
          val n = if (bits == 16) (dataLen / 2).toInt else dataLen.toInt
          val out = new Array[Int](n)
          var i = 0
          if (bits == 16)
            while (i < n) {
              out(i) = (((b(dataOff + 2 * i) & 0xFF) |
                (b(dataOff + 2 * i + 1) << 8)).toShort).toInt
              i += 1
            }
          else
            while (i < n) { out(i) = (b(dataOff + i) & 0xFF) - 128; i += 1 }
          (ContainerMeta("wav", dataLen * 8000L / (rate.toLong * ch * bits),
            rate, ch), out)
      }

    /** G.711 expansion tables, built once from the published closed-form
      * arithmetic (the public-domain g711.c expressions). The spec pins
      * the JDK `javax.sound.sampled` codec ([[decodeWavCompandedJdk]])
      * bit-identical to these over all 256 codes of BOTH laws, so the
      * table lookup IS the real codec — minus the per-row
      * stream/SPI-provider machinery whose fixed cost dominated the
      * decode at scale (9.5× per data decade at the sf1 probe vs 1.6×
      * for the hand-rolled PCM twin on the same fixture shape). */
    private val UlawTable: Array[Short] = Array.tabulate(256) { b =>
      val u = (~b) & 0xFF
      val t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
      (if ((u & 0x80) != 0) 0x84 - t else t - 0x84).toShort
    }
    private val AlawTable: Array[Short] = Array.tabulate(256) { b =>
      val a = b ^ 0x55
      val seg = (a & 0x70) >> 4
      var t = (a & 0x0F) << 4
      if (seg == 0) t += 8 else { t += 0x108; if (seg > 1) t <<= seg - 1 }
      (if ((a & 0x80) != 0) t else -t).toShort
    }

    /** REAL compressed-payload audio decode — G.711 companded WAV
      * (format tag 7 = µ-law, 6 = A-law; ITU-T G.711, the 2:1 logarithmic
      * codec telephony payloads ship in) to 16-bit signed PCM via the
      * expansion tables above (spec-pinned identical to the JDK codec
      * chain AND the closed formulas, so the decode is deterministic and
      * reproducible by any engine: the multimodal_ulaw_stats oracle
      * recomputes the expansion arithmetically in SQL). Anything
      * malformed (wrong bits/sample, truncated data) returns None and
      * falls to the sentinel path, same contract as [[decodeWavPcm]]. */
    private[operators] def decodeWavCompanded(b: Array[Byte])
        : Option[(ContainerMeta, Array[Int])] =
      wavChunks(b).collect {
        case WavLayout(tag, rate, ch, 8, dataOff, dataLen, _, _)
            if tag == 6 || tag == 7 =>
          val table = if (tag == 7) UlawTable else AlawTable
          val n = dataLen.toInt
          val out = new Array[Int](n)
          var i = 0
          while (i < n) { out(i) = table(b(dataOff + i) & 0xFF).toInt; i += 1 }
          (ContainerMeta("wav", dataLen * 8000L / (rate.toLong * ch * 8),
            rate, ch), out)
      }

    /** The same decode through the JDK's `javax.sound.sampled` codec
      * chain — the REFERENCE implementation the table path is pinned
      * against in spec (all 256 codes, both laws). Not on the hot path:
      * `AudioSystem.getAudioInputStream` pays an SPI provider scan and
      * stream-chain setup per call. */
    private[operators] def decodeWavCompandedJdk(b: Array[Byte])
        : Option[(ContainerMeta, Array[Int])] =
      try wavChunks(b).collect {
        case WavLayout(tag, rate, ch, 8, dataOff, dataLen, _, _)
            if tag == 6 || tag == 7 =>
          import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
          val enc = if (tag == 7) AudioFormat.Encoding.ULAW
            else AudioFormat.Encoding.ALAW
          val src = new AudioFormat(enc, rate.toFloat, 8, ch, ch, rate.toFloat, false)
          val ais = new AudioInputStream(
            new java.io.ByteArrayInputStream(b, dataOff, dataLen.toInt),
            src, dataLen / ch)
          val dec = AudioSystem.getAudioInputStream(
            new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
              rate.toFloat, 16, ch, 2 * ch, rate.toFloat, false), ais)
          val bytes = dec.readAllBytes()
          val out = new Array[Int](bytes.length / 2)
          var i = 0
          while (i < out.length) {
            out(i) = (((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort).toInt
            i += 1
          }
          (ContainerMeta("wav", dataLen * 8000L / (rate.toLong * ch * 8),
            rate, ch), out)
      } catch { case _: Exception => None }

    /** IMA/DVI ADPCM step-size table (89 entries) and index-adjust
      * table, as published in the IMA Digital Audio Compatibility
      * Project ADPCM reference (the same tables every interoperable
      * decoder ships). */
    private val AdpcmStepTable: Array[Int] = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
      34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
      143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
      494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
      1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
      4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
      11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
      27086, 29794, 32767)
    private val AdpcmIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

    /** REAL block-codec audio decode — IMA ADPCM WAV (format tag 0x11,
      * 4 bits/sample, 4:1 vs 16-bit PCM; the published IMA/DVI
      * step-table algorithm). Mono blocks: a 4-byte header (int16 LE
      * predictor — which IS output sample 0 — plus a step index byte
      * and a reserved byte) followed by nibble bytes, LOW nibble first.
      * Each nibble advances the predictor by a step-table delta and the
      * index by the adjust table, both saturating — the decode is pure
      * integer arithmetic, so the multimodal_adpcm_stats oracle replays
      * it exactly as a recursive CTE in SQL (same contract as the G.711
      * closed form one tag over).
      *
      * Refusals (→ None → the documented sentinel path, same contract
      * as [[decodeWavPcm]]): bits/sample ≠ 4, more than one channel
      * (stereo interleaves 4-byte channel groups — out of scope for
      * the fixture-gated rung), blockAlign ≤ 4, a data chunk that is
      * not whole blocks, or an fmt-extension samples-per-block that
      * contradicts the block geometry. */
    private[operators] def decodeWavAdpcm(b: Array[Byte])
        : Option[(ContainerMeta, Array[Int])] =
      wavChunks(b).collect {
        case WavLayout(0x11, rate, 1, 4, dataOff, dataLen, ba, spbExt)
            if ba > 4 && dataLen > 0 && dataLen % ba == 0 &&
              (spbExt < 0 || spbExt == (ba - 4) * 2 + 1) =>
          val spb = (ba - 4) * 2 + 1
          val nBlocks = (dataLen / ba).toInt
          val out = new Array[Int](nBlocks * spb)
          var blk = 0
          while (blk < nBlocks) {
            val base = dataOff + blk * ba
            var pred = (((b(base) & 0xFF) | (b(base + 1) << 8)).toShort).toInt
            var idx = math.min(88, b(base + 2) & 0xFF)
            var o = blk * spb
            out(o) = pred; o += 1
            var nib = 0
            while (nib < spb - 1) {
              val byte = b(base + 4 + (nib >> 1)) & 0xFF
              val n = if ((nib & 1) == 0) byte & 0x0F else byte >> 4
              val step = AdpcmStepTable(idx)
              var diff = step >> 3
              if ((n & 1) != 0) diff += step >> 2
              if ((n & 2) != 0) diff += step >> 1
              if ((n & 4) != 0) diff += step
              pred = if ((n & 8) != 0) pred - diff else pred + diff
              if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
              idx += AdpcmIndexTable(n & 7)
              if (idx < 0) idx = 0 else if (idx > 88) idx = 88
              out(o) = pred; o += 1
              nib += 1
            }
            blk += 1
          }
          (ContainerMeta("wav", out.length * 1000L / rate, rate, 1), out)
      }

    /** ISO BMFF (MP4): walk top-level boxes to `moov`, then its children
      * to `mvhd`; duration = mvhd.duration / mvhd.timescale (v0 32-bit and
      * v1 64-bit layouts — ISO/IEC 14496-12 §8.2.2). */
    private[operators] def parseMp4(b: Array[Byte]): Option[ContainerMeta] = {
      if (b.length < 16 || fourcc(b, 4) != "ftyp") return None
      def findBox(from: Long, to: Long, name: String): Option[(Long, Long)] = {
        var off = from
        while (off + 8 <= to) {
          val sz0 = be32(b, off.toInt)
          val typ = fourcc(b, off.toInt + 4)
          val (body, end) =
            if (sz0 == 1L && off + 16 <= to) (off + 16, off + be64(b, off.toInt + 8))
            else if (sz0 == 0L) (off + 8, to) // box extends to EOF
            else (off + 8, off + sz0)
          if (end < body || end > to) return None // corrupt size
          if (typ == name) return Some((body, end))
          off = end
        }
        None
      }
      for {
        (moovB, moovE) <- findBox(0L, b.length.toLong, "moov")
        (h, hE) <- findBox(moovB, moovE, "mvhd")
        version = u8(b, h.toInt)
        (ts, dur) <- version match {
          case 0 if h + 4 + 8 + 8 <= hE =>
            Some((be32(b, h.toInt + 12), be32(b, h.toInt + 16)))
          case 1 if h + 4 + 16 + 12 <= hE =>
            Some((be32(b, h.toInt + 20), be64(b, h.toInt + 24)))
          case _ => None
        }
        if ts > 0
      } yield ContainerMeta("mp4", dur * 1000L / ts, -1, -1)
    }

    // Matroska/WebM element IDs (the spec's class IDs, marker bit kept)
    private val EbmlMagic = 0x1A45DFA3L
    private val SegmentId = 0x18538067L
    private val InfoId = 0x1549A966L
    private val TimecodeScaleId = 0x2AD7B1L
    private val DurationId = 0x4489L

    /** Matroska/WebM: EBML header → Segment → Info → TimecodeScale (ns per
      * tick, default 1,000,000) and Duration (float ticks). Variable-int
      * lengths per RFC 8794. */
    private[operators] def parseWebm(b: Array[Byte]): Option[ContainerMeta] = {
      if (b.length < 8 || be32(b, 0) != EbmlMagic) return None
      // EBML vint: leading zero bits of the first byte give the width.
      // IDs keep the marker bit (spec "class id"); sizes strip it.
      def vint(off: Long, keepMarker: Boolean): Option[(Long, Long)] = {
        if (off >= b.length) return None
        val first = u8(b, off.toInt)
        if (first == 0) return None
        val w = Integer.numberOfLeadingZeros(first) - 24 + 1
        if (off + w > b.length) return None
        var v = if (keepMarker) first.toLong else (first & (0xFF >>> w)).toLong
        for (i <- 1 until w) v = (v << 8) | u8(b, (off + i).toInt)
        Some((v, off + w))
      }
      def uintAt(off: Long, len: Long): Long = {
        var v = 0L
        for (i <- 0L until len) v = (v << 8) | u8(b, (off + i).toInt)
        v
      }
      def floatAt(off: Long, len: Long): Option[Double] = len match {
        case 4 => Some(java.lang.Float.intBitsToFloat(be32(b, off.toInt).toInt).toDouble)
        case 8 => Some(java.lang.Double.longBitsToDouble(be64(b, off.toInt)))
        case _ => None
      }
      // walk children of [from, to) for `id`; returns (bodyFrom, bodyTo).
      // An all-ones size vint is EBML's "unknown size" (RFC 8794 §6.2,
      // common in live-streamed Segments): the element extends to the
      // enclosing bound — the analogue of the MP4 sz0==0 extend-to-EOF
      // branch — rather than being a literal length that would fail the
      // bounds check and silently drop a valid file to the stub.
      def findEl(from: Long, to: Long, id: Long): Option[(Long, Long)] = {
        var off = from
        while (off < to) {
          val parsed = for {
            (elId, p1) <- vint(off, keepMarker = true)
            (sz0, p2) <- vint(p1, keepMarker = false)
            unknown = sz0 == (1L << (7 * (p2 - p1))) - 1
            sz = if (unknown) to - p2 else sz0
            if p2 + sz <= to
          } yield (elId, p2, p2 + sz)
          parsed match {
            case Some((elId, body, end)) =>
              if (elId == id) return Some((body, end))
              off = end
            case None => return None
          }
        }
        None
      }
      for {
        (hB, hE) <- findEl(0L, b.length.toLong, EbmlMagic) // skip EBML header
        (segB, segE) <- findEl(hE, b.length.toLong, SegmentId)
        (infoB, infoE) <- findEl(segB, segE, InfoId)
      } yield {
        var tcs = 1000000L // spec default: 1 ms ticks
        var durTicks: Option[Double] = None
        var off = infoB
        var ok = true
        while (ok && off < infoE) {
          (for {
            (elId, p1) <- vint(off, keepMarker = true)
            (sz, p2) <- vint(p1, keepMarker = false)
            if p2 + sz <= infoE
          } yield (elId, p2, sz)) match {
            case Some((elId, body, sz)) =>
              if (elId == TimecodeScaleId) tcs = uintAt(body, sz)
              else if (elId == DurationId) durTicks = floatAt(body, sz)
              off = body + sz
            case None => ok = false
          }
        }
        val ms = durTicks.map(d => math.round(d * tcs / 1e6)).getOrElse(-1L)
        ContainerMeta("webm", ms, -1, -1)
      }
    }

    /** RIFF/AVI `avih` main header (reference container for MJPEG
      * streams): kind="avi", duration_ms = µsPerFrame·totalFrames/1000;
      * sample_rate/channels are -1 (video). Positive guard: RIFF form
      * type 'AVI ' plus an `avih` inside the `hdrl` LIST. */
    private[operators] def parseAvi(b: Array[Byte]): Option[ContainerMeta] = {
      if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
        return None
      var off = 12L
      while (off + 8 <= b.length) {
        val sz = le32(b, off.toInt + 4)
        if (fourcc(b, off.toInt) == "LIST" && off + 12 <= b.length &&
            fourcc(b, off.toInt + 8) == "hdrl") {
          var in = off + 12
          val end = math.min(off + 8 + sz, b.length.toLong)
          while (in + 8 <= end) {
            val csz = le32(b, in.toInt + 4)
            // avih: dwMicroSecPerFrame at +0, dwTotalFrames at +16
            if (fourcc(b, in.toInt) == "avih" && in + 8 + 20 <= end)
              return Some(ContainerMeta("avi",
                le32(b, in.toInt + 8) * le32(b, in.toInt + 8 + 16) / 1000L,
                -1, -1))
            in += 8 + csz + (csz & 1)
          }
          return None
        }
        off += 8 + sz + (sz & 1)
      }
      None
    }

    /** Walk a RIFF/AVI `movi` LIST: absolute (payload offset, size) of
      * every video frame chunk (`##dc` compressed / `##db` DIB), in
      * stream order, honoring the word alignment of odd-sized chunks.
      * Interleaved AVIs group chunks of one interleave unit inside
      * nested `LIST rec ` sub-lists (AVI RIFF spec) — those are
      * descended into, recursively, so a standard-interleaved payload
      * yields the same one-row-per-frame walk as a flat movi. Only
      * fully-contained chunks are returned — a truncated tail is
      * dropped, never guessed at; non-AVI payloads yield Nil. Pure
      * header arithmetic: the frame bytes are never copied. */
    private[operators] def aviFrames(b: Array[Byte]): Seq[(Long, Long)] = {
      if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
        return Nil
      val out = Seq.newBuilder[(Long, Long)]
      // one chunk span (movi body or a rec sub-list body); recursion
      // depth is bounded by the nesting the header arithmetic admits
      // (each level strictly shrinks the span)
      def walk(from: Long, to: Long): Unit = {
        var in = from
        while (in + 8 <= to) {
          val cid = fourcc(b, in.toInt)
          val csz = le32(b, in.toInt + 4)
          if (cid == "LIST" && in + 12 <= to &&
              fourcc(b, in.toInt + 8) == "rec ")
            walk(in + 12, math.min(in + 8 + csz, to))
          else if ((cid.endsWith("dc") || cid.endsWith("db")) &&
                   in + 8 + csz <= to)
            out += ((in + 8, csz))
          in += 8 + csz + (csz & 1)
        }
      }
      var off = 12L
      while (off + 8 <= b.length) {
        val sz = le32(b, off.toInt + 4)
        if (fourcc(b, off.toInt) == "LIST" && off + 12 <= b.length &&
            fourcc(b, off.toInt + 8) == "movi")
          walk(off + 12, math.min(off + 8 + sz, b.length.toLong))
        off += 8 + sz + (sz & 1)
      }
      out.result()
    }

    /** JPEG SOF dimension scan over `len` bytes at `from`: (width,
      * height) from the first SOF frame header (C0-CF minus DHT/JPG/
      * DAC), a pure marker walk that skips APPn/DQT/DHT via their
      * declared lengths — no decoder, so it prices any encoder's
      * output identically. None when the slice is not a JPEG or no SOF
      * appears before SOS/EOI/end. */
    private[operators] def jpegSofDims(b: Array[Byte], from: Long,
                                       len: Long): Option[(Int, Int)] = {
      val end = math.min(from + len, b.length.toLong)
      if (from + 2 > end || u8(b, from.toInt) != 0xFF ||
          u8(b, from.toInt + 1) != 0xD8) return None
      var off = from + 2
      while (off + 4 <= end) {
        if (u8(b, off.toInt) != 0xFF) return None
        val marker = u8(b, off.toInt + 1)
        if (marker == 0xFF) off += 1 // fill byte
        else if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) off += 2
        else if (marker == 0xD9 || marker == 0xDA) return None // EOI/SOS first
        else {
          if (marker >= 0xC0 && marker <= 0xCF &&
              marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
            if (off + 9 > end) return None
            return Some((
              (u8(b, off.toInt + 7) << 8) | u8(b, off.toInt + 8),
              (u8(b, off.toInt + 5) << 8) | u8(b, off.toInt + 6)))
          }
          off += 2 + ((u8(b, off.toInt + 2) << 8) | u8(b, off.toInt + 3))
        }
      }
      None
    }

    // MPEG audio Layer III published tables (ISO/IEC 11172-3 / 13818-3):
    // bitrate kbps by index 1-14 (0 = free-format, 15 = invalid — both
    // refused) for MPEG-1 and MPEG-2/2.5; sample rates by version.
    private[operators] val Mp3BitrateV1: Array[Int] =
      Array(-1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)
    private[operators] val Mp3BitrateV2: Array[Int] =
      Array(-1, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, -1)
    private[operators] val Mp3Rates: Map[Int, Array[Int]] = Map(
      3 -> Array(44100, 48000, 32000),  // MPEG-1
      2 -> Array(22050, 24000, 16000),  // MPEG-2
      0 -> Array(11025, 12000, 8000))   // MPEG-2.5

    /** The per-frame walk behind [[parseMp3]]: (n_frames, total_samples,
      * sample_rate, channels) summed over the fully-contained Layer III
      * frame chain — the VBR-safe duration source (per-frame durations
      * summed, never bitrate×size guessed). Pure integer arithmetic over
      * the published tables; no codec library.
      *
      * Positive-signature guard: the chain must start EXACTLY at byte 0
      * or immediately after a well-formed ID3v2 tag (10-byte header,
      * synchsafe size, footer honored) — no sync-scanning, which would
      * bless arbitrary binary as audio. The walk stops at the first
      * header that is not a valid Layer III frame (reserved version or
      * layer, free-format or invalid bitrate index, reserved sample-rate
      * index, a sample-rate change mid-chain) and REFUSES a truncated
      * tail — a frame extending past the buffer is dropped, never
      * guessed at (the aviFrames discipline). None when no complete
      * frame parses. */
    private[operators] def mp3FrameChain(b: Array[Byte])
        : Option[(Int, Long, Int, Int)] = {
      var off = 0L
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
        // ID3v2: version(2) flags(1) synchsafe size(4); footer adds 10
        val size = ((b(6) & 0x7F).toLong << 21) | ((b(7) & 0x7F) << 14) |
          ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
        off = 10L + size + (if ((b(5) & 0x10) != 0) 10L else 0L)
      }
      var frames = 0; var samples = 0L; var rate = -1; var channels = -1
      var done = false
      while (!done && off + 4 <= b.length) {
        val h = be32(b, off.toInt)
        val version = ((h >> 19) & 3).toInt
        val layer = ((h >> 17) & 3).toInt
        val brIdx = ((h >> 12) & 15).toInt
        val srIdx = ((h >> 10) & 3).toInt
        val padding = ((h >> 9) & 1).toInt
        val mode = ((h >> 6) & 3).toInt
        if (((h >>> 21) & 0x7FF) != 0x7FF || version == 1 || layer != 1 ||
            brIdx == 0 || brIdx == 15 || srIdx == 3) done = true
        else {
          val sr = Mp3Rates(version)(srIdx)
          val br = (if (version == 3) Mp3BitrateV1 else Mp3BitrateV2)(brIdx) * 1000L
          val spf = if (version == 3) 1152L else 576L
          val frameLen = spf / 8L * br / sr + padding
          if (off + frameLen > b.length || (rate != -1 && sr != rate)) done = true
          else {
            if (rate == -1) { rate = sr; channels = if (mode == 3) 1 else 2 }
            frames += 1; samples += spf; off += frameLen
          }
        }
      }
      if (frames == 0) None else Some((frames, samples, rate, channels))
    }

    /** MP3 (MPEG audio Layer III) metadata from the frame-header chain:
      * duration = Σ per-frame samples / rate (VBR-safe), sample rate and
      * channel mode from the first frame. Same retreat discipline as
      * the AVI/EBML walks — header arithmetic only, no codec library;
      * Layer I/II and free-format streams are refused, not guessed. */
    private[operators] def parseMp3(b: Array[Byte]): Option[ContainerMeta] =
      mp3FrameChain(b).map { case (_, samples, rate, channels) =>
        ContainerMeta("mp3", samples * 1000L / rate, rate, channels)
      }

    /** FLAC STREAMINFO walk: `fLaC` magic, first metadata block MUST be
      * STREAMINFO (type 0, 34 bytes — the spec mandates it), duration
      * from the packed (sample rate: 20 bits, channels−1: 3,
      * bits/sample−1: 5, total samples: 36) field. Pure bit
      * arithmetic; a truncated header, a wrong first-block type, or a
      * zero sample rate refuses — never guesses. */
    private[operators] def parseFlac(b: Array[Byte]): Option[ContainerMeta] = {
      if (b.length < 8 + 34 || fourcc(b, 0) != "fLaC") return None
      if ((u8(b, 4) & 0x7F) != 0) return None // first block must be STREAMINFO
      val len = (u8(b, 5) << 16) | (u8(b, 6) << 8) | u8(b, 7)
      if (len != 34) return None
      // 16+16+24+24 bits of block/frame sizes precede the packed field
      val v = be64(b, 18)
      val rate = (v >>> 44).toInt
      if (rate == 0) return None
      val channels = ((v >>> 41) & 7).toInt + 1
      val samples = v & ((1L << 36) - 1)
      Some(ContainerMeta("flac", samples * 1000L / rate, rate, channels))
    }

    private def be16(b: Array[Byte], i: Int): Int =
      (u8(b, i) << 8) | u8(b, i + 1)

    /** AIFF (Audio IFF 1.3 — the big-endian IFF sibling of RIFF/WAVE):
      * `FORM<size>AIFF`, then 4cc+BE32-size chunks padded to even. The
      * `COMM` chunk (spec size 18) carries numChannels (BE16),
      * numSampleFrames (BE32), sampleSize (BE16), and the sample rate
      * as an **80-bit IEEE 754 EXTENDED float** — 1 sign + 15-bit
      * biased exponent + 64-bit mantissa with an EXPLICIT integer bit
      * (bit 63), the format's one genuinely exotic field. Audio rates
      * are integers, so the decode is EXACT integer arithmetic:
      * `rate = mantissa >>> (63 − (exp − 16383))`, refusing anything a
      * real rate cannot encode — negative sign, denormal/zero
      * mantissa, unset integer bit, exponent outside [0, 62] unbiased,
      * or fractional low bits. Refusals (missing/truncated COMM, bad
      * rate) → None → the `none` sentinel, same retreat discipline as
      * FLAC/MP3. */
    private[operators] def parseAiff(b: Array[Byte]): Option[ContainerMeta] = {
      if (b.length < 12 || fourcc(b, 0) != "FORM" ||
          fourcc(b, 8) != "AIFF") return None
      val end = math.min(b.length.toLong, 8L + be32(b, 4))
      var off = 12L
      while (off + 8 <= end) {
        val id = fourcc(b, off.toInt)
        val sz = be32(b, off.toInt + 4)
        if (id == "COMM") {
          if (sz < 18 || off + 8 + 18 > b.length) return None
          val p = off.toInt + 8
          val channels = be16(b, p)
          val frames = be32(b, p + 2)
          val se = be16(b, p + 8)
          val mant = be64(b, p + 10)
          if ((se & 0x8000) != 0) return None // negative rate
          val exp = (se & 0x7FFF) - 16383
          if (exp < 0 || exp > 62) return None // outside any audio rate
          if ((mant >>> 63) != 1L) return None // unnormalized mantissa
          val shift = 63 - exp
          if (shift < 64 && (mant & ((1L << shift) - 1)) != 0L)
            return None // fractional rate — no real audio container
          val rate = mant >>> shift
          if (rate <= 0 || rate > Int.MaxValue || channels <= 0) return None
          return Some(
            ContainerMeta("aiff", frames * 1000L / rate, rate.toInt, channels))
        }
        off += 8L + sz + (sz & 1L) // chunk bodies pad to even
      }
      None
    }

    /** REAL AIFF sample decode — the big-endian PCM the format's SSND
      * chunk carries in plain sign-magnitude-free two's complement
      * (AIFF-1.3 §SSND; AIFF 8-bit is SIGNED, unlike WAV's unsigned
      * 8-bit). COMM supplies channels/frames/bits and the 80-bit
      * extended-float rate (validated by [[parseAiff]] — this decoder
      * refuses whatever that walk refuses); SSND supplies the payload
      * behind its 8-byte offset/blockSize preamble, honoring a nonzero
      * declared offset. Refusals (→ None → the sentinel path, the
      * [[decodeWavPcm]] contract): bits other than 8/16, a missing
      * SSND, or declared frames·channels·bytes that overrun the SSND
      * data — a truncated payload is refused, never guessed at. */
    private[operators] def decodeAiffPcm(b: Array[Byte])
        : Option[(ContainerMeta, Array[Int])] = {
      val meta = parseAiff(b) match {
        case Some(m) => m
        case None => return None
      }
      val end = math.min(b.length.toLong, 8L + be32(b, 4))
      var off = 12L
      var bits = -1; var frames = -1L
      var dataOff = -1L; var dataLen = -1L
      while (off + 8 <= end) {
        val id = fourcc(b, off.toInt)
        val sz = be32(b, off.toInt + 4)
        // FIRST chunk of each kind wins, matching [[parseAiff]] (which
        // returns at the first COMM): a spurious second COMM must not
        // overwrite the geometry the meta walk validated, or the decode
        // would reinterpret the SSND payload against the wrong
        // frames/bits and emit garbage instead of the first-COMM truth
        if (id == "COMM" && bits < 0 && sz >= 18 && off + 8 + 18 <= b.length) {
          frames = be32(b, off.toInt + 10)
          bits = be16(b, off.toInt + 14)
        } else if (id == "SSND" && dataOff < 0 && sz >= 8 &&
                   off + 8 + sz <= b.length) {
          val o = be32(b, off.toInt + 8) // data offset within the chunk
          dataOff = off + 16 + o
          dataLen = sz - 8 - o
        }
        off += 8L + sz + (sz & 1L)
      }
      if ((bits != 8 && bits != 16) || frames < 0 || dataOff < 0 ||
          dataLen < 0) return None
      val n = frames * meta.channels
      if (n > Int.MaxValue / 2 || n * (bits / 8) > dataLen) return None
      val out = new Array[Int](n.toInt)
      var i = 0
      if (bits == 16)
        while (i < out.length) {
          val p = (dataOff + 2L * i).toInt
          out(i) = (((b(p) << 8) | (b(p + 1) & 0xFF)).toShort).toInt
          i += 1
        }
      else
        while (i < out.length) { out(i) = b((dataOff + i).toInt).toInt; i += 1 }
      Some((meta, out))
    }

    /** Positive-guard dispatch: WAV, MP4, WebM, AVI, FLAC, AIFF, MP3,
      * else `none` (stub path). MP3 last — a frame-sync chain is the
      * weakest magic of the seven. */
    def meta(bytes: Array[Byte]): ContainerMeta =
      parseWav(bytes).orElse(parseMp4(bytes)).orElse(parseWebm(bytes))
        .orElse(parseAvi(bytes)).orElse(parseFlac(bytes))
        .orElse(parseAiff(bytes))
        .orElse(parseMp3(bytes))
        .getOrElse(ContainerMeta("none", -1L, -1, -1))
  }

  /** Deterministic container BUILDERS — the planted-fixture side of the
    * oracle loop: wrap payload bytes in a real WAV/MP4/WebM header whose
    * declared fields are pure functions of the parameters, so a DuckDB
    * oracle can state the expected [[ContainerCodec]] output without
    * parsing bytes. Also the unit-test fixture source. */
  object ContainerFixtures {
    private def cc(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    private def le16b(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    private def le32b(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    private def be32b(v: Long) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)

    /** Canonical 44-byte-header PCM WAV around `data`. */
    def wav(sampleRate: Int, channels: Int, bitsPerSample: Int,
            data: Array[Byte]): Array[Byte] =
      wavFmt(1, sampleRate, channels, bitsPerSample, data)

    /** Uncompressed 24-bit grayscale BMP with pixel value `gray(x, y)`
      * (top-left origin, 0..255) in all three channels — the
      * PIXEL-EXACT planted-image fixture for the dHash oracle loop:
      * BMP is lossless, `javax.imageio` decodes it bit-for-bit, and a
      * gray pixel's BT.601 luminance is exactly its value (the weights
      * sum to 256), so DuckDB re-derives [[MediaCodec.dhash64]] from
      * the same `gray` formula without touching bytes. Rows are stored
      * bottom-up and padded to 4 bytes per the format; bfSize is
      * exact, which the strict-BMP positive guard requires. */
    def bmp(width: Int, height: Int, gray: (Int, Int) => Int): Array[Byte] = {
      val rowSize = (width * 3 + 3) / 4 * 4
      val total = 54 + rowSize * height
      val out = new java.io.ByteArrayOutputStream(total)
      out.write('B'); out.write('M')
      out.write(le32b(total.toLong))            // bfSize == payload length
      out.write(le32b(0L)); out.write(le32b(54L)) // reserved, bfOffBits
      out.write(le32b(40L))                     // biSize
      out.write(le32b(width.toLong)); out.write(le32b(height.toLong))
      out.write(le16b(1)); out.write(le16b(24)) // planes, bpp
      out.write(le32b(0L))                      // BI_RGB
      out.write(le32b((rowSize * height).toLong))
      out.write(le32b(2835L)); out.write(le32b(2835L))
      out.write(le32b(0L)); out.write(le32b(0L))
      val pad = rowSize - width * 3
      var row = height - 1
      while (row >= 0) { // bottom-up
        var x = 0
        while (x < width) {
          val v = gray(x, row) & 0xFF
          out.write(v); out.write(v); out.write(v) // B, G, R
          x += 1
        }
        var p = 0
        while (p < pad) { out.write(0); p += 1 }
        row -= 1
      }
      out.toByteArray
    }

    /** [[wav]] with an explicit format tag — fixtures for the companded
      * encodings (6 = G.711 A-law, 7 = G.711 µ-law, both 8 bits). */
    def wavFmt(fmtTag: Int, sampleRate: Int, channels: Int,
               bitsPerSample: Int, data: Array[Byte]): Array[Byte] = {
      val blockAlign = channels * bitsPerSample / 8
      val out = new java.io.ByteArrayOutputStream(44 + data.length)
      out.write(cc("RIFF")); out.write(le32b(36L + data.length)); out.write(cc("WAVE"))
      out.write(cc("fmt ")); out.write(le32b(16L))
      out.write(le16b(fmtTag)); out.write(le16b(channels))
      out.write(le32b(sampleRate.toLong)); out.write(le32b(sampleRate.toLong * blockAlign))
      out.write(le16b(blockAlign)); out.write(le16b(bitsPerSample))
      out.write(cc("data")); out.write(le32b(data.length.toLong)); out.write(data)
      out.toByteArray
    }

    /** IMA ADPCM WAV (format tag 0x11) with the EXTENDED fmt chunk
      * (cbSize=2 + wSamplesPerBlock) — one mono block per call: 4-byte
      * header (int16 LE predictor, step-index byte, reserved 0) +
      * `nibbles` data bytes, low nibble first. blockAlign = 4 + len. */
    def wavAdpcm(sampleRate: Int, predictor: Int, stepIndex: Int,
                 nibbles: Array[Byte]): Array[Byte] = {
      val blockAlign = 4 + nibbles.length
      val spb = nibbles.length * 2 + 1
      val out = new java.io.ByteArrayOutputStream(48 + 4 + nibbles.length)
      out.write(cc("RIFF")); out.write(le32b(40L + 4 + nibbles.length)); out.write(cc("WAVE"))
      out.write(cc("fmt ")); out.write(le32b(20L))
      out.write(le16b(0x11)); out.write(le16b(1))
      out.write(le32b(sampleRate.toLong))
      // byte rate for ADPCM: rate·blockAlign/samplesPerBlock, rounded
      out.write(le32b(sampleRate.toLong * blockAlign / spb))
      out.write(le16b(blockAlign)); out.write(le16b(4))
      out.write(le16b(2)); out.write(le16b(spb)) // cbSize, wSamplesPerBlock
      out.write(cc("data")); out.write(le32b(4L + nibbles.length))
      out.write(le16b(predictor & 0xFFFF)) // int16 LE
      out.write(stepIndex & 0xFF); out.write(0)
      out.write(nibbles)
      out.toByteArray
    }

    /** Byte offset of the FIRST movi frame payload in an [[aviMjpeg]]
      * fixture — a constant by construction (12-byte RIFF prefix +
      * 200-byte hdrl LIST + 12-byte movi LIST header + 8-byte chunk
      * header), so a relational oracle re-derives every later frame
      * offset from the planted sizes alone. */
    val AviMoviPayloadOffset: Long = 232L

    /** Minimal spec-shaped MJPEG-in-AVI container: RIFF('AVI '){ LIST
      * hdrl { avih(56), LIST strl { strh(56) 'vids'/'MJPG', strf(40)
      * BITMAPINFOHEADER biCompression='MJPG' } }, LIST movi { '00dc'
      * frame ... } } with spec word-alignment of odd-sized chunks.
      * fps = 10^6 / usPerFrame (dwRate/dwScale).
      * @param recGroup when > 0, frames are grouped `recGroup`-at-a-time
      *   inside nested `LIST rec ` sub-lists — the standard-interleave
      *   layout [[ContainerCodec.aviFrames]] must descend into; 0 = the
      *   flat movi layout. */
    def aviMjpeg(usPerFrame: Long, width: Int, height: Int,
                 frames: Seq[Array[Byte]], recGroup: Int = 0): Array[Byte] = {
      def chunk(id: String, body: Array[Byte]): Array[Byte] =
        cc(id) ++ le32b(body.length.toLong) ++ body ++
          (if ((body.length & 1) == 1) Array[Byte](0) else Array.empty[Byte])
      def list(kind: String, body: Array[Byte]): Array[Byte] =
        cc("LIST") ++ le32b(4L + body.length) ++ cc(kind) ++ body
      val avih = chunk("avih", le32b(usPerFrame) ++ le32b(0) ++ le32b(0) ++
        le32b(0) ++ le32b(frames.length.toLong) ++ le32b(0) ++ le32b(1) ++
        le32b(0) ++ le32b(width.toLong) ++ le32b(height.toLong) ++
        le32b(0) ++ le32b(0) ++ le32b(0) ++ le32b(0))
      val strh = chunk("strh", cc("vids") ++ cc("MJPG") ++ le32b(0) ++
        le16b(0) ++ le16b(0) ++ le32b(0) ++ le32b(usPerFrame) ++
        le32b(1000000L) ++ le32b(0) ++ le32b(frames.length.toLong) ++
        le32b(0) ++ le32b(0) ++ le32b(0) ++
        le16b(0) ++ le16b(0) ++ le16b(width) ++ le16b(height))
      val strf = chunk("strf", le32b(40L) ++ le32b(width.toLong) ++
        le32b(height.toLong) ++ le16b(1) ++ le16b(24) ++ cc("MJPG") ++
        le32b(width.toLong * height * 3) ++ le32b(0) ++ le32b(0) ++
        le32b(0) ++ le32b(0))
      val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
      val moviBody =
        if (recGroup <= 0) frames.iterator.flatMap(f => chunk("00dc", f)).toArray
        else frames.grouped(recGroup).flatMap(g =>
          list("rec ", g.iterator.flatMap(f => chunk("00dc", f)).toArray)).toArray
      val movi = list("movi", moviBody)
      val body = cc("AVI ") ++ hdrl ++ movi
      cc("RIFF") ++ le32b(body.length.toLong) ++ body
    }

    /** Total size of a [[synthJpegHeader]] frame beyond its filler. */
    val SynthJpegOverhead: Int = 23

    /** Synthetic JPEG-HEADED frame for the movi-walk gate: a real
      * SOI+SOF0 header declaring (width, height), `fillerLen` zero
      * bytes, EOI — [[ContainerCodec.jpegSofDims]] parses it exactly
      * like an encoder's output, and the total size is the
      * [[SynthJpegOverhead]]-plus-filler formula a relational oracle
      * can state. NOT a decodable image (no tables, no scan); the
      * decode tier is gated on real ImageIO output instead. */
    def synthJpegHeader(width: Int, height: Int, fillerLen: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(SynthJpegOverhead + fillerLen)
      out.write(0xFF); out.write(0xD8)       // SOI
      out.write(0xFF); out.write(0xC0)       // SOF0
      out.write(0); out.write(17)            // segment length: 8 + 3*3
      out.write(8)                           // sample precision
      out.write((height >> 8) & 0xFF); out.write(height & 0xFF)
      out.write((width >> 8) & 0xFF); out.write(width & 0xFF)
      out.write(3)                           // components
      var c = 1
      while (c <= 3) {
        out.write(c); out.write(0x11); out.write(if (c == 1) 0 else 1)
        c += 1
      }
      out.write(new Array[Byte](fillerLen))
      out.write(0xFF); out.write(0xD9)       // EOI
      out.toByteArray
    }

    /** Minimal spec-shaped FLAC: `fLaC` magic + a last-flagged
      * STREAMINFO block (type 0, 34 bytes; block sizes 4096/4096, frame
      * sizes 0 = unknown, the packed rate/channels/bps/total-samples
      * field, zero md5) + `payload` standing in for the frame section.
      * Every byte is a pure function of the parameters. */
    def flac(sampleRate: Int, channels: Int, bitsPerSample: Int,
             totalSamples: Long, payload: Array[Byte]): Array[Byte] = {
      require(sampleRate > 0 && sampleRate < (1 << 20), s"rate $sampleRate")
      require(channels >= 1 && channels <= 8, s"channels $channels")
      require(totalSamples >= 0 && totalSamples < (1L << 36))
      val out = new java.io.ByteArrayOutputStream(42 + payload.length)
      out.write(cc("fLaC"))
      out.write(0x80); out.write(0); out.write(0); out.write(34) // last, type 0, len 34
      out.write(Array[Byte](0x10, 0, 0x10, 0))                  // min/max block 4096
      out.write(new Array[Byte](6))                              // min/max frame unknown
      val v = (sampleRate.toLong << 44) | ((channels - 1).toLong << 41) |
        ((bitsPerSample - 1).toLong << 36) | totalSamples
      (0 until 8).foreach(i => out.write(((v >>> (8 * (7 - i))) & 0xFF).toInt))
      out.write(new Array[Byte](16))                             // md5 zero
      out.write(payload)
      out.toByteArray
    }

    private def be16b(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    private def be64b(v: Long) = be32b(v >>> 32) ++ be32b(v & 0xFFFFFFFFL)

    /** Minimal spec-shaped AIFF: `FORM { COMM(18), SSND(8+payload) }`
      * with the sample rate ENCODED as the 80-bit IEEE extended float
      * ([[ContainerCodec.parseAiff]] decodes it back): for an integer
      * rate, exponent = floor(log₂ rate), mantissa = rate shifted so
      * its msb sits at the explicit integer bit (bit 63). Declared
      * fields are pure functions of the parameters — the planted
      * fixture side of the oracle loop. */
    def aiff(sampleRate: Int, channels: Int, bitsPerSample: Int,
             totalFrames: Long, payload: Array[Byte]): Array[Byte] = {
      require(sampleRate > 0, s"rate $sampleRate")
      require(totalFrames >= 0 && totalFrames <= 0xFFFFFFFFL)
      val exp = 63 - java.lang.Long.numberOfLeadingZeros(sampleRate.toLong)
      val mant = sampleRate.toLong << (63 - exp)
      val comm = cc("COMM") ++ be32b(18) ++ be16b(channels) ++
        be32b(totalFrames) ++ be16b(bitsPerSample) ++
        be16b(16383 + exp.toInt) ++ be64b(mant)
      val pad = if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
      val ssnd = cc("SSND") ++ be32b(payload.length.toLong + 8) ++
        be32b(0) ++ be32b(0) ++ payload ++ pad
      val body = cc("AIFF") ++ comm ++ ssnd
      cc("FORM") ++ be32b(body.length.toLong) ++ body
    }

    /** MPEG-audio Layer III frame chain for the gate's planted-fixture
      * loop: one 4-byte header per `brIdxs` entry (sync, version from
      * `mpeg1`, Layer III, protection=1 i.e. no CRC, padding=0, the
      * given bitrate/sample-rate indices and channel `mode`) followed by
      * ZERO filler to the table-derived frame length — so a walker that
      * mis-steps lands on non-sync bytes and stops, making the frame
      * count itself gate the bitrate table. `id3Pad >= 0` prepends a
      * well-formed ID3v2.4 tag with that many padding bytes (synchsafe
      * size), exercising the tag skip. Every byte is a pure function of
      * the parameters — a relational oracle can restate the expected
      * frame count, duration, and total size from the published tables. */
    def mp3(mpeg1: Boolean, srIdx: Int, brIdxs: Seq[Int], mode: Int,
            id3Pad: Int = -1): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      if (id3Pad >= 0) {
        out.write('I'); out.write('D'); out.write('3')
        out.write(4); out.write(0)   // v2.4.0
        out.write(0)                 // flags: no footer
        out.write((id3Pad >> 21) & 0x7F); out.write((id3Pad >> 14) & 0x7F)
        out.write((id3Pad >> 7) & 0x7F); out.write(id3Pad & 0x7F)
        out.write(new Array[Byte](id3Pad))
      }
      val version = if (mpeg1) 3 else 2
      val sr = ContainerCodec.Mp3Rates(version)(srIdx)
      val brTable =
        if (mpeg1) ContainerCodec.Mp3BitrateV1 else ContainerCodec.Mp3BitrateV2
      val spf = if (mpeg1) 1152L else 576L
      brIdxs.foreach { brIdx =>
        require(brIdx >= 1 && brIdx <= 14, s"bitrate index $brIdx")
        val h = (0x7FFL << 21) | (version.toLong << 19) | (1L << 17) |
          (1L << 16) | (brIdx.toLong << 12) | (srIdx.toLong << 10) |
          (mode.toLong << 6)
        val frameLen = (spf / 8L * brTable(brIdx) * 1000L / sr).toInt
        out.write(((h >> 24) & 0xFF).toInt); out.write(((h >> 16) & 0xFF).toInt)
        out.write(((h >> 8) & 0xFF).toInt); out.write((h & 0xFF).toInt)
        out.write(new Array[Byte](frameLen - 4))
      }
      out.toByteArray
    }

    /** ftyp + moov/mvhd(v0) + mdat(payload); duration in `timescale` ticks. */
    def mp4(timescale: Long, duration: Long, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(16 + 116 + 8 + payload.length)
      out.write(be32b(16L)); out.write(cc("ftyp")); out.write(cc("isom")); out.write(be32b(0L))
      val mvhdBody = new java.io.ByteArrayOutputStream(100)
      mvhdBody.write(be32b(0L))              // version 0 + flags
      mvhdBody.write(be32b(0L)); mvhdBody.write(be32b(0L)) // ctime, mtime
      mvhdBody.write(be32b(timescale)); mvhdBody.write(be32b(duration))
      mvhdBody.write(be32b(0x00010000L))     // rate 1.0
      // volume 1.0 (2) + reserved (2) + reserved (8) — §8.2.2 layout
      mvhdBody.write(Array[Byte](0x01, 0x00, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
      // unity matrix + 6 predefined zeros + next_track_id
      Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L)
        .foreach(v => mvhdBody.write(be32b(v)))
      for (_ <- 0 until 6) mvhdBody.write(be32b(0L))
      mvhdBody.write(be32b(1L))
      val mvhd = mvhdBody.toByteArray
      out.write(be32b(8L + 8 + mvhd.length)); out.write(cc("moov"))
      out.write(be32b(8L + mvhd.length)); out.write(cc("mvhd")); out.write(mvhd)
      out.write(be32b(8L + payload.length)); out.write(cc("mdat")); out.write(payload)
      out.toByteArray
    }

    /** Minimal Matroska: EBML header (empty body) + Segment(Info(
      * TimecodeScale, Duration float64), Void(payload)). */
    def webm(timecodeScaleNs: Long, durationTicks: Double,
             payload: Array[Byte]): Array[Byte] = {
      def id(v: Long): Array[Byte] = {
        val w = (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8
        (1 to w).map(i => ((v >> (8 * (w - i))) & 0xFF).toByte).toArray
      }
      def size(v: Long): Array[Byte] = { // 4-byte length vint: 0x10xxxxxx...
        require(v < (1L << 28)); Array[Byte]((0x10 | (v >> 24)).toByte,
          ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      }
      def el(elId: Long, body: Array[Byte]): Array[Byte] =
        id(elId) ++ size(body.length.toLong) ++ body
      def uintBytes(v: Long): Array[Byte] = {
        val w = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
        (1 to w).map(i => ((v >> (8 * (w - i))) & 0xFF).toByte).toArray
      }
      val durBits = java.lang.Double.doubleToLongBits(durationTicks)
      val info = el(0x1549A966L,
        el(0x2AD7B1L, uintBytes(timecodeScaleNs)) ++
        el(0x4489L, (1 to 8).map(i => ((durBits >> (8 * (8 - i))) & 0xFF).toByte).toArray))
      el(0x1A45DFA3L, Array.empty[Byte]) ++
        el(0x18538067L, info ++ el(0xECL, payload)) // 0xEC = Void
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

  case class MediaContainer(doc_id: Long, kind: String, duration_ms: Long,
                            sample_rate: Int, channels: Int, n_bytes: Long)

  /** Integer-exact audio sample statistics — floats never cross the
    * engine boundary: `sum_sq` (Σ sample², exact in 63 bits for any
    * realistic clip) and `peak` let a consumer derive RMS/clipping
    * without the decoder. Integer PCM decodes directly
    * ([[ContainerCodec.decodeWavPcm]]); G.711 companded payloads decode
    * through the real JDK codec ([[ContainerCodec.decodeWavCompanded]]);
    * IMA ADPCM blocks decode through the published step-table algorithm
    * ([[ContainerCodec.decodeWavAdpcm]]); AIFF SSND payloads decode as
    * big-endian PCM ([[ContainerCodec.decodeAiffPcm]]). Non-decodable
    * payloads (no WAV/AIFF signature, unsupported compressed tag, float
    * samples) get the -1 sentinel row. */
  case class AudioStats(doc_id: Long, n_samples: Long, peak: Long,
                        sum_sq: Long, sample_rate: Int, channels: Int)

  /** Batch PCM decode + stats: per-partition streaming map, no shuffle —
    * same stage shape as [[extractFeatures]], but the samples are REAL
    * decoded PCM ([[ContainerCodec.decodeWavPcm]]). */
  def audioStats(rows: Dataset[MediaRow]): Dataset[AudioStats] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        ContainerCodec.decodeWavPcm(r.media)
          .orElse(ContainerCodec.decodeWavCompanded(r.media))
          .orElse(ContainerCodec.decodeWavAdpcm(r.media))
          .orElse(ContainerCodec.decodeAiffPcm(r.media)) match {
          case Some((meta, samples)) =>
            var peak = 0L
            var sumSq = 0L
            var i = 0
            while (i < samples.length) {
              val v = samples(i).toLong
              if (math.abs(v) > peak) peak = math.abs(v)
              sumSq += v * v
              i += 1
            }
            AudioStats(r.doc_id, samples.length.toLong, peak, sumSq,
              meta.sample_rate, meta.channels)
          case None => AudioStats(r.doc_id, -1L, -1L, -1L, -1, -1)
        }
      }
    }
  }

  /** Container-header metadata extraction ([[ContainerCodec]]): per-row
    * fixed-header parse, no decode, no shuffle — a pure map stage. */
  def containerMeta(rows: Dataset[MediaRow]): Dataset[MediaContainer] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val m = ContainerCodec.meta(r.media)
        MediaContainer(r.doc_id, m.kind, m.duration_ms, m.sample_rate,
          m.channels, r.media.length.toLong)
      }
    }
  }

  case class Mp3Meta(doc_id: Long, kind: String, duration_ms: Long,
                     sample_rate: Int, channels: Int, n_frames: Int,
                     n_bytes: Long)

  /** MP3 metadata incl. the walked frame COUNT — the count is what puts
    * the bitrate-table stepping itself under the gate: a wrong table
    * entry mis-steps the walk onto zero filler, fails the sync check,
    * and shortens the chain. Non-MP3 payloads report the `none`
    * sentinel row (walk refused), never a guess. */
  def mp3Meta(rows: Dataset[MediaRow]): Dataset[Mp3Meta] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        ContainerCodec.mp3FrameChain(r.media) match {
          case Some((frames, samples, rate, channels)) =>
            Mp3Meta(r.doc_id, "mp3", samples * 1000L / rate, rate, channels,
              frames, r.media.length.toLong)
          case None =>
            Mp3Meta(r.doc_id, "none", -1L, -1, -1, 0, r.media.length.toLong)
        }
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

  case class MjpegFrame(doc_id: Long, frame_idx: Int, frame_count: Int,
                        byte_offset: Long, n_bytes: Long,
                        width: Int, height: Int)

  /** MJPEG-in-AVI frame walk — the hash-gated metadata tier, same
    * discipline as the WAV/MP4/WebM header parses: one row per
    * `##dc`/`##db` chunk of the `movi` LIST with its absolute payload
    * offset, size, and the JPEG SOF dims parsed from the chunk bytes
    * themselves ([[ContainerCodec.jpegSofDims]]). Integer-exact, no
    * decoder, pure per-partition map (no shuffle; frame bytes are
    * never copied). Non-AVI payloads yield no rows; chunks without a
    * parseable SOF report -1×-1. */
  def mjpegFrames(rows: Dataset[MediaRow]): Dataset[MjpegFrame] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.flatMap { r =>
        val fs = ContainerCodec.aviFrames(r.media)
        fs.iterator.zipWithIndex.map { case ((off, len), i) =>
          val (w, h) = ContainerCodec.jpegSofDims(r.media, off, len)
            .getOrElse((-1, -1))
          MjpegFrame(r.doc_id, i, fs.length, off, len, w, h)
        }
      }
    }
  }

  case class MjpegFrameStats(doc_id: Long, frame_idx: Int, frame_count: Int,
                             width: Int, height: Int,
                             sum_r: Long, sum_g: Long, sum_b: Long, n_px: Long)

  /** REAL JDK decode of every `everyN`-th MJPEG frame: ImageIO JPEG
    * decode of the chunk payload in place, exact integer channel sums
    * over the decoded pixels. JPEG is lossy and its decoded pixels are
    * decoder-dependent, so these stats are gated by BOUNDS (a
    * violations row against the planted frame colors) rather than
    * value-pinning — the G.711/ADPCM discipline adapted to a lossy
    * codec; the dims and frame count remain exact. Undecodable frames
    * report the -1 sentinel row. */
  def mjpegFrameStats(rows: Dataset[MediaRow],
                      everyN: Int): Dataset[MjpegFrameStats] = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.flatMap { r =>
        val fs = ContainerCodec.aviFrames(r.media)
        fs.iterator.zipWithIndex
          .filter { case (_, i) => i % everyN == 0 }
          .map { case ((off, len), i) =>
            val img =
              try Option(javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(r.media, off.toInt, len.toInt)))
              catch { case _: Exception => None }
            img match {
              case Some(im) =>
                var sr = 0L; var sg = 0L; var sb = 0L
                var y = 0
                while (y < im.getHeight) {
                  var x = 0
                  while (x < im.getWidth) {
                    val p = im.getRGB(x, y)
                    sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
                    x += 1
                  }
                  y += 1
                }
                MjpegFrameStats(r.doc_id, i, fs.length, im.getWidth,
                  im.getHeight, sr, sg, sb,
                  im.getWidth.toLong * im.getHeight)
              case None =>
                MjpegFrameStats(r.doc_id, i, fs.length, -1, -1, -1L, -1L, -1L, -1L)
            }
          }
      }
    }
  }
}
