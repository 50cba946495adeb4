package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Real-codec tests for [[Multimodal]]: the JDK's `javax.imageio` must
  * decode genuine PNG/GIF bytes (true dimensions, frame counts, resize),
  * while non-image payloads keep the deterministic stub path the
  * oracle-checked queries rely on. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 17) & 0xFFFFFF)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  private def animatedGif(w: Int, h: Int, frames: Int): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val buf = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until frames).foreach { i =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try { g.setColor(new java.awt.Color(i * 50 % 255, 0, 0)); g.fillRect(0, 0, w, h) }
      finally g.dispose()
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    buf.toByteArray
  }

  private def mediaDs(rows: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    rows.map { case (id, b) => Multimodal.MediaRow(id, b, "image/png", "test") }.toDS()
  }

  test("extractFeatures decodes real PNG dimensions via ImageIO") {
    val bytes = png(100, 40)
    val f = Multimodal.extractFeatures(mediaDs(Seq((1L, bytes)))).collect().head
    assert(f.width == 100 && f.height == 40 && f.n_frames == 1)
    assert(f.n_bytes == bytes.length.toLong)
  }

  test("resizeTo really scales a PNG (aspect preserved, PNG re-encoded)") {
    val r = Multimodal.resizeTo(mediaDs(Seq((1L, png(100, 40)))), maxDim = 50)
      .collect().head
    assert(r.width == 100 && r.height == 40)
    assert(r.out_width == 50 && r.out_height == 20)
    // real PNG re-encode: a plausible compressed size, not the stub's ow*oh*3
    assert(r.n_bytes_out > 0 && r.n_bytes_out != r.out_width.toLong * r.out_height * 3)
    // decode the SAME bytes through the codec directly and cross-check
    val Some((w, h, ow, oh, n)) = Multimodal.MediaCodec.resize(png(100, 40), 50)
    assert((w, h, ow, oh) == ((100, 40, 50, 20)) && n == r.n_bytes_out)
  }

  test("resizeTo never upscales (maxDim larger than the image)") {
    val r = Multimodal.resizeTo(mediaDs(Seq((1L, png(30, 20)))), maxDim = 224)
      .collect().head
    assert(r.out_width == 30 && r.out_height == 20)
  }

  test("sampleFrames counts animated GIF frames for real") {
    val gif = animatedGif(8, 8, 7)
    assert(Multimodal.MediaCodec.dims(gif) == ((8, 8, 7)))
    val refs = Multimodal.sampleFrames(mediaDs(Seq((1L, gif))), everyN = 2)
      .collect().sortBy(_.frame_idx)
    assert(refs.map(_.frame_idx).toSeq == Seq(0, 2, 4, 6))
    assert(refs.forall(_.frame_count == 7))
  }

  test("non-image payloads fall back to the deterministic stub") {
    val bytes = "hello world".getBytes("UTF-8")
    assert(Multimodal.MediaCodec.dims(bytes) == Multimodal.StubDecoder.decode(bytes))
    assert(Multimodal.MediaCodec.resize(bytes, 224).isEmpty)
  }

  test("ASCII image magics in plain text do NOT trigger the decoder") {
    // GIF's magic is printable ASCII and its header has no checksum — a
    // GIF reader would happily parse garbage dims out of these bytes, so
    // the positive guard must refuse them (stub path) while still
    // accepting real GIF/BMP files.
    for (s <- Seq("GIF89a text that merely mentions the format",
                  "GIF87a9999 more words here padding padding",
                  "BM bitmap discussion in prose with words")) {
      val b = s.getBytes("UTF-8")
      assert(!Multimodal.MediaCodec.looksLikeImage(b), s)
      assert(Multimodal.MediaCodec.dims(b) == Multimodal.StubDecoder.decode(b))
    }
    // and the real containers still pass the guard
    assert(Multimodal.MediaCodec.looksLikeImage(png(5, 5)))
    assert(Multimodal.MediaCodec.looksLikeImage(animatedGif(8, 8, 2)))
  }

  test("BMP guard requires the declared size to match the payload") {
    val img = new java.awt.image.BufferedImage(6, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", buf)
    val bmp = buf.toByteArray
    assert(Multimodal.MediaCodec.looksLikeImage(bmp))
    assert(Multimodal.MediaCodec.dims(bmp) == ((6, 4, 1)))
    // truncate: declared size no longer matches → guard refuses
    val cut = bmp.dropRight(1)
    assert(!Multimodal.MediaCodec.looksLikeImage(cut))
  }

  import Multimodal.{ContainerCodec, ContainerFixtures, ContainerMeta}

  test("WAV fmt+data chunks give exact PCM duration") {
    // 16 kHz stereo 16-bit: 64,000 bytes/s → 128,000 bytes = 2,000 ms
    val m = ContainerCodec.meta(ContainerFixtures.wav(16000, 2, 16,
      Array.fill[Byte](128000)(7)))
    assert(m == ContainerMeta("wav", 2000L, 16000, 2))
    // odd data length exercises the word-aligned chunk walk
    val odd = ContainerCodec.meta(ContainerFixtures.wav(8000, 1, 8,
      Array.fill[Byte](8001)(1)))
    assert(odd == ContainerMeta("wav", 1000L, 8000, 1)) // 8001*8000/(8000*8) ms
  }

  test("WAV guard refuses truncated and size-lying headers") {
    val ok = ContainerFixtures.wav(8000, 1, 16, Array.fill[Byte](100)(3))
    assert(ContainerCodec.meta(ok).kind == "wav")
    // data chunk declares more bytes than the buffer holds
    val lying = ok.clone()
    lying(43) = 0x7F // bump the data-size high byte way past the payload
    assert(ContainerCodec.meta(lying).kind == "none")
    assert(ContainerCodec.meta(ok.take(30)).kind == "none")
  }

  test("MP4 mvhd v0 duration, builder roundtrip") {
    // timescale 600, duration 1500 ticks → 2500 ms
    val m = ContainerCodec.meta(ContainerFixtures.mp4(600, 1500, "xyz".getBytes))
    assert(m == ContainerMeta("mp4", 2500L, -1, -1))
  }

  test("MP4 mvhd v1 (64-bit) layout parses") {
    // hand-build: ftyp + moov(mvhd v1): ctime/mtime 8 bytes each
    def be32(v: Long) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    val body = be32(0x01000000L) ++ // version 1, flags 0
      Array.fill[Byte](16)(0) ++    // ctime, mtime (64-bit)
      be32(1000L) ++                // timescale
      be32(0L) ++ be32(90000L) ++   // duration (64-bit) = 90,000 ticks
      Array.fill[Byte](80)(0)
    val mvhd = be32(8L + body.length) ++ "mvhd".getBytes ++ body
    val moov = be32(8L + mvhd.length) ++ "moov".getBytes ++ mvhd
    val ftyp = be32(16L) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0L)
    assert(ContainerCodec.meta(ftyp ++ moov) == ContainerMeta("mp4", 90000L, -1, -1))
  }

  test("WebM TimecodeScale × Duration, builder roundtrip + spec default") {
    // 1 ms ticks, 1234 ticks → 1234 ms
    val m = ContainerCodec.meta(ContainerFixtures.webm(1000000L, 1234.0, "pp".getBytes))
    assert(m == ContainerMeta("webm", 1234L, -1, -1))
    // non-default scale: 0.5 ms ticks → halve
    val half = ContainerCodec.meta(ContainerFixtures.webm(500000L, 1234.0, Array.empty))
    assert(half == ContainerMeta("webm", 617L, -1, -1))
  }

  test("WebM unknown-size Segment (all-ones size vint) extends to the enclosing bound") {
    // live-streamed Matroska writes the Segment with the RFC 8794 §6.2
    // "unknown size" vint (all value bits set) because the final length
    // isn't known at write time; the parser must treat it as
    // extends-to-EOF, not as a literal length that fails the bounds check
    val b = ContainerFixtures.webm(1000000L, 1234.0, "payload".getBytes)
    // layout: EBML header el (4B id + 4B size + empty body) = bytes 0..8,
    // then Segment id (4B) at 8..12 and its 4-byte size vint at 12..16
    assert((b(8) & 0xFF) == 0x18 && (b(12) & 0xF0) == 0x10,
      "fixture layout assumption (Segment size vint at offset 12)")
    val unknown = b.clone()
    unknown(12) = 0x1F.toByte; unknown(13) = 0xFF.toByte
    unknown(14) = 0xFF.toByte; unknown(15) = 0xFF.toByte
    assert(ContainerCodec.meta(unknown) == ContainerMeta("webm", 1234L, -1, -1),
      "unknown-size Segment must parse identically to the sized one")
    // truncation hygiene is preserved: a child whose LITERAL size lies
    // past EOF still refuses (only the reserved all-ones pattern extends)
    val lying = b.clone()
    lying(15) = (lying(15) | 0x40).toByte // inflate Segment size, not all-ones
    assert(ContainerCodec.meta(lying).kind == "none")
  }

  test("PCM decode: 16-bit signed LE roundtrip, 8-bit rebase, refusals") {
    // 16-bit: full signed range survives the byte roundtrip
    val vals = Array(-32768, -1, 0, 1, 127, 128, 32767, -12345)
    val data16 = new Array[Byte](vals.length * 2)
    vals.zipWithIndex.foreach { case (v, i) =>
      data16(2 * i) = (v & 0xFF).toByte; data16(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val Some((m16, s16)) =
      ContainerCodec.decodeWavPcm(ContainerFixtures.wav(44100, 1, 16, data16))
    assert(s16.toSeq == vals.toSeq && m16.sample_rate == 44100)
    // 8-bit WAV is UNSIGNED by spec: rebased to signed around 128
    val Some((_, s8)) = ContainerCodec.decodeWavPcm(
      ContainerFixtures.wav(8000, 1, 8, Array[Byte](0, 127.toByte, 128.toByte, 255.toByte)))
    assert(s8.toSeq == Seq(-128, -1, 0, 127))
    // refusals -> None (stub path), never garbage samples:
    // odd byte count for 16-bit, non-WAV payload
    assert(ContainerCodec.decodeWavPcm(
      ContainerFixtures.wav(8000, 1, 16, Array[Byte](1, 2, 3))).isEmpty)
    assert(ContainerCodec.decodeWavPcm("not a wav at all".getBytes).isEmpty)
    // non-PCM format tag (3 = IEEE float): patch fmt tag at offset 20
    val float32 = ContainerFixtures.wav(8000, 1, 16, data16).clone()
    float32(20) = 3
    assert(ContainerCodec.decodeWavPcm(float32).isEmpty)
    // ... while the metadata path still reads the container header
    assert(ContainerCodec.meta(float32).kind == "wav")
  }

  test("randomized WAV/MP4 builder-parser roundtrips match the spec arithmetic") {
    val rnd = new scala.util.Random(83)
    for (_ <- 1 to 40) {
      val rate = 4000 + rnd.nextInt(92000)
      val ch = 1 + rnd.nextInt(8)
      val bits = Seq(8, 16, 24, 32)(rnd.nextInt(4))
      val data = Array.fill[Byte](rnd.nextInt(5000))(rnd.nextInt().toByte)
      val m = ContainerCodec.meta(ContainerFixtures.wav(rate, ch, bits, data))
      assert(m == ContainerMeta("wav",
        data.length * 8000L / (rate.toLong * ch * bits), rate, ch),
        s"rate=$rate ch=$ch bits=$bits n=${data.length}")
      val ts = 1 + rnd.nextInt(1000000)
      val dur = rnd.nextLong(1L << 31)
      val mp = ContainerCodec.meta(ContainerFixtures.mp4(ts, dur,
        Array.fill[Byte](rnd.nextInt(200))(1)))
      assert(mp == ContainerMeta("mp4", dur * 1000L / ts, -1, -1), s"ts=$ts dur=$dur")
    }
  }

  test("garbage and raw-text bytes fall back to the stub path") {
    for (junk <- Seq("plain document text, nothing binary".getBytes,
        Array.fill[Byte](64)(0x41), Array.empty[Byte],
        "RIFFxxxxNOPE".getBytes, // RIFF magic without WAVE
        png(5, 5) /* image, not an av container */ ))
      assert(ContainerCodec.meta(junk).kind == "none")
  }

  test("G.711 companded decode is bit-identical to the published expansion, all 256 codes") {
    // the oracle recomputes these closed forms in SQL — this is the pin
    // that makes the JDK codec cross-engine reproducible
    def ulawRef(b: Int): Int = {
      val u = (~b) & 0xFF
      val t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
      if ((u & 0x80) != 0) 0x84 - t else t - 0x84
    }
    def alawRef(b: Int): Int = {
      val a = b ^ 0x55
      val seg = (a & 0x70) >> 4
      var t = (a & 0x0F) << 4
      if (seg == 0) t += 8
      else { t += 0x108; if (seg > 1) t <<= seg - 1 }
      if ((a & 0x80) != 0) t else -t
    }
    val codes = Array.tabulate[Byte](256)(_.toByte)
    val uWav = ContainerFixtures.wavFmt(7, 8000, 1, 8, codes)
    val aWav = ContainerFixtures.wavFmt(6, 8000, 1, 8, codes)
    val Some((mu, uSamples)) = ContainerCodec.decodeWavCompanded(uWav)
    assert(mu == ContainerMeta("wav", 32L, 8000, 1)) // 256 samples @ 8 kHz
    assert(uSamples.toSeq == (0 until 256).map(ulawRef),
      "table ULAW decode must equal the G.711 mu-law expansion")
    val Some((_, aSamples)) = ContainerCodec.decodeWavCompanded(aWav)
    assert(aSamples.toSeq == (0 until 256).map(alawRef),
      "table ALAW decode must equal the G.711 A-law expansion")
    // three-way pin: the JDK javax.sound codec chain (the reference
    // implementation) emits the very same samples the hot-path table
    // does — the table IS the real codec, minus per-row SPI setup
    assert(ContainerCodec.decodeWavCompandedJdk(uWav).get._2.toSeq
      == uSamples.toSeq, "JDK ULAW chain must match the table path")
    assert(ContainerCodec.decodeWavCompandedJdk(aWav).get._2.toSeq
      == aSamples.toSeq, "JDK ALAW chain must match the table path")
    // malformed companded payloads keep the sentinel contract
    assert(ContainerCodec.decodeWavCompanded(
      ContainerFixtures.wavFmt(7, 8000, 1, 16, codes)).isEmpty,
      "mu-law is 8-bit by definition; 16-bit tag-7 must refuse")
    assert(ContainerCodec.decodeWavCompanded(
      ContainerFixtures.wav(8000, 1, 8, codes)).isEmpty,
      "integer PCM is decodeWavPcm's job, not the codec chain's")
  }

  test("audioStats decodes companded payloads and sentinels unsupported tags") {
    import spark.implicits._
    val ulaw = Array[Byte](0x00, 0x7F, 0xFF.toByte, 0x80.toByte)
    val rows = Seq(
      Multimodal.MediaRow(1L, ContainerFixtures.wavFmt(7, 8000, 1, 8, ulaw), "audio/ulaw", "s"),
      Multimodal.MediaRow(2L, ContainerFixtures.wavFmt(3, 8000, 1, 32,
        Array.fill[Byte](8)(1)), "audio/float", "s"))
      .toDS()
    val got = Multimodal.audioStats(rows).collect().sortBy(_.doc_id)
    // 0x00 -> -32124 (mu-law negative max under the g711.c 16-bit
    // convention), 0x7F -> -0, 0xFF -> +0, 0x80 -> +32124
    assert(got(0).n_samples == 4 && got(0).peak == 32124 &&
      got(0).sum_sq == 2 * 32124L * 32124L && got(0).sample_rate == 8000)
    assert(got(1).n_samples == -1L, "float WAV stays on the sentinel path")
  }

  test("IMA ADPCM decode matches hand-computed step-table vectors") {
    import Multimodal.{ContainerCodec, ContainerFixtures}
    // pred0=0, idx0=0, one byte 0x81 → nibbles (low first) 1 then 8:
    // step=7: n=1 → diff=0+1=1 → pred 1, idx clamps at 0;
    //         n=8 → diff=0, sign bit → pred stays 1
    val Some((m1, s1)) = ContainerCodec.decodeWavAdpcm(
      ContainerFixtures.wavAdpcm(8000, 0, 0, Array(0x81.toByte)))
    assert(s1.toSeq == Seq(0, 1, 1) && m1.sample_rate == 8000 && m1.channels == 1)
    // pred0=100, idx0=10 (step 19), byte 0xF7 → nibbles 7 then 15:
    // n=7 → diff=2+4+9+19=34 → 134, idx 18 (step 41);
    // n=15 → diff=5+10+20+41=76, sign → 58
    val Some((_, s2)) = ContainerCodec.decodeWavAdpcm(
      ContainerFixtures.wavAdpcm(8000, 100, 10, Array(0xF7.toByte)))
    assert(s2.toSeq == Seq(100, 134, 58))
    // saturation at both rails + index clamp at 88
    val Some((_, s3)) = ContainerCodec.decodeWavAdpcm(
      ContainerFixtures.wavAdpcm(8000, 32760, 88, Array(0x07.toByte)))
    assert(s3.toSeq == Seq(32760, 32767, 32767))
    val Some((_, s4)) = ContainerCodec.decodeWavAdpcm(
      ContainerFixtures.wavAdpcm(8000, -32760, 88, Array(0x0F.toByte)))
    assert(s4(1) == -32768)
    // an out-of-range header step index clamps to 88 (what shipping
    // decoders do), bit-identical to an explicit 88
    val wild = ContainerCodec.decodeWavAdpcm(
      ContainerFixtures.wavAdpcm(8000, 5, 200, Array(0x3C.toByte, 0x55.toByte)))
    val pinned = ContainerCodec.decodeWavAdpcm(
      ContainerFixtures.wavAdpcm(8000, 5, 88, Array(0x3C.toByte, 0x55.toByte)))
    assert(wild.get._2.toSeq == pinned.get._2.toSeq)
  }

  test("IMA ADPCM refusals: stereo, wrong bits, ragged data, lying fmt extension") {
    import Multimodal.{ContainerCodec, ContainerFixtures}
    val good = ContainerFixtures.wavAdpcm(8000, 0, 0, Array.fill[Byte](8)(0x20))
    assert(ContainerCodec.decodeWavAdpcm(good).isDefined)
    def patched(off: Int, v: Int): Array[Byte] = {
      val b = good.clone(); b(off) = v.toByte; b
    }
    // layout: RIFF(12) | fmt hdr(8) tag@20 ch@22 rate@24 byterate@28
    //         blockAlign@32 bits@34 cbSize@36 spb@38 | data hdr@40 size@44
    assert(ContainerCodec.decodeWavAdpcm(patched(22, 2)).isEmpty,
      "stereo block interleave is out of the real-decode scope")
    assert(ContainerCodec.decodeWavAdpcm(patched(34, 8)).isEmpty,
      "IMA ADPCM is 4 bits/sample by definition")
    assert(ContainerCodec.decodeWavAdpcm(patched(44, good(44) - 1)).isEmpty,
      "a data chunk that is not whole blocks must refuse")
    assert(ContainerCodec.decodeWavAdpcm(patched(38, 3)).isEmpty,
      "an fmt-extension samples-per-block contradicting the geometry must refuse")
    // PCM/companded decoders must not claim the 0x11 tag and vice versa
    assert(ContainerCodec.decodeWavPcm(good).isEmpty)
    assert(ContainerCodec.decodeWavCompanded(good).isEmpty)
  }

  test("audioStats decodes ADPCM payloads through the codec chain") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, Multimodal.ContainerFixtures.wavAdpcm(
        8000, 100, 10, Array(0xF7.toByte)), "audio/adpcm", "s"))
      .toDS()
    val got = Multimodal.audioStats(rows).collect()
    // samples 100, 134, 58 (pinned above)
    assert(got(0).n_samples == 3 && got(0).peak == 134 &&
      got(0).sum_sq == 100L * 100 + 134L * 134 + 58L * 58 &&
      got(0).sample_rate == 8000 && got(0).channels == 1)
  }

  test("containerMeta dataset operator over planted rows") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, ContainerFixtures.wav(8000, 1, 16, Array.fill[Byte](16000)(0)), "audio/wav", "s"),
      Multimodal.MediaRow(2L, ContainerFixtures.mp4(600, 600, Array.empty), "video/mp4", "s"),
      Multimodal.MediaRow(3L, "not a container".getBytes, "text/plain", "s"))
      .toDS()
    val got = Multimodal.containerMeta(rows).collect().sortBy(_.doc_id)
    assert(got.map(_.kind).toSeq == Seq("wav", "mp4", "none"))
    assert(got(0).duration_ms == 1000L && got(0).sample_rate == 8000)
    assert(got(1).duration_ms == 1000L)
    assert(got(2).duration_ms == -1L)
  }
  private def jpegFill(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", buf)
    buf.toByteArray
  }

  test("MJPEG-in-AVI: movi walk yields exact offsets, sizes and SOF dims") {
    import spark.implicits._
    import Multimodal.{ContainerCodec, ContainerFixtures}
    val frames = Seq(jpegFill(32, 16, 0x804020), jpegFill(48, 32, 0x123456),
      ContainerFixtures.synthJpegHeader(640, 480, 7)) // odd size -> padding
    val avi = ContainerFixtures.aviMjpeg(40000L, 48, 32, frames)
    assert(ContainerCodec.meta(avi).kind == "avi")
    assert(ContainerCodec.meta(avi).duration_ms == 120L) // 3 frames at 25fps
    val rows = Seq(Multimodal.MediaRow(7L, avi, "video/avi", "s")).toDS()
    val got = Multimodal.mjpegFrames(rows).collect().sortBy(_.frame_idx)
    assert(got.length == 3 && got.forall(_.frame_count == 3))
    assert(got(0).byte_offset == ContainerFixtures.AviMoviPayloadOffset)
    var expect = ContainerFixtures.AviMoviPayloadOffset
    got.zip(frames).foreach { case (f, bytes) =>
      assert(f.byte_offset == expect && f.n_bytes == bytes.length)
      // the walked slice IS the planted frame, byte for byte
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(avi, f.byte_offset.toInt,
          (f.byte_offset + f.n_bytes).toInt), bytes))
      expect += 8 + bytes.length + (bytes.length & 1)
    }
    // SOF dims from real encoder output AND from the synthetic header
    assert((got(0).width, got(0).height) == (32, 16))
    assert((got(1).width, got(1).height) == (48, 32))
    assert((got(2).width, got(2).height) == (640, 480))
  }

  test("MJPEG refusals: non-AVI, truncated tail, non-JPEG chunk") {
    import spark.implicits._
    import Multimodal.{ContainerCodec, ContainerFixtures}
    assert(ContainerCodec.aviFrames(
      ContainerFixtures.wav(8000, 1, 16, new Array[Byte](64))).isEmpty)
    assert(ContainerCodec.aviFrames("RIFFjunk".getBytes).isEmpty)
    // truncation mid-frame drops ONLY the partial tail chunk
    val frames = Seq(jpegFill(16, 16, 0xFF0000), jpegFill(16, 16, 0x00FF00))
    val avi = ContainerFixtures.aviMjpeg(40000L, 16, 16, frames)
    val cut = java.util.Arrays.copyOfRange(avi, 0, avi.length - 4)
    assert(ContainerCodec.aviFrames(cut).length == 1)
    // a frame that is not a JPEG reports -1 dims, never a crash
    val bad = ContainerFixtures.aviMjpeg(40000L, 8, 8, Seq("not jpeg!!".getBytes))
    val got = Multimodal.mjpegFrames(
      Seq(Multimodal.MediaRow(1L, bad, "video/avi", "s")).toDS()).collect()
    assert(got.length == 1 && got(0).width == -1 && got(0).height == -1)
  }

  test("MJPEG decode stats: solid frames round-trip within JPEG tolerance") {
    import spark.implicits._
    import Multimodal.ContainerFixtures
    val (r, g, b) = (200, 64, 130)
    val avi = ContainerFixtures.aviMjpeg(40000L, 32, 16,
      Seq(jpegFill(32, 16, (r << 16) | (g << 8) | b), jpegFill(32, 16, 0)))
    val got = Multimodal.mjpegFrameStats(
        Seq(Multimodal.MediaRow(1L, avi, "video/avi", "s")).toDS(), everyN = 1)
      .collect().sortBy(_.frame_idx)
    assert(got.length == 2 && got.forall(_.frame_count == 2))
    assert(got.forall(f => f.width == 32 && f.height == 16 && f.n_px == 512))
    def mean(s: Long) = s.toDouble / 512
    assert(math.abs(mean(got(0).sum_r) - r) <= 12 &&
      math.abs(mean(got(0).sum_g) - g) <= 12 &&
      math.abs(mean(got(0).sum_b) - b) <= 12, s"frame0 ${got(0)}")
    assert(mean(got(1).sum_r) <= 12 && mean(got(1).sum_g) <= 12 &&
      mean(got(1).sum_b) <= 12, s"frame1 ${got(1)}")
    val sampled = Multimodal.mjpegFrameStats(
      Seq(Multimodal.MediaRow(1L, avi, "video/avi", "s")).toDS(), everyN = 2)
      .collect()
    assert(sampled.map(_.frame_idx).toSeq == Seq(0))
  }
  test("jpegSofDims matches ImageIO dimensions on random encoder output") {
    val rnd = new scala.util.Random(12345)
    (1 to 20).foreach { _ =>
      val w = 1 + rnd.nextInt(200); val h = 1 + rnd.nextInt(120)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, rnd.nextInt() & 0xFFFFFF)
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", buf)
      val b = buf.toByteArray
      assert(Multimodal.ContainerCodec.jpegSofDims(b, 0, b.length.toLong)
        .contains((w, h)), s"dims mismatch at ${w}x$h")
    }
    // non-JPEG and truncated-before-SOF slices refuse, never guess
    assert(Multimodal.ContainerCodec
      .jpegSofDims("hello world bytes".getBytes, 0, 17).isEmpty)
    assert(Multimodal.ContainerCodec
      .jpegSofDims(Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte), 0, 3).isEmpty)
  }

  test("interleaved AVI: the movi walk descends into nested 'LIST rec ' groups") {
    import Multimodal.{ContainerCodec, ContainerFixtures}
    val frames = (0 until 5).map(i =>
      ContainerFixtures.synthJpegHeader(16 + i, 12 + i, 10 + 3 * i))
    val flat = ContainerFixtures.aviMjpeg(40000L, 16, 12, frames)
    val rec = ContainerFixtures.aviMjpeg(40000L, 16, 12, frames, recGroup = 2)
    val flatWalk = ContainerCodec.aviFrames(flat)
    val recWalk = ContainerCodec.aviFrames(rec)
    // same frames, same sizes, same stream order — only offsets shift
    // by the rec-list headers
    assert(recWalk.length == 5 && flatWalk.length == 5)
    assert(recWalk.map(_._2) == flatWalk.map(_._2))
    recWalk.zip(frames).foreach { case ((off, len), f) =>
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(rec, off.toInt, (off + len).toInt), f))
    }
    // truncation inside a rec group still drops only the partial tail
    val cut = java.util.Arrays.copyOfRange(rec, 0, rec.length - 4)
    assert(ContainerCodec.aviFrames(cut).length == 4)
  }

  test("mjpegFrameStats rejects a non-positive sampling stride") {
    import spark.implicits._
    val rows = Seq(Multimodal.MediaRow(1L, Array[Byte](1, 2), "x", "s")).toDS()
    intercept[IllegalArgumentException] { Multimodal.mjpegFrameStats(rows, 0) }
    intercept[IllegalArgumentException] { Multimodal.mjpegFrameStats(rows, -3) }
  }

  test("FLAC STREAMINFO: packed-field roundtrip, truncation and type refusals") {
    import Multimodal.{ContainerCodec, ContainerFixtures}
    // 44.1 kHz stereo, 441,000 samples = exactly 10 s
    val f = ContainerFixtures.flac(44100, 2, 16, 441000L, "frames!".getBytes)
    assert(f.length == 42 + 7)
    assert(ContainerCodec.parseFlac(f).contains(
      Multimodal.ContainerMeta("flac", 10000L, 44100, 2)))
    assert(ContainerCodec.meta(f).kind == "flac")
    // 96 kHz mono, odd sample count floors the millisecond division
    val g = ContainerFixtures.flac(96000, 1, 24, 96001L, Array.empty[Byte])
    assert(ContainerCodec.parseFlac(g).contains(
      Multimodal.ContainerMeta("flac", 1000L, 96000, 1)))
    // refusals: truncated header, non-STREAMINFO first block, zero rate,
    // wrong magic — None every time, never a guess
    assert(ContainerCodec.parseFlac(java.util.Arrays.copyOfRange(f, 0, 20)).isEmpty)
    val wrongType = f.clone(); wrongType(4) = (0x80 | 4).toByte // VORBIS_COMMENT
    assert(ContainerCodec.parseFlac(wrongType).isEmpty)
    val zeroRate = ContainerFixtures.flac(1, 2, 16, 100L, Array.empty[Byte])
    // clear the whole 20-bit rate field (bytes 18-19 + byte 20's top nibble)
    zeroRate(18) = 0; zeroRate(19) = 0
    zeroRate(20) = (zeroRate(20) & 0x0F).toByte
    assert(ContainerCodec.parseFlac(zeroRate).isEmpty,
      "a zero rate must refuse, not divide")
    assert(ContainerCodec.parseFlac("fLaX junk data junk data junk data junk data".getBytes).isEmpty)
  }

  test("MP3 frame chain: VBR Layer III walk over both version tables, ID3 skip") {
    import Multimodal.{ContainerCodec, ContainerFixtures}
    // MPEG-1, 44100 Hz, stereo, VBR 128/320/32 kbps + ID3v2 tag
    val v1 = ContainerFixtures.mp3(mpeg1 = true, srIdx = 0,
      brIdxs = Seq(9, 14, 1), mode = 0, id3Pad = 5)
    // frame lengths: 144 * br / 44100 → 417, 1044, 104
    assert(v1.length == 15 + 417 + 1044 + 104)
    assert(ContainerCodec.mp3FrameChain(v1).contains((3, 3456L, 44100, 2)))
    // duration: 3 frames × 1152 samples at 44.1 kHz = 78 ms
    assert(ContainerCodec.parseMp3(v1).contains(
      Multimodal.ContainerMeta("mp3", 78L, 44100, 2)))
    // MPEG-2, 24000 Hz, mono (mode 3), 2 × 64 kbps, no tag:
    // frame length 72 * 64000 / 24000 = 192; 2 × 576 samples = 48 ms
    val v2 = ContainerFixtures.mp3(mpeg1 = false, srIdx = 1,
      brIdxs = Seq(8, 8), mode = 3)
    assert(v2.length == 384)
    assert(ContainerCodec.mp3FrameChain(v2).contains((2, 1152L, 24000, 1)))
    assert(ContainerCodec.parseMp3(v2).contains(
      Multimodal.ContainerMeta("mp3", 48L, 24000, 1)))
    // the dispatch picks it up, after the stronger-magic containers
    assert(ContainerCodec.meta(v1).kind == "mp3")
  }

  test("MP3 refusals: truncation drops the tail frame; garbage and non-L3 refused") {
    import Multimodal.{ContainerCodec, ContainerFixtures}
    val m = ContainerFixtures.mp3(mpeg1 = true, srIdx = 2,
      brIdxs = Seq(5, 5, 5), mode = 1)
    // chop 3 bytes: the LAST frame is incomplete — dropped, never guessed
    val cut = java.util.Arrays.copyOfRange(m, 0, m.length - 3)
    assert(ContainerCodec.mp3FrameChain(cut).contains((2, 2304L, 32000, 2)))
    // a chain that never completes one frame is refused outright
    assert(ContainerCodec.mp3FrameChain(
      java.util.Arrays.copyOfRange(m, 0, 10)).isEmpty)
    // raw text, WAV bytes, and an ID3 tag followed by garbage all refuse
    assert(ContainerCodec.parseMp3("plain text document".getBytes).isEmpty)
    assert(ContainerCodec.parseMp3(
      ContainerFixtures.wav(8000, 1, 16, new Array[Byte](32))).isEmpty)
    val id3junk = "ID3".getBytes ++ Array[Byte](4, 0, 0, 0, 0, 0, 2) ++
      "xxgarbage".getBytes
    assert(ContainerCodec.parseMp3(id3junk).isEmpty)
    // free-format (bitrate index 0) and invalid (15) headers stop the walk
    def header(brIdx: Int): Array[Byte] = {
      val h = (0x7FFL << 21) | (3L << 19) | (1L << 17) | (1L << 16) |
        (brIdx.toLong << 12)
      Array(((h >> 24) & 0xFF).toByte, ((h >> 16) & 0xFF).toByte,
        ((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte) ++ new Array[Byte](100)
    }
    assert(ContainerCodec.mp3FrameChain(header(0)).isEmpty)
    assert(ContainerCodec.mp3FrameChain(header(15)).isEmpty)
  }

  // ------------------------------------------------- perceptual dHash ----

  test("dhash64: monotone gradients hit the closed-form extremes") {
    import Multimodal.{ContainerFixtures, MediaCodec}
    // 9×8: every x is its own grid column; brightness RISES to the right
    // → no cell is brighter than its right neighbor → hash 0
    val rising = ContainerFixtures.bmp(9, 8, (x, _) => x * 10)
    assert(MediaCodec.dhash64(rising) == 0L)
    // FALLS to the right → every one of the 64 comparisons fires → all
    // bits set (hash == -1 in two's complement, incl. the sign bit 63)
    val falling = ContainerFixtures.bmp(9, 8, (x, _) => 80 - x * 10)
    assert(MediaCodec.dhash64(falling) == -1L)
  }

  test("dhash64 is container-independent: BMP and PNG of the same pixels agree") {
    import Multimodal.{ContainerFixtures, MediaCodec}
    def gray(x: Int, y: Int): Int = (x * 53 + y * 29 + 7) % 251
    val viaBmp = ContainerFixtures.bmp(23, 17, gray)
    val img = new java.awt.image.BufferedImage(23, 17,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 23; y <- 0 until 17) {
      val v = gray(x, y); img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val a = MediaCodec.dhash64(viaBmp); val b = MediaCodec.dhash64(buf.toByteArray)
    assert(a != null && a == b)
  }

  test("dhash64 refusals: below-grid images and non-images return null") {
    import Multimodal.{ContainerFixtures, MediaCodec}
    assert(MediaCodec.dhash64(ContainerFixtures.bmp(8, 8, (x, y) => x + y)) == null)
    assert(MediaCodec.dhash64(ContainerFixtures.bmp(20, 7, (x, y) => x + y)) == null)
    assert(MediaCodec.dhash64("not an image at all".getBytes) == null)
    assert(MediaCodec.dhash64(
      ContainerFixtures.wav(8000, 1, 16, new Array[Byte](64))) == null)
  }

  test("imagePhashDups finds the planted near-dup and not the inverse image") {
    import spark.implicits._
    import Multimodal.ContainerFixtures
    def base(x: Int, y: Int): Int = (x * 37 + y * 23 + 11) % 251
    val near = ContainerFixtures.bmp(27, 21, (x, y) =>
      // brighten only grid cell (0,0) — flips at most bit 0's comparison
      if (x * 9 / 27 == 0 && y * 8 / 21 == 0) (base(x, y) + 128) % 251
      else base(x, y))
    val rows = Seq(
      Multimodal.MediaRow(1L, ContainerFixtures.bmp(27, 21, base), "image/bmp", "t"),
      Multimodal.MediaRow(2L, near, "image/bmp", "t"),
      Multimodal.MediaRow(3L, ContainerFixtures.bmp(27, 21,
        (x, y) => 250 - base(x, y)), "image/bmp", "t"),
      Multimodal.MediaRow(4L, ContainerFixtures.bmp(8, 8, base), "image/bmp", "t")
    ).toDS().toDF()
    // pinned 16-bit bands: the scale-aware width needs no count at n=4
    val pairs = Dedup.imagePhashDups(rows, "doc_id", "media",
        maxHamming = 3, bucketBits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 <= 1)
    // the inverse image is far from both in Hamming space
    val h = Dedup.imagePhashDocs(rows, "doc_id", "media")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h.keySet == Set(1L, 2L, 3L)) // the 8×8 refusal row never hashes
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) > 3)
  }

  /** Pack closed-form 16-bit samples into a PCM WAV. */
  private def pcmWav(n: Int, v: Int => Int): Array[Byte] = {
    val data = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = v(i)
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    Multimodal.ContainerFixtures.wav(8000, 1, 16, data)
  }

  test("AIFF COMM: 80-bit extended-float rate roundtrip, truncation and bad-rate refusals") {
    import Multimodal.{ContainerCodec, ContainerFixtures}
    // every real-rate table entry roundtrips exactly through the
    // extended-float encode/decode (incl. the non-power-of-2 ones)
    for (rate <- Seq(8000, 11025, 22050, 44100, 48000, 96000, 192000)) {
      val m = ContainerCodec.parseAiff(
        ContainerFixtures.aiff(rate, 2, 16, 12345L, "payload!".getBytes))
      assert(m.exists(c => c.kind == "aiff" && c.sample_rate == rate &&
        c.channels == 2 && c.duration_ms == 12345L * 1000 / rate), s"rate $rate: $m")
    }
    val full = ContainerFixtures.aiff(44100, 1, 16, 1000L, "x".getBytes)
    // truncated COMM (FORM magic intact) refuses
    assert(ContainerCodec.parseAiff(full.take(30)).isEmpty)
    // negative-rate sign bit refuses (byte 20 is the exponent hi byte)
    val neg = full.clone(); neg(20 + 8) = (neg(20 + 8) | 0x80).toByte
    assert(ContainerCodec.parseAiff(neg).isEmpty)
    // zeroed mantissa (unnormalized) refuses
    val zm = full.clone(); for (i <- 0 until 8) zm(20 + 10 + i) = 0
    assert(ContainerCodec.parseAiff(zm).isEmpty)
    // fractional rate (a low mantissa bit set) refuses
    val fr = full.clone(); fr(20 + 17) = (fr(20 + 17) | 1).toByte
    assert(ContainerCodec.parseAiff(fr).isEmpty)
    // dispatch: aiff recognized, wav not hijacked, garbage falls through
    assert(ContainerCodec.meta(full).kind == "aiff")
    assert(ContainerCodec.meta(
      ContainerFixtures.wav(8000, 1, 16, new Array[Byte](64))).kind == "wav")
    assert(ContainerCodec.meta("FORMxxxxJUNK".getBytes ++ full.drop(12)).kind == "none")
  }

  test("audioEnvHash64: monotone envelopes hit the closed-form extremes") {
    import Multimodal.MediaCodec
    // 65 samples: each its own segment; |amplitude| RISES along time →
    // no segment louder than its successor → hash 0
    assert(MediaCodec.audioEnvHash64(pcmWav(65, i => i * 100)) == 0L)
    // FALLS along time → all 64 comparisons fire → hash == -1
    assert(MediaCodec.audioEnvHash64(pcmWav(65, i => 6500 - i * 100)) == -1L)
    // abs() is part of the spec: a falling NEGATIVE ramp is a RISING
    // envelope (|v| grows) → hash 0 again
    assert(MediaCodec.audioEnvHash64(pcmWav(65, i => -i * 100)) == 0L)
  }

  test("audioEnvHash64 is codec-independent: the envelope survives a G.711 round trip") {
    import Multimodal.{ContainerFixtures, MediaCodec}
    // µ-law code bytes whose expanded loudness falls in clear steps:
    // high-magnitude codes first (u-law 0x00 family is loudest)
    val n = 130
    val codes = Array.tabulate(n)(i => ((i * 130 / n) & 0x7F).toByte)
    val ulaw = ContainerFixtures.wavFmt(7, 8000, 1, 8, codes)
    val hUlaw = MediaCodec.audioEnvHash64(ulaw)
    // the same EXPANDED samples as linear PCM must hash identically —
    // the fingerprint sees samples, not the container encoding
    val expanded = Multimodal.ContainerCodec.decodeWavCompanded(ulaw).get._2
    val hPcm = MediaCodec.audioEnvHash64(pcmWav(n, expanded))
    assert(hUlaw != null && hUlaw == hPcm)
  }

  test("audioEnvHash64 refusals: short clips and non-audio return null") {
    import Multimodal.{ContainerFixtures, MediaCodec}
    assert(MediaCodec.audioEnvHash64(pcmWav(64, i => i)) == null)
    assert(MediaCodec.audioEnvHash64("not audio".getBytes) == null)
    // a float-format WAV is outside the decodable family
    assert(MediaCodec.audioEnvHash64(
      ContainerFixtures.wavFmt(3, 8000, 1, 32, new Array[Byte](520))) == null)
    // an image is not audio
    assert(MediaCodec.audioEnvHash64(
      ContainerFixtures.bmp(16, 12, (x, y) => x + y)) == null)
  }

  test("audioEnvDups finds the planted near-dup and not the inverted envelope") {
    import spark.implicits._
    def base(i: Int): Int = ((i * 7919 + 31) % 65536) - 32768
    val n = 143 // not a multiple of 65 — exercises the uneven segments
    val near = pcmWav(n, i =>
      // perturb only segment 0's samples — flips at most bit 0
      if (i.toLong * 65 / n == 0) ((base(i) + 9973) % 65536 + 65536) % 65536 - 32768
      else base(i))
    val rows = Seq(
      Multimodal.MediaRow(1L, pcmWav(n, base), "audio/wav", "t"),
      Multimodal.MediaRow(2L, near, "audio/wav", "t"),
      // time-reversed signal: the envelope reverses → far in Hamming
      Multimodal.MediaRow(3L, pcmWav(n, i => base(n - 1 - i)), "audio/wav", "t"),
      Multimodal.MediaRow(4L, pcmWav(64, base), "audio/wav", "t")
    ).toDS().toDF()
    val pairs = Dedup.audioEnvDups(rows, "doc_id", "media",
        maxHamming = 3, bucketBits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 <= 1)
    val h = Dedup.audioEnvDocs(rows, "doc_id", "media")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h.keySet == Set(1L, 2L, 3L)) // the 64-sample refusal row never hashes
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) > 3)
  }

  test("videoSigHash64: strict-majority vote over per-frame dHashes, ties fall to 0") {
    import Multimodal.{ContainerFixtures, MediaCodec}
    // frame hashes at the closed-form extremes (the dhash64 spec):
    // rising gradient -> 0, falling gradient -> -1 (all 64 bits)
    val rising = ContainerFixtures.bmp(9, 8, (x, _) => x * 10)
    val falling = ContainerFixtures.bmp(9, 8, (x, _) => 80 - x * 10)
    def clip(frames: Array[Byte]*): Array[Byte] =
      ContainerFixtures.aviMjpeg(100000L, 9, 8, frames)
    // 2-of-3 majority carries every bit
    assert(MediaCodec.videoSigHash64(clip(rising, rising, falling)) == 0L)
    assert(MediaCodec.videoSigHash64(clip(falling, falling, rising)) == -1L)
    // 1-of-2 is NOT a strict majority: every tied bit drops to 0
    assert(MediaCodec.videoSigHash64(clip(rising, falling)) == 0L)
    // a single frame's signature IS its dHash
    assert(MediaCodec.videoSigHash64(clip(falling)) == -1L)
  }

  test("videoSigHash64 walks flat and rec-interleaved movi layouts identically") {
    import Multimodal.{ContainerFixtures, MediaCodec}
    val frames = (0 until 5).map(f =>
      ContainerFixtures.bmp(20, 15, (x, y) => (f * 41 + x * 13 + y * 29) % 251))
    val flat = ContainerFixtures.aviMjpeg(40000L, 20, 15, frames)
    val rec = ContainerFixtures.aviMjpeg(40000L, 20, 15, frames, recGroup = 2)
    val a = MediaCodec.videoSigHash64(flat)
    assert(a != null && a == MediaCodec.videoSigHash64(rec))
  }

  test("videoSigHash64 refusals: non-AVI, zero frames, any undecodable frame") {
    import Multimodal.{ContainerFixtures, MediaCodec}
    val good = ContainerFixtures.bmp(20, 15, (x, y) => (x * 13 + y * 29) % 251)
    assert(MediaCodec.videoSigHash64("not a container".getBytes) == null)
    assert(MediaCodec.videoSigHash64(
      ContainerFixtures.wav(8000, 1, 16, new Array[Byte](64))) == null)
    // an AVI with an empty movi has no honest signature
    assert(MediaCodec.videoSigHash64(
      ContainerFixtures.aviMjpeg(100000L, 20, 15, Seq.empty)) == null)
    // strict-all: ONE below-grid frame refuses the whole clip
    assert(MediaCodec.videoSigHash64(ContainerFixtures.aviMjpeg(100000L, 20, 15,
      Seq(good, ContainerFixtures.bmp(8, 8, (x, y) => x + y)))) == null)
    // a JPEG-headed but undecodable frame (no tables/scan) refuses too
    assert(MediaCodec.videoSigHash64(ContainerFixtures.aviMjpeg(100000L, 20, 15,
      Seq(good, ContainerFixtures.synthJpegHeader(20, 15, 32)))) == null)
  }

  test("videoSigDups finds the planted near-dup clip and not the inverse clip") {
    import spark.implicits._
    import Multimodal.ContainerFixtures
    def base(f: Int)(x: Int, y: Int): Int = (f * 41 + x * 37 + y * 23 + 11) % 251
    def clip(px: Int => (Int, Int) => Int): Array[Byte] =
      ContainerFixtures.aviMjpeg(40000L, 27, 21,
        (0 until 3).map(f => ContainerFixtures.bmp(27, 21, px(f))))
    val nearPx: Int => (Int, Int) => Int = f => (x, y) =>
      // brighten only grid cell (0,0) in EVERY frame — each frame's
      // dHash moves at most in bit 0, so the majority moves at most in
      // bit 0
      if (x * 9 / 27 == 0 && y * 8 / 21 == 0) (base(f)(x, y) + 128) % 251
      else base(f)(x, y)
    val rows = Seq(
      Multimodal.MediaRow(1L, clip(f => base(f)), "video/avi", "t"),
      Multimodal.MediaRow(2L, clip(nearPx), "video/avi", "t"),
      Multimodal.MediaRow(3L, clip(f => (x, y) => 250 - base(f)(x, y)),
        "video/avi", "t"),
      Multimodal.MediaRow(4L, ContainerFixtures.aviMjpeg(40000L, 8, 8,
        Seq(ContainerFixtures.bmp(8, 8, (x, y) => x + y))), "video/avi", "t")
    ).toDS().toDF()
    val pairs = Dedup.videoSigDups(rows, "doc_id", "media",
        maxHamming = 3, bucketBits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 <= 1)
    val h = Dedup.videoSigDocs(rows, "doc_id", "media")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h.keySet == Set(1L, 2L, 3L)) // the below-grid clip never hashes
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) > 3)
  }

  test("media fingerprint kernels are registered SQL functions") {
    import Multimodal.{ContainerFixtures, MediaCodec}
    graft.functions.MediaExpressions.register(spark)
    val img = ContainerFixtures.bmp(20, 15, (x, y) => (x * 13 + y * 29) % 251)
    val wav = ContainerFixtures.wav(8000, 1, 16, Array.tabulate(260)(i =>
      (if (i % 2 == 0) i else i >> 8).toByte))
    val avi = ContainerFixtures.aviMjpeg(40000L, 20, 15, Seq(img, img))
    import spark.implicits._
    val df = Seq((img, wav, avi)).toDF("i", "a", "v")
    df.createOrReplaceTempView("media_sql_spec")
    val r = spark.sql(
      "SELECT dhash_image(i), audio_env_hash(a), video_sig_hash(v), " +
      "size(video_frame_hashes(v)) FROM media_sql_spec").collect().head
    assert(r.getLong(0) == MediaCodec.dhash64(img).longValue())
    assert(r.getLong(1) == MediaCodec.audioEnvHash64(wav).longValue())
    assert(r.getLong(2) == MediaCodec.videoSigHash64(avi).longValue())
    assert(r.getInt(3) == 1) // two identical frames -> one distinct hash
    // refusal surfaces as SQL NULL
    assert(spark.sql(
      "SELECT dhash_image(cast('nope' AS BINARY))").collect().head.isNullAt(0))
  }

  test("videoFrameContainment catches a trimmed subclip; dedupes dup frames; refuses honestly") {
    import spark.implicits._
    import Multimodal.{ContainerFixtures, MediaCodec}
    def frame(f: Int): Array[Byte] =
      ContainerFixtures.bmp(20, 15, (x, y) => (f * 53 + x * 13 + y * 29) % 251)
    def clip(fs: Int*): Array[Byte] =
      ContainerFixtures.aviMjpeg(40000L, 20, 15, fs.map(frame))
    // distinct per-frame hashes, duplicates collapsed, order of first
    // appearance; strict-all refusal
    val hs = MediaCodec.videoFrameHashes64(clip(1, 2, 1, 3))
    assert(hs.length == 3 && hs.toSet ==
      Seq(1, 2, 3).map(f => MediaCodec.dhash64(frame(f)).longValue()).toSet)
    assert(MediaCodec.videoFrameHashes64(ContainerFixtures.aviMjpeg(
      40000L, 20, 15, Seq(frame(1), ContainerFixtures.bmp(8, 8, (x, y) => x)))) == null)
    // a 3-of-6 trim: containment of the short clip is 3/3 = 1.0, while
    // the majority-vote signatures are far apart (different denominators
    // and frame sets) — the case this operator exists for
    val rows = Seq(
      Multimodal.MediaRow(1L, clip(1, 2, 3, 4, 5, 6), "video/avi", "t"),
      Multimodal.MediaRow(2L, clip(4, 5, 6), "video/avi", "t"),
      Multimodal.MediaRow(3L, clip(7, 8, 9), "video/avi", "t")
    ).toDS().toDF()
    val pairs = Dedup.videoFrameContainment(rows, "doc_id", "media",
        threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)))
    // the signature path must NOT pair them (it is the wrong tool here)
    assert(Dedup.videoSigDups(rows, "doc_id", "media", maxHamming = 3,
      bucketBits = 16).count() == 0L)
  }

  /** Pack closed-form 16-bit samples into an AIFF (big-endian SSND). */
  private def pcmAiff(n: Int, v: Int => Int): Array[Byte] = {
    val data = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = v(i)
      data(2 * i) = ((s >> 8) & 0xFF).toByte
      data(2 * i + 1) = (s & 0xFF).toByte
    }
    Multimodal.ContainerFixtures.aiff(8000, 1, 16, n.toLong, data)
  }

  test("AIFF SSND PCM decode: BE samples equal the WAV decode of the same signal") {
    import Multimodal.ContainerCodec
    def sig(i: Int): Int = ((i * 7919 + 31) % 65536) - 32768
    val n = 130
    val viaAiff = ContainerCodec.decodeAiffPcm(pcmAiff(n, sig))
    val viaWav = ContainerCodec.decodeWavPcm(pcmWav(n, sig))
    assert(viaAiff.isDefined && viaWav.isDefined)
    assert(viaAiff.get._2.toSeq == viaWav.get._2.toSeq)
    val m = viaAiff.get._1
    assert(m.kind == "aiff" && m.sample_rate == 8000 && m.channels == 1)
  }

  test("AIFF 8-bit samples are SIGNED (unlike WAV's unsigned 8-bit)") {
    import Multimodal.{ContainerCodec, ContainerFixtures}
    val samples = Array[Byte](-128, -1, 0, 1, 127)
    val a = ContainerFixtures.aiff(8000, 1, 8, samples.length.toLong, samples)
    assert(ContainerCodec.decodeAiffPcm(a).get._2.toSeq ==
      Seq(-128, -1, 0, 1, 127))
  }

  test("AIFF decode: a spurious second COMM cannot overwrite the first's geometry") {
    import Multimodal.ContainerCodec
    def sig(i: Int): Int = ((i * 7919 + 31) % 65536) - 32768
    val clean = pcmAiff(70, sig)
    // splice a second COMM (channels=1, frames=50, bits=8, rate 8000)
    // between the real COMM and the SSND: first-COMM-wins means the
    // decode is unchanged; last-wins would reinterpret the 16-bit
    // payload one byte per sample
    def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def be32(v: Long) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    val exp = 63 - java.lang.Long.numberOfLeadingZeros(8000L)
    val comm2 = "COMM".getBytes ++ be32(18) ++ be16(1) ++ be32(50L) ++
      be16(8) ++ be16(16383 + exp.toInt) ++
      be32(8000L << (31 - exp)) ++ be32(0L)
    // clean = FORM(4) size(4) 'AIFF'(4) COMM chunk(8+18) SSND...
    val insertAt = 12 + 8 + 18
    val spliced = clean.take(insertAt) ++ comm2 ++ clean.drop(insertAt)
    // patch the FORM size for the inserted bytes
    val newSize = (((spliced.length - 8)).toLong)
    System.arraycopy(be32(newSize), 0, spliced, 4, 4)
    val a = ContainerCodec.decodeAiffPcm(spliced)
    val b = ContainerCodec.decodeAiffPcm(clean)
    assert(a.isDefined && a.get._2.toSeq == b.get._2.toSeq)
  }

  test("AIFF decode refusals: truncated SSND, unsupported bits, declared overrun") {
    import Multimodal.{ContainerCodec, ContainerFixtures}
    def sig(i: Int): Int = i * 100 - 3000
    val full = pcmAiff(70, sig)
    // COMM declares 70 frames but the SSND payload is cut short
    assert(ContainerCodec.decodeAiffPcm(full.take(full.length - 20)).isEmpty)
    // 12-bit samples are outside the decodable family
    val odd = ContainerFixtures.aiff(8000, 1, 12, 4L, new Array[Byte](8))
    assert(ContainerCodec.decodeAiffPcm(odd).isEmpty)
    // non-AIFF containers refuse
    assert(ContainerCodec.decodeAiffPcm(
      ContainerFixtures.wav(8000, 1, 16, new Array[Byte](64))).isEmpty)
  }

  test("audioEnvHash64 is container-independent: WAV and AIFF of the same samples agree") {
    import Multimodal.MediaCodec
    def sig(i: Int): Int = ((i * 9173 + 77) % 65536) - 32768
    val n = 143
    val hWav = MediaCodec.audioEnvHash64(pcmWav(n, sig))
    val hAiff = MediaCodec.audioEnvHash64(pcmAiff(n, sig))
    assert(hWav != null && hWav == hAiff)
  }
}
