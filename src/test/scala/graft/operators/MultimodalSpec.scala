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
}
