package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{JdkMediaDecoder, MediaRecord, MjpegCodec, StubDecoder}

/** REAL video frame decode through the MJPEG path: the fixture is a
  * genuine MJPEG elementary stream (frames rendered to BufferedImage
  * and encoded by the JDK's own JPEG writer, concatenated), so the
  * split/decode under test runs on real codec bytes, not hand-waved
  * blobs — the same standard the PNG and MP4/MKV fixtures set.
  */
class MjpegSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def jpegFrame(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos),
      "JDK JPEG writer unavailable")
    bos.toByteArray
  }

  // 6 frames fading dark -> light: distinct per-frame luminance so the
  // temporal mean is distinguishable from any single frame
  private val frames =
    (0 until 6).map(i => jpegFrame(32, 24, (i * 40) << 16 | (i * 40) << 8 | i * 40))
  private val mjpeg = frames.reduce(_ ++ _)

  test("frameRanges finds every frame at exact SOI/EOI boundaries") {
    val ranges = MjpegCodec.frameRanges(mjpeg)
    assert(ranges.length == 6)
    val lengths = frames.map(_.length)
    val expectedStarts = lengths.scanLeft(0)(_ + _).init
    assert(ranges.map(_._1) == expectedStarts)
    assert(ranges.map { case (s, e) => e - s } == lengths)
    // a truncated tail frame is dropped, earlier frames survive
    val truncated = MjpegCodec.frameRanges(mjpeg.dropRight(4))
    assert(truncated.length == 5)
  }

  test("marker-segment payloads containing FF D9 do not truncate the frame") {
    // simulate an EXIF APP1 carrying binary metadata — including a
    // thumbnail-like FF D8 FF / FF D9 byte pair — injected right after
    // frame 0's SOI; the length-field walk must skip it wholesale
    val payload = Array[Byte](
      'E', 'x', 'i', 'f', 0, 0,
      0xff.toByte, 0xd8.toByte, 0xff.toByte, // looks like a nested SOI
      1, 2, 3,
      0xff.toByte, 0xd9.toByte, // looks like EOI — must NOT end the frame
      4, 5, 6)
    val len = payload.length + 2
    val app1 = Array(0xff.toByte, 0xe1.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ payload
    val frame0 = frames.head.take(2) ++ app1 ++ frames.head.drop(2)
    val stream = frame0 ++ frames.tail.reduce(_ ++ _)
    val ranges = MjpegCodec.frameRanges(stream)
    assert(ranges.length == 6, s"expected 6 frames, got ${ranges.length}")
    assert(ranges.head == ((0, frame0.length)),
      "APP1 payload EOI truncated frame 0")
    // the widened frame still decodes (ImageIO skips unknown APP1)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(MjpegCodec.frames(stream).head))
    assert(img != null && img.getWidth == 32 && img.getHeight == 24)
  }

  test("extracted frames are decodable JPEGs with the source dimensions") {
    val fs = MjpegCodec.frames(mjpeg)
    assert(fs.length == 6)
    fs.foreach { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img != null && img.getWidth == 32 && img.getHeight == 24)
    }
  }

  test("video feature is the temporal mean of real per-frame luminance grids") {
    val got = JdkMediaDecoder.decode("video", mjpeg)
    // expected: mean over all 6 frames (<= 8, so sampling keeps all) of
    // the image path's own grid — recomputed through the public surface
    val grids = frames.map(f => JdkMediaDecoder.decode("image", f))
    val expected = (0 until 16).map(c => grids.map(_(c)).sum / 6.0)
    (0 until 16).foreach { c =>
      assert(math.abs(got(c) - expected(c)) < 1e-4,
        s"cell $c: got ${got(c)} expected ${expected(c)}")
    }
    // frames fade dark->light, so the mean luminance sits strictly
    // between the first and last frames' — a real temporal signal
    assert(got.sum > grids.head.sum && got.sum < grids.last.sum)
    // and it is NOT the stub's byte-histogram fake
    assert(!got.sameElements(StubDecoder.decode("video", mjpeg)))
  }

  test("non-MJPEG video degrades to the stub; truncated MJPEG still decodes") {
    val h264ish = Array.fill(256)(42.toByte)
    assert(JdkMediaDecoder.decode("video", h264ish)
      .sameElements(StubDecoder.decode("video", h264ish)))
    val partial = mjpeg.dropRight(4) // 5 complete frames
    val got = JdkMediaDecoder.decode("video", partial)
    val expected = (0 until 16).map(c =>
      frames.take(5).map(f => JdkMediaDecoder.decode("image", f)(c)).sum / 5.0)
    (0 until 16).foreach(c => assert(math.abs(got(c) - expected(c)) < 1e-4))
  }

  test("mjpegFrames: distributed real frame extraction, everyN sampling") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      MediaRecord(1L, "video", mjpeg, 0, 0, 0L),
      MediaRecord(2L, "video", Array.fill(64)(7.toByte), 0, 0, 0L), // not MJPEG
      MediaRecord(3L, "image", frames.head, 32, 24, 0L))) // not video
    val out = Multimodal.mjpegFrames(ds, everyN = 2).collect()
    assert(out.map(f => (f.media_id, f.frame_idx)).sorted.toSeq ==
      Seq((1L, 0), (1L, 2), (1L, 4)))
    out.foreach { f =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f.frame))
      assert(img != null && img.getWidth == 32 && img.getHeight == 24)
    }
  }

  test("probeMetadata fills resolution for containerless MJPEG from frame headers") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      MediaRecord(1L, "video", mjpeg, 0, 0, 0L),
      MediaRecord(2L, "video", Array.fill(64)(7.toByte), 0, 0, 0L)))
    val out = Multimodal.probeMetadata(ds).collect().sortBy(_.media_id)
    assert(out(0).width == 32 && out(0).height == 24)
    assert(out(1).width == 0 && out(1).height == 0) // unparseable: unchanged
  }
}
