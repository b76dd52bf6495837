package graft

import java.nio.ByteBuffer
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{ContainerMeta, Multimodal}

/** ContainerMeta against hand-assembled, spec-conformant container
  * fixtures (built byte-by-byte from the public ISO/IEC 14496-12 box
  * layout and the Matroska EBML element registry — no binary test
  * assets needed), plus the probeMetadata Dataset stage.
  */
class MultimodalMetaSpec extends AnyFunSuite {
  import SparkTestSession.spark

  // ---- MP4 builders ----

  private def u32(v: Long): Array[Byte] =
    ByteBuffer.allocate(4).putInt(v.toInt).array()

  private def box(typ: String, body: Array[Byte]*): Array[Byte] = {
    val payload = body.flatten.toArray
    u32(payload.length + 8) ++ typ.getBytes("US-ASCII") ++ payload
  }

  /** mvhd v0: ver/flags, creation, modification, timescale, duration,
    * then rate/volume/reserved/matrix/predefined/next-track (80 zero
    * bytes completes the 100-byte body).
    */
  private def mvhd(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", u32(0), u32(0), u32(0), u32(timescale), u32(duration),
      new Array[Byte](80))

  /** tkhd v0 (84-byte body): width/height are 16.16 fixed point at
    * offsets 76/80.
    */
  private def tkhd(width: Int, height: Int): Array[Byte] = {
    val b = new Array[Byte](84)
    System.arraycopy(u32(width.toLong << 16), 0, b, 76, 4)
    System.arraycopy(u32(height.toLong << 16), 0, b, 80, 4)
    box("tkhd", b)
  }

  private val mp4Fixture: Array[Byte] =
    box("ftyp", "isom".getBytes("US-ASCII"), u32(0)) ++
      box("moov",
        mvhd(timescale = 600, duration = 3000), // 3000/600 s = 5000 ms
        box("trak", tkhd(0, 0)), // audio track: zero dimensions
        box("trak", tkhd(640, 360)))

  // ---- EBML builders ----

  private def beBytes(v: Long): Array[Byte] = {
    var n = v
    var out = List.empty[Byte]
    while (n != 0) { out = (n & 0xff).toByte :: out; n >>>= 8 }
    if (out.isEmpty) Array(0.toByte) else out.toArray
  }

  private def ebml(id: Long, body: Array[Byte]*): Array[Byte] = {
    val payload = body.flatten.toArray
    require(payload.length < 127, "test builder supports short elements only")
    beBytes(id) ++ Array((0x80 | payload.length).toByte) ++ payload
  }

  private def f32(v: Float): Array[Byte] =
    ByteBuffer.allocate(4).putFloat(v).array()

  private val mkvFixture: Array[Byte] =
    ebml(0x1a45dfa3L) ++ // EBML header, empty body
      ebml(0x18538067L, // Segment
        ebml(0x1549a966L, // Info
          ebml(0x2ad7b1L, beBytes(1000000L)), // TimecodeScale: 1 ms
          ebml(0x4489L, f32(4500f))), // Duration: 4500 ticks
        ebml(0x1654ae6bL, // Tracks
          ebml(0xaeL, // TrackEntry
            ebml(0xe0L, // Video
              ebml(0xb0L, beBytes(1280L)), // PixelWidth
              ebml(0xbaL, beBytes(720L)))))) // PixelHeight

  test("mp4: duration from mvhd, resolution from the nonzero-dim trak") {
    assert(ContainerMeta.parse(mp4Fixture) ==
      Some(ContainerMeta.VideoMeta(5000L, 640, 360)))
  }

  test("mp4: 64-bit v1 mvhd duration parses") {
    val body = new Array[Byte](32)
    body(0) = 1 // version 1: 8-byte times, 4-byte timescale, 8-byte duration
    System.arraycopy(u32(1000), 0, body, 20, 4) // timescale
    System.arraycopy(ByteBuffer.allocate(8).putLong(90000L).array(), 0, body, 24, 8)
    val mp4 = box("ftyp", "isom".getBytes("US-ASCII"), u32(0)) ++
      box("moov", box("mvhd", body))
    assert(ContainerMeta.parse(mp4).map(_.durationMs) == Some(90000L))
  }

  test("mkv: duration from Info (scale x ticks), resolution from Video") {
    assert(ContainerMeta.parse(mkvFixture) ==
      Some(ContainerMeta.VideoMeta(4500L, 1280, 720)))
  }

  test("malformed payloads degrade to None, never throw") {
    assert(ContainerMeta.parse(null) == None)
    assert(ContainerMeta.parse(Array.emptyByteArray) == None)
    assert(ContainerMeta.parse(Array.fill(64)(0x5a.toByte)) == None)
    // valid magic, truncated body
    assert(ContainerMeta.parse(mp4Fixture.take(12)) == None)
    assert(ContainerMeta.parse(mkvFixture.take(6)) == None)
    // box size lying past the end of the payload
    val lying = u32(1 << 20) ++ "ftyp".getBytes("US-ASCII") ++ new Array[Byte](8)
    assert(ContainerMeta.parse(lying) == None)
  }

  test("probeMetadata fills video records from real bytes, passes others through") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, "video", mp4Fixture, 0, 0, 0L),
      Multimodal.MediaRecord(2L, "video", mkvFixture, 0, 0, 0L),
      Multimodal.MediaRecord(3L, "video", Array.fill(32)(7.toByte), 0, 0, 0L),
      Multimodal.MediaRecord(4L, "image", mp4Fixture, 9, 9, 9L)).toDS()
    val got = Multimodal.probeMetadata(media).collect()
      .map(m => m.media_id -> ((m.width, m.height, m.duration_ms))).toMap
    assert(got(1L) == ((640, 360, 5000L)))
    assert(got(2L) == ((1280, 720, 4500L)))
    assert(got(3L) == ((0, 0, 0L))) // unparseable: unchanged
    assert(got(4L) == ((9, 9, 9L))) // non-video: untouched
  }
}
