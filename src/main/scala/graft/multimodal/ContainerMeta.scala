package graft.multimodal

/** Pure-JVM video CONTAINER metadata parsers — no codec, no external
  * dependency, just the two public container specs:
  *
  *   - MP4 / ISO base media file format (ISO/IEC 14496-12): length-
  *     prefixed box tree; duration from `moov/mvhd` (duration ÷
  *     timescale), resolution from the `moov/trak/tkhd` headers
  *     (16.16 fixed-point width/height; a file's video track is the
  *     one with nonzero dimensions).
  *   - Matroska / WebM (EBML): varint-tagged element tree; duration
  *     from `Segment/Info` (float Duration × TimecodeScale ns),
  *     resolution from `Segment/Tracks/TrackEntry/Video`
  *     PixelWidth/PixelHeight.
  *
  * This makes multimodal METADATA extraction real — width, height and
  * duration of an `.mp4`/`.mkv`/`.webm` payload come from the actual
  * bytes — while FRAME decode stays behind `Multimodal.StubDecoder`
  * (no in-JDK video codec exists; documented there).
  *
  * Both parsers are total: any malformed, truncated or non-container
  * payload returns None rather than throwing — at 100 TB one corrupt
  * blob must degrade per-record, never kill a task (same policy as
  * JdkMediaDecoder's NonFatal catches). Bounds are checked before
  * every read and child recursion is depth-capped.
  */
object ContainerMeta {

  final case class VideoMeta(durationMs: Long, width: Int, height: Int)

  /** Dispatch on magic bytes: ISO-BMFF files start with a box whose
    * type is at offset 4 (`ftyp` in practice), EBML files with the
    * 0x1A45DFA3 EBML header ID.
    */
  def parse(bytes: Array[Byte]): Option[VideoMeta] =
    if (bytes == null || bytes.length < 8) None
    else if (bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p')
      parseMp4(bytes)
    else if ((bytes(0) & 0xff) == 0x1a && (bytes(1) & 0xff) == 0x45 &&
      (bytes(2) & 0xff) == 0xdf && (bytes(3) & 0xff) == 0xa3)
      parseMkv(bytes)
    else None

  // ---------------- MP4 / ISO-BMFF ----------------

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off) << 32) | u32(b, off + 4)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(Array(b(off), b(off + 1), b(off + 2), b(off + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the children of [start, end); call f(type, bodyStart,
    * bodyEnd) per box. Malformed sizes end the walk (no throw).
    */
  private def walkBoxes(b: Array[Byte], start: Int, end: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var off = start
    while (off + 8 <= end) {
      val size32 = u32(b, off)
      val typ = fourcc(b, off + 4)
      val (bodyStart, boxSize) =
        if (size32 == 1 && off + 16 <= end) (off + 16, u64(b, off + 8))
        else if (size32 == 0) (off + 8, (end - off).toLong) // box runs to end
        else (off + 8, size32)
      if (boxSize < 8 || off + boxSize > end) return
      f(typ, bodyStart, off + boxSize.toInt)
      off += boxSize.toInt
    }
  }

  private def parseMp4(b: Array[Byte]): Option[VideoMeta] = {
    var durationMs = -1L
    var width = 0
    var height = 0
    walkBoxes(b, 0, b.length) { (typ, s, e) =>
      if (typ == "moov") walkBoxes(b, s, e) { (t2, s2, e2) =>
        if (t2 == "mvhd" && e2 - s2 >= 20) {
          val version = b(s2) & 0xff
          // v0: ver/flags 4, creation 4, modification 4, timescale 4,
          // duration 4; v1 widens the times and duration to 8
          val (timescale, duration) =
            if (version == 1 && e2 - s2 >= 32)
              (u32(b, s2 + 20), u64(b, s2 + 24))
            else (u32(b, s2 + 12), u32(b, s2 + 16))
          if (timescale > 0) durationMs = duration * 1000L / timescale
        } else if (t2 == "trak") walkBoxes(b, s2, e2) { (t3, s3, e3) =>
          // tkhd v0: ver/flags 4, times 8, id 4, rsvd 4, duration 4,
          // rsvd 8, layer/group/volume/rsvd 8, matrix 36, then 16.16
          // fixed-point width and height; v1 is 12 bytes longer
          if (t3 == "tkhd") {
            val version = b(s3) & 0xff
            val whOff = s3 + (if (version == 1) 88 else 76)
            if (whOff + 8 <= e3) {
              val w = (u32(b, whOff) >> 16).toInt
              val h = (u32(b, whOff + 4) >> 16).toInt
              // the video track is the one with nonzero dimensions
              // (audio tkhd carries 0x0); keep the largest track
              if (w > 0 && h > 0 && w.toLong * h > width.toLong * height) {
                width = w; height = h
              }
            }
          }
        }
      }
    }
    if (durationMs >= 0 || width > 0) Some(VideoMeta(math.max(durationMs, 0L), width, height))
    else None
  }

  // ---------------- Matroska / WebM (EBML) ----------------

  /** EBML varint at `off`: (value, encodedLength). keepMarker retains
    * the length-marker bit (element IDs compare WITH it, sizes strip
    * it). Returns null on malformed/truncated input.
    */
  private def readVarint(b: Array[Byte], off: Int, end: Int,
      keepMarker: Boolean): Array[Long] = {
    if (off >= end) return null
    val first = b(off) & 0xff
    if (first == 0) return null
    val len = Integer.numberOfLeadingZeros(first) - 23 // 1..8
    if (off + len > end) return null
    var v: Long = if (keepMarker) first.toLong else first & (0xff >>> len)
    var i = 1
    while (i < len) {
      v = (v << 8) | (b(off + i) & 0xffL)
      i += 1
    }
    Array(v, len.toLong)
  }

  private def uintAt(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  private def floatAt(b: Array[Byte], off: Int, len: Int): Double =
    if (len == 4) java.lang.Float.intBitsToFloat(uintAt(b, off, 4).toInt).toDouble
    else if (len == 8) java.lang.Double.longBitsToDouble(uintAt(b, off, 8))
    else Double.NaN

  /** Walk EBML children of [start, end); f(id, bodyStart, bodyEnd).
    * Elements with unknown size (all-ones varint — streamed Segments)
    * extend to the enclosing end.
    */
  private def walkEbml(b: Array[Byte], start: Int, end: Int)(
      f: (Long, Int, Int) => Unit): Unit = {
    var off = start
    while (off < end) {
      val id = readVarint(b, off, end, keepMarker = true)
      if (id == null) return
      val size = readVarint(b, off + id(1).toInt, end, keepMarker = false)
      if (size == null) return
      val bodyStart = off + id(1).toInt + size(1).toInt
      // all-ones payload size = "unknown" (live streaming): body runs
      // to the end of the enclosing element
      val allOnes = size(0) == (1L << (7 * size(1))) - 1
      val bodyEnd =
        if (allOnes) end
        else {
          val e = bodyStart + size(0)
          if (e > end || e < bodyStart) return
          e.toInt
        }
      f(id(0), bodyStart, bodyEnd)
      if (bodyEnd >= end) return
      off = bodyEnd
    }
  }

  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549a966L
  private val IdTimecodeScale = 0x2ad7b1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654ae6bL
  private val IdTrackEntry = 0xaeL
  private val IdVideo = 0xe0L
  private val IdPixelWidth = 0xb0L
  private val IdPixelHeight = 0xbaL

  private def parseMkv(b: Array[Byte]): Option[VideoMeta] = {
    var timecodeScaleNs = 1000000L // spec default: 1 ms
    var durationTicks = Double.NaN
    var width = 0
    var height = 0
    var sawSegment = false
    walkEbml(b, 0, b.length) { (id, s, e) =>
      if (id == IdSegment) {
        sawSegment = true
        walkEbml(b, s, e) { (id2, s2, e2) =>
          if (id2 == IdInfo) walkEbml(b, s2, e2) { (id3, s3, e3) =>
            if (id3 == IdTimecodeScale) timecodeScaleNs = uintAt(b, s3, e3 - s3)
            else if (id3 == IdDuration) durationTicks = floatAt(b, s3, e3 - s3)
          }
          else if (id2 == IdTracks) walkEbml(b, s2, e2) { (id3, s3, e3) =>
            if (id3 == IdTrackEntry) walkEbml(b, s3, e3) { (id4, s4, e4) =>
              if (id4 == IdVideo) {
                var w = 0
                var h = 0
                walkEbml(b, s4, e4) { (id5, s5, e5) =>
                  if (id5 == IdPixelWidth) w = uintAt(b, s5, e5 - s5).toInt
                  else if (id5 == IdPixelHeight) h = uintAt(b, s5, e5 - s5).toInt
                }
                if (w > 0 && h > 0 && w.toLong * h > width.toLong * height) {
                  width = w; height = h
                }
              }
            }
          }
        }
      }
    }
    if (!sawSegment) None
    else {
      val durMs =
        if (durationTicks.isNaN) 0L
        else math.round(durationTicks * timecodeScaleNs / 1e6)
      if (durMs > 0 || width > 0) Some(VideoMeta(durMs, width, height)) else None
    }
  }
}
