package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal columns: image/audio/video as opaque binary columns with
  * typed metadata, plus the Spark-side plumbing for batch decode /
  * feature-extract / frame-sample. Image and audio DECODE are real
  * (JdkMediaDecoder); video METADATA is real (`ContainerMeta` parses
  * MP4/ISO-BMFF and Matroska/WebM container headers for duration and
  * resolution — see [[probeMetadata]]); video FRAME decode is REAL for
  * MJPEG (concatenated baseline JPEGs — the webcam / AVI-'MJPG'
  * format; [[MjpegCodec]] splits frames on the marker structure and
  * the JDK JPEG codec decodes the pixels, so [[mjpegFrames]] and the
  * video feature path run on real decoded frames). Inter-coded codecs
  * (H.264/VP9/AV1…) have no in-JDK decoder, so `StubDecoder` stands in
  * for those — a clearly marked, deterministic fake — while the
  * schema, partitioning, batch shape and typed Dataset plumbing are
  * real and tested. A production deployment swaps `MediaDecoder` for
  * one backed by javacv/ffmpeg or a JNI codec; nothing else changes.
  *
  * Scale notes: decode runs inside mapPartitions in fixed-size batches
  * (amortizing per-batch codec setup exactly like an Arrow-batched
  * Python UDF would), content bytes never hit the driver, and the
  * output keeps the input partitioning (narrow transformation — no
  * shuffle).
  */
object Multimodal {

  case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte], // opaque encoded payload
      width: Int,
      height: Int,
      duration_ms: Long)

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      features: Array[Float])

  case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Decode interface: bytes → feature vector. Implementations must be
    * serializable (shipped to executors) and deterministic.
    */
  trait MediaDecoder extends Serializable {
    def featureDim: Int
    def decode(kind: String, content: Array[Byte]): Array[Float]
  }

  /** STUB — the container has no image/audio codecs. Produces a
    * deterministic pseudo-feature from the payload bytes so the
    * pipeline plumbing (schema, batching, partitioning) is fully
    * exercisable. Replace with a real codec-backed decoder in
    * production.
    */
  object StubDecoder extends MediaDecoder {
    val featureDim = 16
    def decode(kind: String, content: Array[Byte]): Array[Float] = {
      val out = new Array[Float](featureDim)
      var i = 0
      while (i < content.length) {
        out(i % featureDim) += (content(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** MJPEG elementary-stream codec — REAL video frame access with zero
    * external dependencies, because an MJPEG stream is concatenated
    * baseline JPEG images (the webcam / AVI-'MJPG' / http multipart
    * video format) and the JPEG codec itself ships in the JDK
    * (javax.imageio). Frame boundaries come from walking the JPEG
    * MARKER STRUCTURE, not from a raw FF D9 scan: length-prefixed
    * segments (APPn/COM/DQT/DHT/SOF/…) are skipped wholesale via
    * their 2-byte length fields — EXIF/ICC/XMP payloads (including an
    * embedded thumbnail JPEG with its own EOI) may contain arbitrary
    * FF D9 bytes and must not end the frame — and only inside
    * SOS-entropy data (where a raw FF is always byte-stuffed FF 00 or
    * an RST marker FF D0–D7) is the next real marker scanned for.
    * A structurally corrupt or truncated frame drops the remainder of
    * the stream (per-payload degradation; the decode layer already
    * degrades per-frame).
    */
  object MjpegCodec extends Serializable {
    /** Cheap sniff: a JPEG/MJPEG payload starts SOI + marker prefix. */
    def isMjpeg(content: Array[Byte]): Boolean =
      content.length >= 4 && (content(0) & 0xff) == 0xff &&
        (content(1) & 0xff) == 0xd8 && (content(2) & 0xff) == 0xff

    /** End offset (exclusive) of the frame whose SOI is at `start`, or
      * -1 if the structure is corrupt/truncated. Walks markers: SOI
      * was consumed by the caller; standalone markers (TEM, RSTn) have
      * no payload; SOS switches to the entropy scan; everything else
      * carries a big-endian length that includes its own 2 bytes.
      */
    private def frameEnd(content: Array[Byte], start: Int): Int = {
      val n = content.length
      @inline def u(i: Int) = content(i) & 0xff
      var j = start + 2
      while (j + 1 < n) {
        if (u(j) != 0xff) return -1
        while (j + 1 < n && u(j + 1) == 0xff) j += 1 // fill bytes
        if (j + 1 >= n) return -1
        val m = u(j + 1)
        if (m == 0xd9) return j + 2 // EOI
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) j += 2 // standalone
        else if (j + 3 >= n) return -1
        else {
          val len = (u(j + 2) << 8) | u(j + 3)
          if (len < 2) return -1
          j += 2 + len // segment payload skipped via its length field
          if (m == 0xda) {
            // SOS: scan entropy-coded data for the next true marker
            // (not stuffed FF 00, not RST, not a fill byte)
            while (j + 1 < n && !(u(j) == 0xff && u(j + 1) != 0x00 &&
                u(j + 1) != 0xff && !(u(j + 1) >= 0xd0 && u(j + 1) <= 0xd7)))
              j += 1
            if (j + 1 >= n) return -1
          }
        }
      }
      -1
    }

    /** (start, endExclusive) byte ranges of each complete JPEG frame. */
    def frameRanges(content: Array[Byte]): IndexedSeq[(Int, Int)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var i = 0
      val n = content.length
      while (i + 3 < n) {
        if ((content(i) & 0xff) == 0xff && (content(i + 1) & 0xff) == 0xd8 &&
            (content(i + 2) & 0xff) == 0xff) {
          val end = frameEnd(content, i)
          if (end < 0) i = n // corrupt/truncated tail frame: drop, stop
          else { out += ((i, end)); i = end }
        } else i += 1
      }
      out.toIndexedSeq
    }

    def frames(content: Array[Byte]): IndexedSeq[Array[Byte]] =
      frameRanges(content).map { case (s, e) =>
        java.util.Arrays.copyOfRange(content, s, e)
      }
  }

  /** Real in-JDK decoders — zero external dependencies:
    *   - image via javax.imageio (PNG / BMP / GIF / JPEG): decoded
    *     pixels reduce to a 4×4 grid of mean luminance;
    *   - audio via javax.sound.sampled (WAV / AIFF / AU): decoded PCM
    *     reduces to per-segment RMS energy over 16 equal time slices;
    *   - video via [[MjpegCodec]] for MJPEG payloads: up to 8 frames
    *     sampled evenly across the stream, each decoded by the JDK
    *     JPEG codec to the image luminance grid, averaged per cell —
    *     a real temporal-mean video feature from real decoded pixels.
    * All are 16-dim, deterministic for a given encoded payload, and
    * identical for byte-identical media regardless of container
    * details. Non-MJPEG video (H.264/VP9/AV1…) has no in-JDK codec
    * and falls back to StubDecoder, as does any undecodable payload
    * (truncated file, codec plugin throwing) — a decode failure must
    * not kill a 100 TB batch job over one bad blob, so failures
    * degrade per-record, not per-task. JDK image/sound plugins throw
    * RuntimeExceptions (not just IOException) on malformed payloads,
    * hence the NonFatal catch.
    */
  object JdkMediaDecoder extends MediaDecoder {
    val featureDim = 16

    def decode(kind: String, content: Array[Byte]): Array[Float] = kind match {
      case "image" => decodeImage(content)
      case "audio" => decodeAudio(content)
      case "video" => decodeVideo(content)
      case _ => StubDecoder.decode(kind, content)
    }

    /** Sample ≤ 8 frames evenly (deterministic indices), decode each
      * with the JDK JPEG codec, average the luminance grids. Frames
      * that fail to decode are skipped; if nothing decodes (or the
      * payload isn't MJPEG at all) the stub stands in, per the
      * per-record degradation policy.
      */
    private def decodeVideo(content: Array[Byte]): Array[Float] = {
      if (!MjpegCodec.isMjpeg(content))
        return StubDecoder.decode("video", content)
      val all = MjpegCodec.frames(content)
      if (all.isEmpty) return StubDecoder.decode("video", content)
      val k = math.min(8, all.length)
      val sampled = (0 until k).map(i => all((i.toLong * all.length / k).toInt))
      val grids = sampled.flatMap(decodeImageOpt)
      if (grids.isEmpty) return StubDecoder.decode("video", content)
      val out = new Array[Float](featureDim)
      var c = 0
      while (c < featureDim) {
        var s = 0.0
        grids.foreach(g => s += g(c))
        out(c) = (s / grids.length).toFloat
        c += 1
      }
      out
    }

    /** WAV/AIFF/AU → mono PCM → RMS energy per 1/16th of the clip,
      * normalized to [0,1] by full-scale 16-bit amplitude.
      */
    private def decodeAudio(content: Array[Byte]): Array[Float] = {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val pcmBytes =
        try {
          val in = AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(content))
          val base = in.getFormat
          val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            base.getSampleRate, 16, base.getChannels,
            base.getChannels * 2, base.getSampleRate, false)
          AudioSystem.getAudioInputStream(target, in).readAllBytes()
        } catch { case scala.util.control.NonFatal(_) => null }
      if (pcmBytes == null || pcmBytes.length < 2)
        return StubDecoder.decode("audio", content)
      // 16-bit little-endian, channels interleaved → mean over channels
      // is unnecessary for energy: treat every sample uniformly.
      val nSamples = pcmBytes.length / 2
      val sumsq = new Array[Double](featureDim)
      val counts = new Array[Int](featureDim)
      var i = 0
      while (i < nSamples) {
        val s = ((pcmBytes(2 * i + 1) << 8) | (pcmBytes(2 * i) & 0xff)).toShort
        val cell = (i.toLong * featureDim / nSamples).toInt
        val v = s / 32768.0
        sumsq(cell) += v * v
        counts(cell) += 1
        i += 1
      }
      val out = new Array[Float](featureDim)
      i = 0
      while (i < featureDim) {
        out(i) = if (counts(i) == 0) 0f
          else math.sqrt(sumsq(i) / counts(i)).toFloat
        i += 1
      }
      out
    }

    private def decodeImage(content: Array[Byte]): Array[Float] =
      decodeImageOpt(content)
        .getOrElse(StubDecoder.decode("image", content))

    private def decodeImageOpt(content: Array[Byte]): Option[Array[Float]] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) None
      else Some {
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Double](featureDim)
        val counts = new Array[Int](featureDim)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)) / 255.0
            val cell = (y * 4 / h) * 4 + (x * 4 / w)
            sums(cell) += lum
            counts(cell) += 1
            x += 1
          }
          y += 1
        }
        val out = new Array[Float](featureDim)
        var i = 0
        while (i < featureDim) {
          out(i) = if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat
          i += 1
        }
        out
      }
    }
  }

  /** Deterministic synthetic media table (seed per id) — the test
    * fixture for the binary-column plumbing.
    */
  def syntheticMedia(spark: SparkSession, n: Int, partitions: Int = 4): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { r =>
      val id = r
      val rng = new scala.util.Random(id * 7919 + 13)
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val bytes = Array.fill((64 + rng.nextInt(192)).toInt)(rng.nextInt(256).toByte)
      MediaRecord(id, kind, bytes,
        width = if (kind == "audio") 0 else 16 + rng.nextInt(64),
        height = if (kind == "audio") 0 else 16 + rng.nextInt(64),
        duration_ms = if (kind == "image") 0L else 1000L + rng.nextInt(9000))
    }
  }

  /** Adapt a Sources.binaryCorpus DataFrame (path, modificationTime,
    * length, content) into the typed MediaRecord pipeline: kind from
    * the file extension (unknown → "image" by default policy),
    * media_id from a hash of the path (stable across runs and
    * listings), intrinsic metadata zeroed until the decode stage fills
    * it. Pure projection — the payload bytes stay columnar and
    * unshuffled.
    */
  def fromBinary(binary: org.apache.spark.sql.DataFrame): Dataset[MediaRecord] = {
    import org.apache.spark.sql.functions._
    import binary.sparkSession.implicits._
    val ext = lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
    val kind = when(ext.isin("jpg", "jpeg", "png", "gif", "bmp"), "image")
      .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
      .when(ext.isin("mp4", "mkv", "webm", "avi"), "video")
      .otherwise("image")
    binary.select(
      xxhash64(col("path")).as("media_id"),
      kind.as("kind"),
      col("content"),
      lit(0).as("width"), lit(0).as("height"), lit(0L).as("duration_ms"))
      .as[MediaRecord]
  }

  /** Fill intrinsic video metadata (width, height, duration_ms) from
    * the payload's CONTAINER headers — `ContainerMeta` parses the
    * public MP4/ISO-BMFF box tree and the Matroska/WebM EBML tree, so
    * the values come from the real bytes, no codec needed. Non-video
    * records and unparseable payloads pass through unchanged (per-
    * record degradation, same policy as decode). Narrow map — keeps
    * the input partitioning, bytes never leave their partition.
    */
  def probeMetadata(ds: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { m =>
        if (m.kind != "video") m
        else ContainerMeta.parse(m.content) match {
          case Some(v) =>
            m.copy(width = v.width, height = v.height, duration_ms = v.durationMs)
          case None if MjpegCodec.isMjpeg(m.content) =>
            // containerless MJPEG elementary stream: the resolution is
            // intrinsic to the first frame's JPEG headers (the JDK
            // codec reads it); duration is not encoded — left as-is
            val dims =
              try {
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(
                    MjpegCodec.frames(m.content).headOption.getOrElse(m.content)))
                if (img == null) None else Some((img.getWidth, img.getHeight))
              } catch { case scala.util.control.NonFatal(_) => None }
            dims.fold(m) { case (w, h) => m.copy(width = w, height = h) }
          case None => m
        }
      }
    }
  }

  /** Batched feature extraction: mapPartitions + grouped(batchSize), so
    * a real decoder initializes once per partition and processes
    * fixed-size batches (the Arrow-batch shape). Narrow — preserves
    * partitioning.
    */
  def extractFeatures(
      ds: Dataset[MediaRecord],
      decoder: MediaDecoder = StubDecoder,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          MediaFeatures(m.media_id, m.kind, m.content.length,
            decoder.decode(m.kind, m.content))
        }
      }
    }
  }

  /** Composed multimodal near-dup pipeline: decode (batched, narrow) →
    * feature vector → random-hyperplane LSH bucket → candidate groups
    * per (kind, bucket). One declarative plan end-to-end: the only
    * shuffle is the final groupBy on (kind, bucket) carrying one row
    * per media item, and media in different buckets never meet — the
    * same pair-space pruning the text near-dup family uses, over a
    * binary modality. Swap StubDecoder for a real codec and this IS
    * image/audio near-dedup at 100 TB.
    */
  def nearDupMedia(
      ds: Dataset[MediaRecord],
      decoder: MediaDecoder = StubDecoder): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    extractFeatures(ds, decoder).toDF()
      .withColumn("vec", transform(col("features"), _.cast("double")))
      .withColumn("bucket",
        graft.operators.LshKnn.bucket(col("vec"), decoder.featureDim))
      .groupBy(col("kind"), col("bucket"))
      .agg(min(col("media_id")).as("canonical_media_id"),
        count(lit(1)).as("group_size"))
      .orderBy(asc_nulls_first("kind"), asc_nulls_first("bucket"))
  }

  /** REAL frame sampling for MJPEG video: every `everyN`-th JPEG frame
    * of the elementary stream, one row per sampled frame carrying the
    * frame's own decodable JPEG bytes (downstream: ImageIO, the image
    * feature path, thumbnailing…). Non-MJPEG payloads produce no rows
    * — frame access for inter-coded codecs needs an external decoder,
    * which is exactly the boundary StubDecoder marks. Same narrow
    * flatMap fan-out shape as [[frameSample]].
    */
  def mjpegFrames(
      ds: Dataset[MediaRecord],
      everyN: Int = 2): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { m =>
      if (m.kind != "video" || !MjpegCodec.isMjpeg(m.content)) Iterator.empty
      else MjpegCodec.frames(m.content).iterator.zipWithIndex.collect {
        case (jpeg, idx) if idx % everyN == 0 => Frame(m.media_id, idx, jpeg)
      }
    }
  }

  /** Frame sampling: every `everyN`-th fixed-size chunk of the payload
    * (a real video decoder would seek keyframes; the chunking shape and
    * fan-out are identical). One input row → 0..n frame rows.
    */
  def frameSample(
      ds: Dataset[MediaRecord],
      frameBytes: Int = 32,
      everyN: Int = 2): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { m =>
      m.content.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, idx) if idx % everyN == 0 => Frame(m.media_id, idx, chunk)
      }
    }
  }
}
