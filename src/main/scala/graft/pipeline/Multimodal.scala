package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract stages.
  *
  * Codec story (settled r11):
  *  - IMAGES decode for real via `javax.imageio` (JPEG/PNG/GIF/BMP — the
  *    readers the JDK ships; no external dependency, headless-safe).
  *    [[resize]] is a true decode + bilinear rescale and
  *    [[extractFeatures]] computes pixel-luminance features whenever the
  *    payload parses as an image.
  *  - AUDIO decodes for real via `javax.sound.sampled` (WAV/AIFF/AU
  *    container parsing + PCM frame decode — the readers the JDK ships).
  *    [[decodeAudio]] yields mono-mixed float samples; [[audioStats]]
  *    measures duration/rate/RMS/peak from actual samples and
  *    [[extractFeatures]] computes per-band RMS energy whenever the
  *    payload parses as audio.
  *  - COMPRESSED audio (mp3/aac): frame-header METADATA (sample rate,
  *    channels, frame count, duration, bitrate, VBR flag) parses for
  *    real via pure byte arithmetic over the container framing
  *    ([[compressedAudioMeta]] — r17 partial stub upgrade); the SAMPLES
  *    have no JVM-native codec (a real build would bind javacv/ffmpeg
  *    over JNI — unavailable offline, and the reference has no media
  *    surface at all), so sample-level features, and any undecodable
  *    blob, take a clearly-marked DETERMINISTIC FALLBACK.
  *  - VIDEO container METADATA (MP4/MOV box structure and Matroska/WebM
  *    EBML elements: duration, track count, codec fourccs, dimensions)
  *    parses for real via pure byte arithmetic ([[videoMeta]] — r18,
  *    same upgrade path as audio); frame/sample decode remains the
  *    deterministic fallback.
  *    Either way the distributed plumbing — schema,
  *    batching, 1→n flatMap demux shape, per-partition codec
  *    amortization via `mapPartitions` (the Scala analogue of
  *    `mapInPandas`) — is fully exercised and oracle-pinned.
  */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),        // image | audio | video
    StructField("mime", StringType),
    StructField("payload", BinaryType),
    StructField("width", IntegerType),      // image/video
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))  // audio/video

  final case class MediaRow(
      media_id: Long, kind: String, mime: String, payload: Array[Byte],
      width: Option[Int], height: Option[Int], duration_ms: Option[Long])

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int, byte_mean: Double, feature: Array[Float])

  /** Synthesize a media table from any id-bearing frame — payload bytes
    * are a deterministic function of the id (test plumbing; at production
    * scale this column comes from the lakehouse).
    */
  def syntheticMedia(df: DataFrame, idCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      get(array(lit("image"), lit("audio"), lit("video")), pmod(col(idCol), lit(3)).cast("int")).as("kind"),
      lit("application/octet-stream").as("mime"),
      unhex(sha2(col(idCol).cast("string"), 256)).as("payload"),
      lit(64).as("width"), lit(64).as("height"), lit(1000L).as("duration_ms"))

  /** REAL image decode: `javax.imageio` over the payload bytes. None for
    * anything the JDK has no reader for (audio/video/opaque blobs) — the
    * caller then takes the deterministic fallback. Cheap rejection:
    * ImageIO sniffs magic bytes before parsing, so non-image payloads
    * cost a header check, not a decode attempt.
    */
  // ImageIO's default stream cache is a TEMP FILE per read — for
  // byte-array payloads that is a disk create/delete per row (measured
  // ~0.4 ms each, the whole cost of a 5k-row feature pass). In-memory
  // cache is strictly better here: the source is already in memory.
  private lazy val imageIoNoDiskCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Container-magic prefix sniff — the formats the JDK's readers can
    * open (ImageIO: PNG/JPEG/GIF/BMP/WBMP/TIFF; sampled audio: WAV/AIFF/
    * AU). Both decoder stacks reject any OTHER prefix after iterating
    * every registered provider (AudioSystem by throwing per provider) —
    * measured ~0.2 ms of pure rejection machinery per opaque row, the
    * dominant cost of a feature pass over a mostly-non-media corpus. A
    * prefix miss is exactly the providers' own verdict, reached without
    * them; a prefix HIT still goes through the real decoder (lying
    * headers take the fallback there, MultimodalSpec-pinned).
    */
  private[graft] def sniffsImage(p: Array[Byte]): Boolean =
    p.length >= 4 && {
      val b0 = p(0) & 0xFF; val b1 = p(1) & 0xFF
      (b0 == 0x89 && b1 == 'P') ||              // PNG
      (b0 == 0xFF && b1 == 0xD8) ||             // JPEG
      (b0 == 'G' && b1 == 'I' && p(2) == 'F') ||// GIF
      (b0 == 'B' && b1 == 'M') ||               // BMP
      (b0 == 'I' && b1 == 'I' && (p(2) & 0xFF) == 0x2A) || // TIFF LE
      (b0 == 'M' && b1 == 'M' && (p(3) & 0xFF) == 0x2A) || // TIFF BE
      (b0 == 0x00 && (b1 == 0x00 || b1 == 0x02))           // WBMP
    }

  private[graft] def sniffsAudio(p: Array[Byte]): Boolean =
    p.length >= 12 && {
      (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') ||
      (p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M') || // AIFF
      (p(0) == '.' && p(1) == 's' && p(2) == 'n' && p(3) == 'd')    // AU
    }

  private[graft] def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (payload == null || payload.length == 0 || !sniffsImage(payload)) None
    else try { imageIoNoDiskCache
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))) }
    // NonFatal, not just IOException: the JDK plugin readers throw
    // unchecked exceptions on payloads whose magic bytes LIE (truncated
    // JPEG → CMMException / IndexOutOfBounds; real crawls contain these),
    // and one such row must take the fallback, not kill the job
    catch { case scala.util.control.NonFatal(_) => None }

  /** A REAL decoded audio clip: mono-mixed float samples in [-1, 1]. */
  final case class AudioClip(sampleRate: Float, channels: Int, samples: Array[Float]) {
    def durationMs: Long =
      if (sampleRate <= 0) 0L else (samples.length * 1000.0 / sampleRate).toLong
  }

  /** REAL audio decode: `javax.sound.sampled` container parsing (WAV/
    * AIFF/AU — the JDK's readers) + PCM frame decode, mono-mixed by
    * channel averaging. Non-PCM encodings (a-law/µ-law) are converted
    * through the JDK's codec chain to 16-bit signed first. None for
    * anything without a JDK reader (mp3/aac/video/blobs) — the caller
    * then takes the deterministic fallback. Cheap rejection: the readers
    * sniff container magic before parsing frames.
    */
  private[graft] def decodeAudio(payload: Array[Byte]): Option[AudioClip] =
    if (payload == null || payload.length < 12 || !sniffsAudio(payload)) None
    else try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val raw = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      try {
        val src = raw.getFormat
        val pcm = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          src.getChannels * 2, src.getSampleRate, false)
        val in = if (src.matches(pcm)) raw else AudioSystem.getAudioInputStream(pcm, raw)
        try {
          val bytes = in.readAllBytes()
          val ch = pcm.getChannels
          val nFrames = bytes.length / (2 * ch)
          val samples = new Array[Float](nFrames)
          var f = 0
          while (f < nFrames) {
            var acc = 0.0f
            var c = 0
            while (c < ch) {
              val o = (f * ch + c) * 2
              val s = ((bytes(o) & 0xFF) | (bytes(o + 1) << 8)).toShort
              acc += s / 32768.0f
              c += 1
            }
            samples(f) = acc / ch
            f += 1
          }
          Some(AudioClip(pcm.getSampleRate, ch, samples))
        } finally in.close()
      } finally raw.close()
    } catch {
      // UnsupportedAudioFileException for foreign containers; unchecked
      // errors for containers whose headers LIE (truncated/corrupt WAV)
      case scala.util.control.NonFatal(_) => None
    }

  /** 8-float feature from REAL decoded audio: RMS energy of 8 equal time
    * bands — the audio twin of [[imageFeature]]'s 8 vertical luminance
    * bands (deterministic, duration-independent; the real-build seam for
    * a learned audio embedding).
    */
  private def audioFeature(clip: AudioClip): Array[Float] = {
    val n = clip.samples.length
    if (n == 0) return new Array[Float](8)
    val sums = new Array[Double](8)
    val counts = new Array[Long](8)
    var i = 0
    while (i < n) {
      val b = (i * 8L / n).toInt
      val s = clip.samples(i)
      sums(b) += s.toDouble * s
      counts(b) += 1
      i += 1
    }
    Array.tabulate(8)(b => if (counts(b) == 0) 0f else math.sqrt(sums(b) / counts(b)).toFloat)
  }

  final case class AudioStats(
      media_id: Long, sample_rate: Double, channels: Int, n_samples: Long,
      duration_ms: Long, rms: Double, peak: Double)

  /** Measured audio statistics — duration/rate from the DECODED stream
    * (not trusted metadata), RMS and peak from actual samples. One
    * `mapPartitions` pass; rows that don't parse as audio produce no
    * output (flatMap), mirroring [[encodeThumbnails]] for images.
    */
  def audioStats(media: DataFrame): Dataset[AudioStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          decodeAudio(payload).map { clip =>
            var peak = 0.0; var sq = 0.0
            var i = 0
            while (i < clip.samples.length) {
              val s = clip.samples(i).toDouble
              peak = math.max(peak, math.abs(s)); sq += s * s
              i += 1
            }
            val n = clip.samples.length
            AudioStats(id, clip.sampleRate.toDouble, clip.channels, n.toLong,
              clip.durationMs, if (n == 0) 0.0 else math.sqrt(sq / n), peak)
          }
        }
      }
  }

  /** Frame-header metadata of COMPRESSED audio (mp3 / ADTS-AAC) — pure
    * byte arithmetic over the container framing, no codec needed, so this
    * much IS real even offline (r16 verdict: partial stub upgrade). The
    * SAMPLES remain undecodable without a codec lib; only
    * [[extractFeatures]]' fallback path covers those.
    */
  final case class CompressedAudioMeta(
      format: String, sample_rate: Int, channels: Int, n_frames: Long,
      duration_ms: Long, bitrate_kbps: Int, vbr: Boolean)

  // MPEG audio (mp3) bitrate tables, kbps, index 1..14 (0 = free-format,
  // 15 = invalid — both rejected). Rows: V1L1 V1L2 V1L3 V2L1 V2L23.
  private val Mp3Bitrates: Array[Array[Int]] = Array(
    Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))

  /** Walk MPEG-audio (mp3) frames: header sync 11×1 bits, version/layer/
    * bitrate/samplerate fields, frame length from the standard formula.
    * Leading ID3v2 tags are skipped (syncsafe size); the walk stops at
    * trailing garbage (ID3v1 'TAG', truncation). ≥2 consecutive valid
    * frames required unless the stream is a single complete frame —
    * random bytes hit the 0xFFE sync too often to classify on one header.
    */
  private[graft] def parseMp3Meta(payload: Array[Byte]): Option[CompressedAudioMeta] = {
    if (payload == null || payload.length < 4) return None
    var pos = 0
    // ID3v2: "ID3" + ver(2) + flags(1) + syncsafe size(4), then the tag.
    // The syncsafe size EXCLUDES the 10-byte header and — when the
    // footer flag (byte 5, bit 0x10, ID3v2.4) is set — the 10-byte
    // trailing footer, so a footered tag needs 10 extra bytes skipped or
    // the frame walk starts inside the footer and rejects a valid file.
    if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' && payload(2) == '3') {
      val size = ((payload(6) & 0x7F) << 21) | ((payload(7) & 0x7F) << 14) |
        ((payload(8) & 0x7F) << 7) | (payload(9) & 0x7F)
      val footer = if ((payload(5) & 0x10) != 0) 10 else 0
      pos = 10 + size + footer
    }
    var frames = 0L
    var durUs = 0.0
    var kbpsSum = 0L
    var kbpsFirst = -1
    var vbr = false
    var channels = 2
    var sampleRate = 0
    var complete = true // every walked frame fully inside the payload
    var ok = true
    while (ok && pos + 4 <= payload.length) {
      val b1 = payload(pos) & 0xFF; val b2 = payload(pos + 1) & 0xFF
      val b3 = payload(pos + 2) & 0xFF; val b4 = payload(pos + 3) & 0xFF
      val version = (b2 >> 3) & 3 // 0=2.5, 1=reserved, 2=V2, 3=V1
      val layer = (b2 >> 1) & 3   // 0=reserved, 1=III, 2=II, 3=I
      val brIdx = (b3 >> 4) & 15
      val srIdx = (b3 >> 2) & 3
      if (b1 != 0xFF || (b2 & 0xE0) != 0xE0 || version == 1 || layer == 0 ||
          brIdx == 0 || brIdx == 15 || srIdx == 3) { ok = false }
      else {
        val baseSr = Array(44100, 48000, 32000)(srIdx)
        val sr = version match {
          case 3 => baseSr; case 2 => baseSr / 2; case _ => baseSr / 4
        }
        val row = (version, layer) match {
          case (3, 3) => 0; case (3, 2) => 1; case (3, 1) => 2
          case (_, 3) => 3; case _      => 4
        }
        val kbps = Mp3Bitrates(row)(brIdx - 1)
        val padding = (b3 >> 1) & 1
        val samples = layer match {
          case 3 => 384              // Layer I
          case 2 => 1152             // Layer II
          case _ => if (version == 3) 1152 else 576 // Layer III
        }
        val frameBytes =
          if (layer == 3) (12 * kbps * 1000 / sr + padding) * 4
          else samples / 8 * kbps * 1000 / sr + padding
        if (frameBytes <= 4) ok = false
        else {
          frames += 1
          durUs += samples * 1e6 / sr
          kbpsSum += kbps
          if (kbpsFirst < 0) kbpsFirst = kbps else if (kbps != kbpsFirst) vbr = true
          channels = if (((b4 >> 6) & 3) == 3) 1 else 2
          sampleRate = sr
          if (pos + frameBytes > payload.length) complete = false
          pos += frameBytes
        }
      }
    }
    // single-frame acceptance only when the frame IS the payload (plus at
    // most an ID3v1 trailer) — random bytes can spell one low-bitrate
    // frame header, but not one that happens to span the whole blob
    val tailOk = pos >= payload.length - 3 ||
      (pos + 3 <= payload.length && payload(pos) == 'T' && payload(pos + 1) == 'A' &&
        payload(pos + 2) == 'G')
    if (frames == 0 || (frames == 1 && !(complete && tailOk))) None
    else Some(CompressedAudioMeta("mp3", sampleRate, channels, frames,
      (durUs / 1000.0).round, (kbpsSum.toDouble / frames).round.toInt, vbr))
  }

  /** Walk ADTS (AAC transport) frames: 12-bit sync + layer 00, sampling-
    * frequency index table, 13-bit frame length in the header itself,
    * 1024 samples per raw data block. Bitrate is derived (bytes·8 ∕
    * duration) — ADTS carries none; the all-ones buffer-fullness value
    * (0x7FF) is the VBR marker.
    */
  private[graft] def parseAdtsMeta(payload: Array[Byte]): Option[CompressedAudioMeta] = {
    if (payload == null || payload.length < 7) return None
    val SrTable = Array(96000, 88200, 64000, 48000, 44100, 32000,
      24000, 22050, 16000, 12000, 11025, 8000, 7350)
    var pos = 0
    var frames = 0L
    var durUs = 0.0
    var bytesTotal = 0L
    var vbr = false
    var channels = 0
    var sampleRate = 0
    var complete = true
    var ok = true
    while (ok && pos + 7 <= payload.length) {
      val b1 = payload(pos) & 0xFF; val b2 = payload(pos + 1) & 0xFF
      val b3 = payload(pos + 2) & 0xFF; val b4 = payload(pos + 3) & 0xFF
      val b5 = payload(pos + 4) & 0xFF; val b6 = payload(pos + 5) & 0xFF
      val b7 = payload(pos + 6) & 0xFF
      val srIdx = (b3 >> 2) & 15
      val frameLen = ((b4 & 3) << 11) | (b5 << 3) | ((b6 >> 5) & 7)
      if (b1 != 0xFF || (b2 & 0xF6) != 0xF0 || srIdx > 12 || frameLen < 7) ok = false
      else {
        val sr = SrTable(srIdx)
        val blocks = (b7 & 3) + 1
        val chanCfg = ((b3 & 1) << 2) | ((b4 >> 6) & 3)
        val fullness = ((b6 & 0x1F) << 6) | ((b7 >> 2) & 0x3F)
        frames += 1
        durUs += blocks * 1024 * 1e6 / sr
        bytesTotal += frameLen
        if (fullness == 0x7FF) vbr = true
        channels = if (chanCfg == 7) 8 else chanCfg // 0 = signalled in-band
        sampleRate = sr
        if (pos + frameLen > payload.length) complete = false
        pos += frameLen
      }
    }
    if (frames == 0 || (frames == 1 && !complete) || durUs <= 0) None
    else Some(CompressedAudioMeta("aac", sampleRate, channels, frames,
      (durUs / 1000.0).round, (bytesTotal * 8000.0 / durUs).round.toInt, vbr))
  }

  /** FLAC STREAMINFO metadata (the format spec's mandatory first block):
    * "fLaC" magic, then metadata blocks of `(last-flag | type) +
    * 24-bit length`; STREAMINFO (type 0, 34 bytes) carries sample rate
    * (20 bits), channels-1 (3), bits-1 (5), and the 36-bit total sample
    * count. FLAC frames are inherently variable-size, so `vbr` is true
    * and `n_frames` is 0 (the frame count is not in the header — a walk
    * would decode audio); bitrate derives from payload bytes over the
    * header-declared duration. A zero total-sample count (streaming
    * encoder) yields duration 0 and bitrate 0, still a positive parse.
    */
  private[graft] def parseFlacMeta(payload: Array[Byte]): Option[CompressedAudioMeta] = {
    if (payload == null || payload.length < 42) return None
    if (!(payload(0) == 'f' && payload(1) == 'L' && payload(2) == 'a' && payload(3) == 'C'))
      return None
    val hdr = payload(4) & 0xFF
    val len = ((payload(5) & 0xFF) << 16) | ((payload(6) & 0xFF) << 8) | (payload(7) & 0xFF)
    // the spec REQUIRES STREAMINFO first (type 0, length 34)
    if ((hdr & 0x7F) != 0 || len != 34) return None
    val b = (i: Int) => payload(8 + i) & 0xFF
    val sampleRate = (b(10) << 12) | (b(11) << 4) | (b(12) >> 4)
    val channels = ((b(12) >> 1) & 7) + 1
    val totalSamples = ((b(13) & 0x0FL) << 32) |
      (b(14).toLong << 24) | (b(15).toLong << 16) | (b(16).toLong << 8) | b(17).toLong
    if (sampleRate == 0) return None // spec: 0 is invalid for audio streams
    val durMs = totalSamples * 1000.0 / sampleRate
    val kbps = if (durMs <= 0) 0 else (payload.length * 8.0 / durMs).round.toInt
    Some(CompressedAudioMeta("flac", sampleRate, channels, 0L,
      durMs.round, kbps, vbr = true))
  }

  /** Ogg (Opus/Vorbis) metadata: "OggS" page framing (version 0, 27-byte
    * header + segment table), identification header in the first page's
    * payload — `OpusHead` (channel count byte 9; Opus granules tick at
    * 48 kHz regardless of input rate) or `\x01vorbis` (channels byte 11,
    * rate LE-32 at byte 12). Duration comes from the LAST parsable
    * page's granule position over the granule rate — so a truncated
    * stream reports the duration of what's actually present (the
    * framing's own design intent). Ogg payloads are variable-bitrate by
    * nature.
    */
  private[graft] def parseOggMeta(payload: Array[Byte]): Option[CompressedAudioMeta] = {
    if (payload == null || payload.length < 28) return None
    def isPage(p: Int): Boolean = p + 27 <= payload.length &&
      payload(p) == 'O' && payload(p + 1) == 'g' && payload(p + 2) == 'g' &&
      payload(p + 3) == 'S' && payload(p + 4) == 0
    if (!isPage(0)) return None
    var pos = 0
    var lastGranule = 0L
    var firstBody: Option[(Int, Int)] = None
    var pages = 0L
    while (isPage(pos)) {
      var granule = 0L
      var i = 7
      while (i >= 0) { granule = (granule << 8) | (payload(pos + 6 + i) & 0xFF); i -= 1 }
      val nsegs = payload(pos + 26) & 0xFF
      if (pos + 27 + nsegs > payload.length) return if (pages == 0) None else finishOgg(
        payload, firstBody, lastGranule, pages)
      var bodyLen = 0
      var s = 0
      while (s < nsegs) { bodyLen += payload(pos + 27 + s) & 0xFF; s += 1 }
      val bodyStart = pos + 27 + nsegs
      val whole = bodyStart + bodyLen <= payload.length
      if (pages == 0) firstBody = Some((bodyStart, math.min(bodyStart + bodyLen, payload.length)))
      if (whole && granule >= 0) lastGranule = math.max(lastGranule, granule)
      pages += 1
      if (!whole) return finishOgg(payload, firstBody, lastGranule, pages)
      pos = bodyStart + bodyLen
    }
    if (pages == 0) None else finishOgg(payload, firstBody, lastGranule, pages)
  }

  private def finishOgg(
      payload: Array[Byte],
      firstBody: Option[(Int, Int)],
      lastGranule: Long,
      pages: Long): Option[CompressedAudioMeta] = firstBody.flatMap { case (s, e) =>
    def bytesAt(p: Int, magic: String): Boolean =
      p + magic.length <= e && magic.zipWithIndex.forall { case (c, i) => payload(p + i) == c }
    def le32(p: Int): Int =
      (payload(p) & 0xFF) | ((payload(p + 1) & 0xFF) << 8) |
        ((payload(p + 2) & 0xFF) << 16) | ((payload(p + 3) & 0xFF) << 24)
    if (bytesAt(s, "OpusHead") && e - s >= 19) {
      val channels = payload(s + 9) & 0xFF
      val durMs = lastGranule * 1000.0 / 48000.0 // Opus granules tick at 48 kHz
      val kbps = if (durMs <= 0) 0 else (payload.length * 8.0 / durMs).round.toInt
      Some(CompressedAudioMeta("opus", 48000, channels, pages, durMs.round, kbps, vbr = true))
    } else if (e - s >= 30 && payload(s) == 1 && bytesAt(s + 1, "vorbis")) {
      val channels = payload(s + 11) & 0xFF
      val rate = le32(s + 12)
      if (rate <= 0) None
      else {
        val durMs = lastGranule * 1000.0 / rate
        val kbps = if (durMs <= 0) 0 else (payload.length * 8.0 / durMs).round.toInt
        Some(CompressedAudioMeta("vorbis", rate, channels, pages, durMs.round, kbps, vbr = true))
      }
    } else None
  }

  final case class CompressedAudioRow(
      media_id: Long, format: String, sample_rate: Int, channels: Int,
      n_frames: Long, duration_ms: Long, bitrate_kbps: Int, vbr: Boolean)

  /** Compressed-audio metadata pass: one `mapPartitions` flatMap over
    * payload bytes; rows that parse as none of ADTS-AAC / mp3 / FLAC /
    * Ogg (Opus/Vorbis) produce no output (same demux shape as
    * [[audioStats]]). ADTS is probed first — its sync (0xFFF + layer 00)
    * reads as an invalid mp3 header, while an mp3 sync never satisfies
    * the ADTS layer bits; FLAC and Ogg have unambiguous magics. For Ogg,
    * `n_frames` counts PAGES (the container's framing unit); FLAC's
    * header has no frame count, so it reports 0.
    */
  def compressedAudioMeta(media: DataFrame): Dataset[CompressedAudioRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          parseAdtsMeta(payload).orElse(parseMp3Meta(payload))
            .orElse(parseFlacMeta(payload)).orElse(parseOggMeta(payload)).map(m =>
            CompressedAudioRow(id, m.format, m.sample_rate, m.channels,
              m.n_frames, m.duration_ms, m.bitrate_kbps, m.vbr))
        }
      }
  }

  final case class VideoMeta(
      container: String, brand: String, duration_ms: Long, n_tracks: Int,
      video_codec: Option[String], audio_codec: Option[String],
      width: Option[Int], height: Option[Int])

  /** MP4/MOV (ISO BMFF, ISO 14496-12) container metadata by pure byte
    * arithmetic — the video analogue of the r17 mp3/ADTS upgrade: real
    * box-structure parsing (duration, track count, codec fourccs, video
    * dimensions), no codec binding needed. Boxes are `size(u32 BE) +
    * fourcc`, size 1 → 64-bit largesize follows, size 0 → to the end of
    * the enclosing box; the walk descends exactly the metadata spine
    * (`moov → mvhd/trak → tkhd + mdia → hdlr + minf → stbl → stsd`).
    *
    * Positive identification requires a leading `ftyp` box AND a
    * complete `moov` — random bytes don't spell both. A file whose
    * trailing `mdat` is truncated still parses (metadata-only contract,
    * same stance as the audio walkers' `complete` handling); a truncated
    * or malformed `moov` rejects. Duration: mvhd duration/timescale;
    * dimensions: the first video trak's tkhd 16.16 fixed-point values;
    * codecs: the first stsd sample-entry fourcc of the first video /
    * audio handler track.
    */
  private[graft] def parseMp4Meta(payload: Array[Byte]): Option[VideoMeta] = {
    if (payload == null || payload.length < 16) return None
    val n = payload.length
    def u32(p: Int): Long =
      ((payload(p) & 0xFFL) << 24) | ((payload(p + 1) & 0xFFL) << 16) |
        ((payload(p + 2) & 0xFFL) << 8) | (payload(p + 3) & 0xFFL)
    def u64(p: Int): Long = (u32(p) << 32) | u32(p + 4)
    def fourcc(p: Int): String =
      new String(payload, p, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
    // children of the box body [start, end): (type, bodyStart, bodyEnd).
    // None on any malformed/overrunning child — the caller decides
    // whether truncation is tolerable at its level.
    def children(start: Int, end: Int): Option[Vector[(String, Int, Int)]] = {
      val out = Vector.newBuilder[(String, Int, Int)]
      var pos = start
      while (pos < end) {
        if (pos + 8 > end) return None
        var size = u32(pos)
        var hdr = 8
        val typ = fourcc(pos + 4)
        if (size == 1) {
          if (pos + 16 > end) return None
          size = u64(pos + 8); hdr = 16
        } else if (size == 0) size = (end - pos).toLong
        if (size < hdr || pos.toLong + size > end) return None
        out += ((typ, pos + hdr, pos + size.toInt))
        pos += size.toInt
      }
      Some(out.result())
    }
    def child(cs: Vector[(String, Int, Int)], typ: String): Option[(Int, Int)] =
      cs.collectFirst { case (t, s, e) if t == typ => (s, e) }

    // top level: first box MUST be ftyp (the positive-ID gate); then walk
    // until moov, tolerating one trailing truncated box (an interrupted
    // mdat download) only AFTER moov was seen whole
    if (fourcc(4) != "ftyp") return None
    val ftypSize = u32(0)
    if (ftypSize < 16 || ftypSize > n) return None
    val brand = fourcc(8)
    var pos = ftypSize.toInt
    var moov: Option[(Int, Int)] = None
    var walking = true
    while (walking && moov.isEmpty && pos + 8 <= n) {
      var size = u32(pos)
      var hdr = 8
      val typ = fourcc(pos + 4)
      if (size == 1 && pos + 16 <= n) { size = u64(pos + 8); hdr = 16 }
      else if (size == 0) size = (n - pos).toLong
      if (size < hdr) walking = false // malformed header: stop, no moov → reject
      else if (pos.toLong + size > n) walking = false // truncated box: moov must be whole
      else {
        if (typ == "moov") moov = Some((pos + hdr, pos + size.toInt))
        pos += size.toInt
      }
    }
    moov.flatMap { case (ms, me) =>
      children(ms, me).flatMap { mc =>
        child(mc, "mvhd").flatMap { case (q, qe) =>
          if (qe - q < 4) None
          else {
            val v = payload(q) & 0xFF
            val need = if (v == 1) 32 else 20
            if (qe - q < need) None
            else {
              val timescale = if (v == 1) u32(q + 20) else u32(q + 12)
              val duration = if (v == 1) u64(q + 24) else u32(q + 16)
              if (timescale == 0) None
              else {
                val traks = mc.filter(_._1 == "trak")
                var videoCodec: Option[String] = None
                var audioCodec: Option[String] = None
                var w: Option[Int] = None
                var h: Option[Int] = None
                traks.foreach { case (_, ts, te) =>
                  for {
                    tc <- children(ts, te)
                    (mds, mde) <- child(tc, "mdia")
                    mdc <- children(mds, mde)
                    (hs, he) <- child(mdc, "hdlr") if he - hs >= 12
                  } {
                    val handler = fourcc(hs + 8)
                    val codec = for {
                      (mis, mie) <- child(mdc, "minf")
                      mic <- children(mis, mie)
                      (sts, ste) <- child(mic, "stbl")
                      stc <- children(sts, ste)
                      (sds, sde) <- child(stc, "stsd") if sde - sds >= 16
                    } yield fourcc(sds + 12)
                    if (handler == "vide" && videoCodec.isEmpty) {
                      videoCodec = codec
                      for ((ks, ke) <- child(tc, "tkhd") if ke - ks >= 4) {
                        val kv = payload(ks) & 0xFF
                        val (wOff, hOff) = if (kv == 1) (88, 92) else (76, 80)
                        if (ke - ks >= hOff + 4) {
                          w = Some((u32(ks + wOff) >> 16).toInt)
                          h = Some((u32(ks + hOff) >> 16).toInt)
                        }
                      }
                    } else if (handler == "soun" && audioCodec.isEmpty) {
                      audioCodec = codec
                    }
                  }
                }
                Some(VideoMeta("mp4", brand, duration * 1000L / timescale,
                  traks.size, videoCodec, audioCodec, w, h))
              }
            }
          }
        }
      }
    }
  }

  /** Matroska/WebM (EBML, RFC 8794 + the public Matroska element IDs)
    * container metadata — the second video container family, same pure
    * byte arithmetic as [[parseMp4Meta]]. EBML elements are
    * `VINT id + VINT size + payload` (id keeps its length-marker bit,
    * size clears it; all-ones size = unknown extent, runs to the end of
    * the enclosing element — a live-stream Segment). The walk descends
    * `Segment → Info (TimestampScale, Duration) + Tracks → TrackEntry
    * (TrackType, CodecID, Video → PixelWidth/PixelHeight)`.
    *
    * Positive identification: the EBML magic 0x1A45DFA3 AND a DocType
    * ("matroska"/"webm" — reported as the brand) AND a parsable Tracks
    * element. Truncated Cluster (media) data after the metadata is
    * tolerated — the walk keeps whole children parsed before the
    * overrun; a malformed header/Tracks rejects. Duration is optional
    * in Matroska (live streams): absent → 0 ms, scale defaults to the
    * spec's 1,000,000 ns/tick.
    */
  private[graft] def parseMkvMeta(payload: Array[Byte]): Option[VideoMeta] = {
    if (payload == null || payload.length < 8) return None
    val n = payload.length
    // VINT: leading-zero count of the first byte gives the length;
    // `clear` strips the marker bit (sizes) or keeps it (ids)
    def vint(pos: Int, end: Int, clear: Boolean): Option[(Long, Int)] = {
      if (pos >= end) return None
      val b0 = payload(pos) & 0xFF
      if (b0 == 0) return None // would be a >8-byte VINT
      val len = Integer.numberOfLeadingZeros(b0) - 23
      if (len > 8 || pos + len > end) return None
      var v = (if (clear) b0 & ((1 << (8 - len)) - 1) else b0).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (payload(pos + i) & 0xFF); i += 1 }
      Some((v, len))
    }
    // children of [start, end): (id, bodyStart, bodyEnd); stops BEFORE a
    // malformed/overrunning child, keeping what parsed whole (truncated
    // trailing Clusters are the mdat case)
    def children(start: Int, end: Int): Vector[(Long, Int, Int)] = {
      val out = Vector.newBuilder[(Long, Int, Int)]
      var pos = start
      var walking = true
      while (walking && pos < end) {
        val parsed = for {
          (id, idLen) <- vint(pos, end, clear = false)
          (size, szLen) <- vint(pos + idLen, end, clear = true)
        } yield {
          val bodyStart = pos + idLen + szLen
          val unknown = size == (1L << (7 * szLen)) - 1
          val bodyEnd = if (unknown) end.toLong else bodyStart + size
          (id, bodyStart, bodyEnd)
        }
        parsed match {
          case Some((id, bs, be)) if be <= end =>
            out += ((id, bs, be.toInt)); pos = be.toInt
          case _ => walking = false
        }
      }
      out.result()
    }
    def uint(s: Int, e: Int): Long = {
      var v = 0L; var i = s
      while (i < e && i - s < 8) { v = (v << 8) | (payload(i) & 0xFF); i += 1 }
      v
    }
    def fl(s: Int, e: Int): Double = (e - s) match {
      case 4 => java.lang.Float.intBitsToFloat(uint(s, e).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(uint(s, e))
      case _ => 0.0
    }
    def str(s: Int, e: Int): String =
      new String(payload, s, e - s, java.nio.charset.StandardCharsets.ISO_8859_1)
        .takeWhile(_ != 0.toChar) // EBML strings may be zero-padded to reserve space

    val top = children(0, n)
    val header = top.collectFirst { case (0x1A45DFA3L, s, e) => (s, e) }
    if (header.isEmpty || top.head._1 != 0x1A45DFA3L) return None
    val docType = header.flatMap { case (s, e) =>
      children(s, e).collectFirst { case (0x4282L, ds, de) => str(ds, de) }
    }.getOrElse("matroska") // DocType's spec default
    if (docType != "matroska" && docType != "webm") return None
    // Find the Segment at top level ourselves: a Segment whose declared
    // extent overruns the payload (an interrupted download cut inside
    // trailing Cluster media — the mdat case) must be CLAMPED to the
    // payload end, not dropped; the inner walk then keeps whole metadata
    // children and the Tracks requirement decides whether enough
    // survived. children() would drop the whole overrunning element.
    var segBounds: Option[(Int, Int)] = None
    var pos = header.get._2
    var walking = true
    while (walking && segBounds.isEmpty && pos < n) {
      val next = for {
        (idv, idLen) <- vint(pos, n, clear = false)
        (size, szLen) <- vint(pos + idLen, n, clear = true)
      } yield {
        val bs = pos + idLen + szLen
        val beL = if (size == (1L << (7 * szLen)) - 1) n.toLong else bs.toLong + size
        (idv, bs, beL)
      }
      next match {
        case Some((idv, bs, beL)) =>
          if (idv == 0x18538067L) segBounds = Some((bs, math.min(beL, n.toLong).toInt))
          else if (beL > n) walking = false
          else pos = beL.toInt
        case None => walking = false
      }
    }
    segBounds.flatMap { case (ss, se) =>
      val seg = children(ss, se)
      var scale = 1000000L // TimestampScale default: ns per tick
      var durTicks = 0.0
      seg.collectFirst { case (0x1549A966L, s, e) => (s, e) }.foreach { case (is, ie) =>
        children(is, ie).foreach {
          case (0x2AD7B1L, s, e) => scale = uint(s, e)
          case (0x4489L, s, e)   => durTicks = fl(s, e)
          case _                 => ()
        }
      }
      seg.collectFirst { case (0x1654AE6BL, s, e) => (s, e) }.map { case (ts, te) =>
        val entries = children(ts, te).filter(_._1 == 0xAEL)
        var videoCodec: Option[String] = None
        var audioCodec: Option[String] = None
        var w: Option[Int] = None
        var h: Option[Int] = None
        entries.foreach { case (_, es, ee) =>
          val tc = children(es, ee)
          val kind = tc.collectFirst { case (0x83L, s, e) => uint(s, e) }
          val codec = tc.collectFirst { case (0x86L, s, e) => str(s, e) }
          if (kind.contains(1L) && videoCodec.isEmpty) {
            videoCodec = codec
            tc.collectFirst { case (0xE0L, s, e) => (s, e) }.foreach { case (vs, ve) =>
              children(vs, ve).foreach {
                case (0xB0L, s, e) => w = Some(uint(s, e).toInt)
                case (0xBAL, s, e) => h = Some(uint(s, e).toInt)
                case _             => ()
              }
            }
          } else if (kind.contains(2L) && audioCodec.isEmpty) audioCodec = codec
        }
        val durMs = if (scale <= 0) 0L else math.round(durTicks * scale / 1e6)
        VideoMeta(if (docType == "webm") "webm" else "mkv", docType, durMs,
          entries.size, videoCodec, audioCodec, w, h)
      }
    }
  }

  final case class VideoMetaRow(
      media_id: Long, container: String, brand: String, duration_ms: Long,
      n_tracks: Int, video_codec: Option[String], audio_codec: Option[String],
      width: Option[Int], height: Option[Int])

  /** Video container-metadata pass: one `mapPartitions` flatMap over
    * payload bytes (the [[compressedAudioMeta]] shape); rows that don't
    * parse as an MP4-family or Matroska/WebM container produce no
    * output. This retires
    * the wholesale video stub — what remains stubbed is SAMPLE/frame
    * decode only (no JVM codec offline; see [[decodeStub]]).
    */
  def videoMeta(media: DataFrame): Dataset[VideoMetaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          parseMp4Meta(payload).orElse(parseMkvMeta(payload)).map(m =>
            VideoMetaRow(id, m.container, m.brand, m.duration_ms, m.n_tracks,
              m.video_codec, m.audio_codec, m.width, m.height))
        }
      }
  }

  /** Generic compressed-blob metadata (gzip members / zstd frames) — the
    * r17-audio / r18-video byte-walk family applied to the compression
    * containers training corpora actually arrive in (WARC/WET dumps,
    * .jsonl.gz shards, .zst archives). No codec library involved:
    *
    *  - **zstd** (RFC 8878): pure header arithmetic — magic, frame-header
    *    descriptor (content-size / single-segment / checksum / dict-id
    *    flags, reserved bit rejects), window descriptor
    *    (`2^(10+exp) + 2^(10+exp)/8·mantissa`), dictionary id, frame
    *    content size (the 2-byte spelling carries +256), then the block
    *    walk: every block header states its on-wire length (raw = size,
    *    RLE = 1 byte, compressed = size; reserved type rejects), so
    *    frames are walked WITHOUT entropy decoding. Skippable frames
    *    (magic 0x184D2A5x) are skipped by their stated length.
    *  - **gzip** (RFC 1952): header fields (CM=8, reserved FLG bits
    *    reject; MTIME/OS/FNAME/FEXTRA/FCOMMENT/FHCRC), but DEFLATE has
    *    no length framing, so member bodies are walked with the JDK
    *    `Inflater` (public java.util.zip, a REAL decode — not a stub)
    *    and each member's CRC32 and ISIZE trailer is VERIFIED against
    *    the inflated bytes: random bytes that spell a plausible header
    *    cannot masquerade as a member. `uncompressed_size` is therefore
    *    exact (not ISIZE's mod-2^32 value).
    *
    * Multi-member/multi-frame payloads (pigz/zstd concatenation) walk
    * member-by-member; a malformed or truncated tail stops the walk —
    * members parsed so far are reported with `complete = false` (the
    * mp3 walker's stance). Nothing parsed at all → no row.
    */
  final case class CompressionMeta(
      format: String, n_members: Int, uncompressed_size: Long,
      has_checksum: Boolean, mtime: Long, os: Int, fname: Option[String],
      window_size: Long, dict_id: Long, n_blocks: Long, complete: Boolean)

  private def lu16(payload: Array[Byte], p: Int): Int =
    (payload(p) & 0xFF) | ((payload(p + 1) & 0xFF) << 8)
  private def lu32(payload: Array[Byte], p: Int): Long =
    (payload(p) & 0xFFL) | ((payload(p + 1) & 0xFFL) << 8) |
      ((payload(p + 2) & 0xFFL) << 16) | ((payload(p + 3) & 0xFFL) << 24)

  private[graft] def parseGzipMeta(payload: Array[Byte]): Option[CompressionMeta] = {
    // 10-byte header + 2-byte minimal deflate + 8-byte trailer
    if (payload == null || payload.length < 20) return None
    val n = payload.length
    var pos = 0
    var members = 0
    var total = 0L
    var mtime0 = 0L; var os0 = -1; var fname0: Option[String] = None
    var hdrCrc = false
    var ok = true
    while (ok && pos + 10 <= n &&
        (payload(pos) & 0xFF) == 0x1F && (payload(pos + 1) & 0xFF) == 0x8B) {
      val cm = payload(pos + 2) & 0xFF
      val flg = payload(pos + 3) & 0xFF
      if (cm != 8 || (flg & 0xE0) != 0) ok = false // only deflate; reserved FLG bits reject
      else {
        val mtime = lu32(payload, pos + 4)
        val os = payload(pos + 9) & 0xFF
        var p = pos + 10
        var name: Option[String] = None
        if ((flg & 4) != 0) { // FEXTRA: u16 LE length + payload
          if (p + 2 > n) ok = false
          else { p += 2 + lu16(payload, p) }
        }
        if (ok && (flg & 8) != 0) { // FNAME: zero-terminated ISO 8859-1
          var e = p
          while (e < n && payload(e) != 0) e += 1
          if (e >= n) ok = false
          else {
            name = Some(new String(payload, p, e - p, java.nio.charset.StandardCharsets.ISO_8859_1))
            p = e + 1
          }
        }
        if (ok && (flg & 16) != 0) { // FCOMMENT: zero-terminated
          var e = p
          while (e < n && payload(e) != 0) e += 1
          if (e >= n) ok = false else p = e + 1
        }
        if (ok && (flg & 2) != 0) p += 2 // FHCRC (header CRC16)
        if (!ok || p >= n) ok = false
        else {
          // DEFLATE carries no length framing: inflate to find the member
          // end, verifying the trailer CRC32/ISIZE against the real bytes
          val inf = new java.util.zip.Inflater(true)
          try {
            inf.setInput(payload, p, n - p)
            val crc = new java.util.zip.CRC32
            val buf = new Array[Byte](65536)
            var sz = 0L
            var stalled = false
            while (!inf.finished() && !stalled) {
              val k = inf.inflate(buf)
              if (k > 0) { crc.update(buf, 0, k); sz += k }
              else if (inf.needsInput() || inf.needsDictionary()) stalled = true
            }
            if (!inf.finished()) ok = false // truncated body
            else {
              val tp = p + ((n - p) - inf.getRemaining)
              if (tp + 8 > n) ok = false // truncated trailer
              else if (lu32(payload, tp) != crc.getValue ||
                  lu32(payload, tp + 4) != (sz & 0xFFFFFFFFL)) ok = false
              else {
                members += 1
                total += sz
                if (members == 1) {
                  mtime0 = mtime; os0 = os; fname0 = name; hdrCrc = (flg & 2) != 0
                }
                pos = tp + 8
              }
            }
          } catch {
            case _: java.util.zip.DataFormatException => ok = false
          } finally inf.end()
        }
      }
    }
    if (members == 0) None
    else Some(CompressionMeta("gzip", members, total, hdrCrc, mtime0, os0, fname0,
      -1L, -1L, -1L, ok && pos == n))
  }

  private[graft] def parseZstdMeta(payload: Array[Byte]): Option[CompressionMeta] = {
    if (payload == null || payload.length < 4) return None
    val n = payload.length
    var pos = 0
    var frames = 0
    var blocks = 0L
    var fcsSum = 0L; var fcsAll = true
    var window = -1L; var dict = 0L; var checksum = false
    var ok = true
    while (ok && pos + 4 <= n) {
      val magic = lu32(payload, pos)
      if (magic == 0xFD2FB528L) {
        if (pos + 5 > n) ok = false
        else {
          val fhd = payload(pos + 4) & 0xFF
          if ((fhd & 0x08) != 0) ok = false // reserved bit MUST be zero
          else {
            val fcsFlag = fhd >>> 6
            val single = (fhd & 0x20) != 0
            val cksum = (fhd & 0x04) != 0
            var p = pos + 5
            var wsz = -1L
            if (!single) {
              if (p + 1 > n) ok = false
              else {
                val wd = payload(p) & 0xFF
                val base = 1L << (10 + (wd >>> 3))
                wsz = base + (base / 8) * (wd & 7)
                p += 1
              }
            }
            val didBytes = Array(0, 1, 2, 4)(fhd & 3)
            var did = 0L
            if (ok && didBytes > 0) {
              if (p + didBytes > n) ok = false
              else {
                var i = 0
                while (i < didBytes) { did |= (payload(p + i) & 0xFFL) << (8 * i); i += 1 }
                p += didBytes
              }
            }
            val fcsBytes = fcsFlag match {
              case 0 => if (single) 1 else 0
              case 1 => 2
              case 2 => 4
              case _ => 8
            }
            var fcs = -1L
            if (ok && fcsBytes > 0) {
              if (p + fcsBytes > n) ok = false
              else {
                var v = 0L
                var i = 0
                while (i < fcsBytes) { v |= (payload(p + i) & 0xFFL) << (8 * i); i += 1 }
                fcs = if (fcsBytes == 2) v + 256 else v // 2-byte spelling is offset by 256
                p += fcsBytes
              }
            }
            if (single) wsz = fcs // single-segment: window IS the content size
            // block walk: every block header states its on-wire length
            var last = false
            while (ok && !last) {
              if (p + 3 > n) ok = false
              else {
                val bh = (payload(p) & 0xFFL) | ((payload(p + 1) & 0xFFL) << 8) |
                  ((payload(p + 2) & 0xFFL) << 16)
                last = (bh & 1) != 0
                val contentLen = ((bh >> 1) & 3) match {
                  case 0 => (bh >> 3) // raw
                  case 1 => 1L        // RLE: one byte, regenerated (bh>>3) times
                  case 2 => (bh >> 3) // compressed
                  case _ => -1L       // reserved type
                }
                if (contentLen < 0 || p + 3 + contentLen > n) ok = false
                else { p += 3 + contentLen.toInt; blocks += 1 }
              }
            }
            if (ok && cksum) { if (p + 4 > n) ok = false else p += 4 }
            if (ok) {
              frames += 1
              if (frames == 1) { window = wsz; dict = did }
              checksum = checksum || cksum
              if (fcs >= 0) fcsSum += fcs else fcsAll = false
              pos = p
            }
          }
        }
      } else if ((magic & 0xFFFFFFF0L) == 0x184D2A50L) { // skippable frame
        if (pos + 8 > n) ok = false
        else {
          val sz = lu32(payload, pos + 4)
          if (pos + 8 + sz > n) ok = false else pos += 8 + sz.toInt
        }
      } else ok = false
    }
    if (frames == 0) None
    else Some(CompressionMeta("zstd", frames, if (fcsAll) fcsSum else -1L, checksum,
      0L, -1, None, window, dict, blocks, ok && pos == n))
  }

  final case class CompressionMetaRow(
      media_id: Long, format: String, n_members: Int, uncompressed_size: Long,
      has_checksum: Boolean, mtime: Long, os: Int, fname: Option[String],
      window_size: Long, dict_id: Long, n_blocks: Long, complete: Boolean)

  /** Compressed-blob metadata pass: one `mapPartitions` flatMap over
    * payload bytes (the [[compressedAudioMeta]] shape); rows that parse
    * as neither gzip nor zstd produce no output. The magics are
    * disjoint, so probe order is immaterial. Cost note for 100 TB: the
    * zstd walk reads only headers; the gzip walk must inflate (deflate
    * has no length framing) — still one streaming pass per blob with a
    * fixed 64 KiB scratch buffer, no shuffle, no driver data.
    */
  def compressionMeta(media: DataFrame): Dataset[CompressionMetaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          parseGzipMeta(payload).orElse(parseZstdMeta(payload)).map(m =>
            CompressionMetaRow(id, m.format, m.n_members, m.uncompressed_size,
              m.has_checksum, m.mtime, m.os, m.fname,
              m.window_size, m.dict_id, m.n_blocks, m.complete))
        }
      }
  }

  /** Per-payload inflation budget for the demuxing walks: gzip carries
    * no trustworthy length framing (ISIZE is mod-2³², and a crafted
    * stream lies), so an unbounded walk over an adversarial crawl blob
    * is a decompression bomb — a 1 MB payload can inflate to GBs and
    * OOM the executor. The other byte-walkers are bounded by
    * construction (headers only); this bound closes the one unbounded
    * path. Hitting it stops the walk with the good prefix and
    * `complete = false`, the same observable as a malformed tail. 256
    * MiB comfortably covers a [[wetExport]] shard (sized to
    * ~128 MiB of uncompressed text) while capping per-task buffering.
    */
  private[graft] val MaxInflatedPayloadBytes: Long = 256L << 20

  /** One demuxed gzip member: byte offset and compressed length of the
    * member within the payload (the CDX(J) locator pair — slicing
    * `payload[offset, offset + comp_len)` yields a standalone gzip
    * stream), plus the verified decompressed bytes.
    */
  private[graft] final case class GzMember(
      offset: Long, compLen: Long, bytes: Array[Byte])

  /** The [[gunzipMembers]] walk with the knobs the archive tooling
    * needs: member byte offsets (CDX indexing), a total-inflation cap
    * (bomb safety), an optional member cap (`maxMembers` — the sniff
    * probe inflates only the first member), and an explicit
    * completeness flag (`true` iff the walk consumed the payload to its
    * last byte with every trailer verified — a truncated, malformed, or
    * over-budget tail returns the good prefix with `false`, so partial
    * parses are countable downstream instead of indistinguishable from
    * full ones). None if the payload isn't gzip or its first member is
    * malformed.
    */
  private[graft] def gunzipMembersBounded(
      payload: Array[Byte],
      maxInflated: Long = MaxInflatedPayloadBytes,
      maxMembers: Int = Int.MaxValue): Option[(Seq[GzMember], Boolean)] = {
    if (payload == null || payload.length < 20 ||
        (payload(0) & 0xFF) != 0x1F || (payload(1) & 0xFF) != 0x8B) return None
    val n = payload.length
    val members = Seq.newBuilder[GzMember]
    var count = 0
    var pos = 0
    var ok = true
    var inflated = 0L
    while (ok && count < maxMembers && pos + 10 <= n &&
        (payload(pos) & 0xFF) == 0x1F && (payload(pos + 1) & 0xFF) == 0x8B) {
      val flg = payload(pos + 3) & 0xFF
      if ((payload(pos + 2) & 0xFF) != 8 || (flg & 0xE0) != 0) ok = false
      else {
        var p = pos + 10
        if ((flg & 4) != 0) { if (p + 2 > n) ok = false else p += 2 + lu16(payload, p) }
        if (ok && (flg & 8) != 0) { while (p < n && payload(p) != 0) p += 1; if (p >= n) ok = false else p += 1 }
        if (ok && (flg & 16) != 0) { while (p < n && payload(p) != 0) p += 1; if (p >= n) ok = false else p += 1 }
        if (ok && (flg & 2) != 0) p += 2
        if (!ok || p >= n) ok = false
        else {
          val inf = new java.util.zip.Inflater(true)
          try {
            inf.setInput(payload, p, n - p)
            val crc = new java.util.zip.CRC32
            val out = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](65536)
            var stalled = false
            while (!inf.finished() && !stalled) {
              val k = inf.inflate(buf)
              if (k > 0) {
                crc.update(buf, 0, k); out.write(buf, 0, k)
                if (inflated + out.size() > maxInflated) stalled = true // budget blown
              }
              else if (inf.needsInput() || inf.needsDictionary()) stalled = true
            }
            // a member that finished inflating but lands past the budget
            // is rejected too — the bound is on total buffered bytes,
            // not on mid-stream chunks only
            if (!inf.finished() || inflated + out.size() > maxInflated) ok = false
            else {
              val tp = p + ((n - p) - inf.getRemaining)
              val bytes = out.toByteArray
              if (tp + 8 > n || lu32(payload, tp) != crc.getValue ||
                  lu32(payload, tp + 4) != (bytes.length & 0xFFFFFFFFL)) ok = false
              else {
                members += GzMember(pos.toLong, (tp + 8 - pos).toLong, bytes)
                inflated += bytes.length
                count += 1; pos = tp + 8
              }
            }
          } catch {
            case _: java.util.zip.DataFormatException => ok = false
          } finally inf.end()
        }
      }
    }
    if (count == 0) None
    // complete: every byte consumed and nothing stopped the walk early
    // (maxMembers is the caller's own probe cap — reaching it with bytes
    // left is by definition not a full parse either)
    else Some((members.result(), ok && pos >= n))
  }

  /** Split a (possibly multi-member) gzip payload into its decompressed
    * members with trailer CRC32/ISIZE verification — the [[parseGzipMeta]]
    * walk, but KEEPING the bytes. The standard `.warc.gz` layout is one
    * gzip member per WARC record, so this is the crawl-archive demuxer.
    * None if the payload isn't gzip or its FIRST member is malformed; a
    * malformed tail stops the walk and returns the good prefix (the
    * byte-walk family's stance). Inflation is bounded by
    * [[MaxInflatedPayloadBytes]]; [[gunzipMembersBounded]] exposes the
    * budget, member offsets, and the completeness flag.
    */
  private[graft] def gunzipMembers(payload: Array[Byte]): Option[Seq[Array[Byte]]] =
    gunzipMembersBounded(payload).map(_._1.map(_.bytes))

  /** Inflate at most `maxBytes` of the FIRST gzip member — the bounded
    * sniff probe for payloads whose first member exceeds the demux
    * budget (no CRC verification possible without full inflation; the
    * caller classifies from the prefix). None if the payload isn't
    * gzip-framed or its deflate stream yields nothing.
    */
  private[graft] def inflateFirstPrefix(
      payload: Array[Byte], maxBytes: Int): Option[Array[Byte]] = {
    if (payload == null || payload.length < 11 ||
        (payload(0) & 0xFF) != 0x1F || (payload(1) & 0xFF) != 0x8B) return None
    val n = payload.length
    val flg = payload(3) & 0xFF
    if ((payload(2) & 0xFF) != 8 || (flg & 0xE0) != 0) return None
    var p = 10
    if ((flg & 4) != 0) { if (p + 2 > n) return None else p += 2 + lu16(payload, p) }
    if ((flg & 8) != 0) { while (p < n && payload(p) != 0) p += 1; if (p >= n) return None else p += 1 }
    if ((flg & 16) != 0) { while (p < n && payload(p) != 0) p += 1; if (p >= n) return None else p += 1 }
    if ((flg & 2) != 0) p += 2
    if (p >= n) return None
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(payload, p, n - p)
      val out = new java.io.ByteArrayOutputStream(math.min(maxBytes, 65536))
      val buf = new Array[Byte](math.min(maxBytes, 65536))
      var stalled = false
      while (!inf.finished() && !stalled && out.size() < maxBytes) {
        val k = inf.inflate(buf, 0, math.min(buf.length, maxBytes - out.size()))
        if (k > 0) out.write(buf, 0, k)
        else if (inf.needsInput() || inf.needsDictionary()) stalled = true
      }
      if (out.size() == 0) None else Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  final case class WarcRecord(
      media_id: Long, record_idx: Int, warc_type: String,
      target_uri: Option[String], warc_date: Option[String],
      content_type: Option[String], content_length: Long, body: Array[Byte],
      complete: Boolean, payload_digest: String,
      refers_to: Option[String], header_digest: Option[String])

  /** Parse one plain (non-gzip) WARC stream into records. ISO 28500
    * grammar: `WARC/<ver>` CRLF, header lines `Name: value` to a blank
    * line, `Content-Length` bytes of body, CRLF CRLF. Tolerant of
    * bare-`\n` line endings (real crawls contain them); a record without
    * Content-Length is unskippable, so the walk stops there (records
    * parsed so far are kept). Returns None if the payload doesn't start
    * with a `WARC/` version line.
    */
  /** One parsed WARC record: (type, target-uri, date, content-type,
    * content-length, body, refers-to-target-uri, header payload-digest).
    * The last two carry the revisit-record linkage (r20) — None on
    * records that don't spell them.
    */
  private[graft] type ParsedWarc =
    (String, Option[String], Option[String], Option[String], Long, Array[Byte],
      Option[String], Option[String])

  private[graft] def parseWarcRecords(payload: Array[Byte]): Option[Seq[ParsedWarc]] =
    parseWarcRecordsOff(payload).map(_._1.map(_._1))

  /** The [[parseWarcRecords]] walk, additionally reporting each record's
    * byte offset and length within the payload (version line through end
    * of body — a slice over that span re-parses as a standalone record;
    * the CDX(J) locator for the plain-`.warc` spelling) and whether the
    * walk consumed the payload COMPLETELY (`false` on a truncated,
    * malformed, or unskippable tail — mirrors `CompressionMeta.complete`
    * so partial archive parses are countable, not silent).
    */
  private[graft] def parseWarcRecordsOff(payload: Array[Byte]): Option[(Seq[
      (ParsedWarc, Long, Long)], Boolean)] = {
    if (payload == null || payload.length < 8) return None
    val n = payload.length
    def lineEnd(p: Int): Int = { var e = p; while (e < n && payload(e) != '\n') e += 1; e }
    def lineStr(p: Int, e: Int): String = {
      val stop = if (e > p && payload(e - 1) == '\r') e - 1 else e
      new String(payload, p, stop - p, java.nio.charset.StandardCharsets.UTF_8)
    }
    val out = Seq.newBuilder[(ParsedWarc, Long, Long)]
    var count = 0
    var pos = 0
    var ok = true
    var clean = false // true only when the walk consumes to end-of-payload
    while (ok && pos < n) {
      // skip inter-record blank lines
      while (pos < n && (payload(pos) == '\r' || payload(pos) == '\n')) pos += 1
      if (pos >= n) { ok = false; clean = true } // clean EOF, not an error
      else {
        val recStart = pos
        val ve = lineEnd(pos)
        val vline = lineStr(pos, ve)
        if (!vline.startsWith("WARC/")) ok = false
        else {
          pos = ve + 1
          var wtype: String = null
          var uri: Option[String] = None
          var date: Option[String] = None
          var ctype: Option[String] = None
          var refersTo: Option[String] = None
          var headerDigest: Option[String] = None
          var clen = -1L
          var headersDone = false
          while (ok && !headersDone) {
            if (pos >= n) ok = false
            else {
              val e = lineEnd(pos)
              val l = lineStr(pos, e)
              pos = e + 1
              if (l.isEmpty) headersDone = true
              else l.indexOf(':') match {
                case -1 => ok = false // not a header line — malformed record
                case c =>
                  val k = l.substring(0, c).trim.toLowerCase
                  val v = l.substring(c + 1).trim
                  k match {
                    case "warc-type" => wtype = v
                    case "warc-target-uri" => uri = Some(v)
                    case "warc-date" => date = Some(v)
                    case "content-type" => ctype = Some(v)
                    case "content-length" =>
                      clen = try v.toLong catch { case _: NumberFormatException => -1L }
                    case "warc-refers-to-target-uri" => refersTo = Some(v)
                    case "warc-payload-digest" => headerDigest = Some(v)
                    case _ => // other headers carried but not projected
                  }
              }
            }
          }
          if (ok) {
            if (clen < 0 || pos + clen > n) ok = false // unskippable / truncated body
            else {
              val body = java.util.Arrays.copyOfRange(payload, pos, pos + clen.toInt)
              pos += clen.toInt
              out += (((if (wtype == null) "" else wtype, uri, date, ctype, clen, body,
                refersTo, headerDigest),
                recStart.toLong, (pos - recStart).toLong))
              count += 1
            }
          }
        }
      }
    }
    // a payload ending exactly at a record body (no trailing blank lines)
    // is also a clean end — the loop condition, not the EOF branch, exits
    if (count == 0) None else Some((out.result(), clean || (ok && pos >= n)))
  }

  /** WARC crawl-archive records (ISO 28500) — the format training
    * corpora are actually crawled into (Common-Crawl-style). Handles
    * both spellings: a plain `.warc` stream, and `.warc.gz` where each
    * record is its own gzip member ([[gunzipMembers]], CRC-verified,
    * the standard layout so archives are seekable per record). One
    * `mapPartitions` flatMap; payloads that are neither produce no
    * rows. Bodies stay binary (HTTP responses can be anything);
    * `record_idx` preserves archive order within a payload. Each record
    * carries its WARC-Payload-Digest (`sha1:` + RFC 4648 base32 of the
    * body) computed in the same scan pass — digest-keyed dedup and CDX
    * joins downstream need no second pass over the bodies.
    *
    * Every record carries the payload-level `complete` flag: `true` iff
    * the WHOLE archive parsed — the gzip walk consumed every byte with
    * trailers verified, every member parsed as WARC, and every record
    * walk ran to its end. At archive scale a truncated tail is
    * otherwise indistinguishable from a full parse; downstream counts
    * `complete = false` payloads and routes them (the
    * `CompressionMeta.complete` convention). Inflation is bounded per
    * payload ([[MaxInflatedPayloadBytes]]) — an over-budget archive
    * keeps its prefix with `complete = false` instead of OOMing the
    * executor.
    *
    * Scale shape: one streaming pass per blob, no shuffle — the 100 TB
    * ingest is `binaryFile scan → warcRecords → text extraction`, all
    * scan-side.
    */
  def warcRecords(media: DataFrame): Dataset[WarcRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val plain = parseWarcRecordsOff(payload)
            .map { case (rs, c) => (rs.map(_._1).toIndexedSeq, c) }
            .orElse(gunzipMembersBounded(payload).map { case (ms, gzc) =>
              var all = gzc
              val recs = ms.flatMap { m =>
                parseWarcRecordsOff(m.bytes) match {
                  case Some((rs, c)) => if (!c) all = false; rs.map(_._1)
                  case None => all = false; Seq.empty
                }
              }.toIndexedSeq
              (recs, all)
            })
          plain match {
            case None => IndexedSeq.empty[WarcRecord]
            case Some((recs, complete)) => recs.zipWithIndex.map {
              case ((t, uri, date, ctype, clen, body, refersTo, headerDigest), i) =>
                // WARC-Payload-Digest spelling (r20): the body bytes are
                // already in hand on the scan, so the sha1:base32 digest
                // column is free here — CDX joins and digest-keyed dedup
                // need no second pass over the bodies. Pinned bit-equal
                // to cdxjRecords' digest in MultimodalSpec.
                WarcRecord(id, i, t, uri, date, ctype, clen, body, complete,
                  "sha1:" + sha1Base32(body), refersTo, headerDigest)
            }
          }
        }
      }
  }

  /** One serialized WARC record (ISO 28500 framing — the shape
    * [[parseWarcRecords]] reads back).
    */
  private[graft] def buildWarcRecord(
      wtype: String, uri: Option[String], date: Option[String],
      contentType: String, body: Array[Byte],
      extraHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $wtype\r\n")
    uri.foreach(u => sb.append(s"WARC-Target-URI: $u\r\n"))
    date.foreach(d => sb.append(s"WARC-Date: $d\r\n"))
    extraHeaders.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
    sb.append(s"Content-Type: $contentType\r\n")
    sb.append(s"Content-Length: ${body.length}\r\n")
    sb.append("\r\n")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8) ++
      body ++ "\r\n\r\n".getBytes
  }

  /** One gzip member (JDK GZIPOutputStream) — the `.warc.gz`
    * record-per-member spelling [[gunzipMembers]] demuxes.
    */
  private def gzipMemberBytes(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(data); g.close()
    bos.toByteArray
  }

  final case class WetShard(shard_id: Long, n_records: Long, payload: Array[Byte])

  /** WET-style export — the WRITER face of [[warcRecords]]: serialize
    * extracted text as WARC `conversion` records (what Common-Crawl WET
    * files carry) into `numShards` archive blobs, by default with one
    * gzip member PER RECORD (the standard `.warc.wet.gz` layout, which
    * keeps archives record-seekable and is exactly what
    * [[gunzipMembers]] demuxes back). Docs are hash-sharded on id and
    * serialized in id order within a shard, so output is deterministic
    * and round-trips: `warcRecords(wetExport(docs))` recovers every
    * (uri, text) — the law MultimodalSpec pins.
    *
    * Scale shape: text shuffles ONCE, on the shard id (the packed-export
    * precedent). A shard is assembled in ONE task (one blob per row is
    * the contract), so per-task memory IS the shard size — which is why
    * `numShards = 0` (the default) DERIVES the count from the corpus:
    * one cheap column-pruned pre-pass sums text bytes and sizes shards
    * to `targetShardBytes` (~128 MiB, the HDFS-block convention; well
    * under the 2 GB JVM array cap and the [[MaxInflatedPayloadBytes]]
    * re-ingest budget). An explicit `numShards` is honored as given —
    * the caller owns the memory math then (the r18 fixed-16 default
    * made a 100 TB corpus mean 6 TB per task; that foot-gun is gone).
    * Null texts serialize as empty bodies.
    */
  def wetExport(
      docs: DataFrame,
      idCol: String = "doc_id",
      uriCol: String = "url",
      textCol: String = "text",
      numShards: Int = 0,
      gzipPerRecord: Boolean = true,
      date: Option[String] = None,
      targetShardBytes: Long = 128L << 20): Dataset[WetShard] = {
    require(numShards >= 0, s"numShards must be >= 1 (or 0 = derive from size), got $numShards")
    require(targetShardBytes >= 1024, s"targetShardBytes must be >= 1 KiB, got $targetShardBytes")
    val spark = docs.sparkSession
    import spark.implicits._
    val proj = docs.select(col(idCol).as("__rawid"),
      col(idCol).cast("long").as("__id"), col(uriCol).cast("string").as("__uri"),
      col(textCol).cast("string").as("__text"))
    val (base, shards) =
      if (numShards >= 1) (proj, numShards)
      else {
        // the size estimate and the export share ONE materialization:
        // on a DERIVED input frame the eager pre-pass would otherwise
        // recompute the whole upstream lineage twice (a full extra
        // corpus pass at scale); the persisted stage is exactly the rows
        // the export shuffles right after, spillable and recomputable
        val cached = graft.StageCache.mat(proj)
        // estimated serialized bytes: text octets + ~160 B of WARC
        // framing per record (headers + separators; gzip-per-record
        // roughly offsets its own member overhead with text compression)
        val est = cached.agg(
            coalesce(sum(octet_length(col("__text"))), lit(0L)).as("b"),
            count(lit(1)).as("n"))
          .head()
        val bytes = est.getLong(0) + est.getLong(1) * 160L
        (cached, math.max(1L, (bytes + targetShardBytes - 1) / targetShardBytes)
          .min(Int.MaxValue.toLong).toInt)
      }
    base
      .select(pmod(xxhash64(col("__rawid")), lit(shards.toLong)).as("__shard"),
        col("__id"), col("__uri"), col("__text"))
      .as[(Long, Long, String, String)]
      .groupByKey(_._1)
      .mapGroups { (shard, it) =>
        val rows = it.toSeq.sortBy(_._2)
        val out = new java.io.ByteArrayOutputStream()
        rows.foreach { case (_, _, uri, text) =>
          val body = Option(text).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val rec = buildWarcRecord("conversion", Option(uri), date, "text/plain", body)
          out.write(if (gzipPerRecord) gzipMemberBytes(rec) else rec)
        }
        WetShard(shard, rows.length.toLong, out.toByteArray)
      }
  }

  /** Dedup-aware WET export — the `revisit` convention real crawls use
    * (ISO 28500 §6.7.2, the Common-Crawl/Heritrix
    * `identical-payload-digest` profile): the FIRST occurrence of each
    * distinct payload (by SHA-1, ties to the lowest doc id) serializes
    * as a full `conversion` record; every later occurrence becomes a
    * body-less `revisit` record carrying `WARC-Refers-To-Target-URI`
    * (the original's uri) and `WARC-Payload-Digest` (the original
    * body's `sha1:`base32) — so a corpus with heavy URL-level
    * duplication archives each payload ONCE while preserving every
    * fetch. [[warcRecords]] reads both record types back (the
    * `refers_to`/`header_digest` columns); resolving revisits through
    * the digest recovers every (uri, text) — the MultimodalSpec law.
    *
    * Scale shape: the first-occurrence decision runs over a NARROW
    * (id, uri, digest) projection — bodies never shuffle by digest —
    * then the flags join back on doc id (AQE-broadcast at bench scale,
    * id-keyed SMJ at corpus scale) and the text shuffles once, on the
    * shard id, exactly like [[wetExport]]. Shard count is derived the
    * same way (first occurrences carry their text bytes; revisits cost
    * ~framing only).
    */
  def wetExportRevisits(
      docs: DataFrame,
      idCol: String = "doc_id",
      uriCol: String = "url",
      textCol: String = "text",
      numShards: Int = 0,
      gzipPerRecord: Boolean = true,
      date: Option[String] = None,
      targetShardBytes: Long = 128L << 20): Dataset[WetShard] = {
    require(numShards >= 0, s"numShards must be >= 1 (or 0 = derive from size), got $numShards")
    require(targetShardBytes >= 1024, s"targetShardBytes must be >= 1 KiB, got $targetShardBytes")
    val spark = docs.sparkSession
    import spark.implicits._
    // __id orders records (lowest-id-wins first occurrence, in-shard
    // order) and MUST be a real long for every row: a non-long-castable
    // id would cast to null, and a null key silently never equi-joins —
    // the export would emit an EMPTY archive (ADVICE r20). The guard
    // fails the job loudly instead (assert_true evaluates to null when
    // the cast succeeded); the sibling wetExport already fails loudly on
    // null ids via its Dataset decode.
    val idGuard = assert_true(col(idCol).cast("long").isNotNull,
      lit(s"wetExportRevisits: idCol '$idCol' must be unique and castable to long"))
    val proj = docs.select(col(idCol).as("__rawid"),
      when(idGuard.isNull, col(idCol).cast("long")).as("__id"),
      col(uriCol).cast("string").as("__uri"),
      col(textCol).cast("string").as("__text"))
    // narrow digest decision: sha1 hex over the utf-8 text (built-in,
    // codegen'd) — the header's sha1:base32 spelling is recomputed from
    // the body bytes at write time (same digest, different encoding)
    val withDig = proj.withColumn("__dig",
      sha1(encode(coalesce(col("__text"), lit("")), "UTF-8")))
    val ids = withDig.select(col("__rawid"), col("__id"), col("__uri"), col("__dig"))
    // first occurrence = lexicographic min over (__id, __rawid, __uri)
    // (ADVICE r21): the raw id rides the struct so ties on the long cast
    // ("1" vs "01") resolve to exactly ONE first — deterministically —
    // instead of flagging every tied raw id a conversion; __id stays the
    // leading (documented lowest-id-wins) ordering key.
    val firsts = ids.groupBy("__dig")
      .agg(min(struct(col("__id").as("i"), col("__rawid").as("r"),
        col("__uri").as("u"))).as("__f"))
      .select(col("__dig"), col("__f.r").as("__fraw"), col("__f.u").as("__furi"))
    // flags join back on __rawid (the ORIGINAL id value, ADVICE r20) —
    // not the lossy long cast: two distinct raw ids that cast to one
    // long would fan an __id-keyed join out n² — and __isFirst compares
    // raw ids for the same reason.
    val flags = ids.join(firsts, Seq("__dig"))
      .select(col("__rawid"), (col("__rawid") === col("__fraw")).as("__isFirst"),
        col("__furi"))
    val full = withDig.join(flags, Seq("__rawid"))
    val (base, shards) =
      if (numShards >= 1) (full, numShards)
      else {
        val cached = graft.StageCache.mat(full)
        val est = cached.agg(
            coalesce(sum(when(col("__isFirst"), octet_length(col("__text")))
              .otherwise(lit(0L))), lit(0L)).as("b"),
            count(lit(1)).as("n"))
          .head()
        val bytes = est.getLong(0) + est.getLong(1) * 220L // revisit framing is wider
        (cached, math.max(1L, (bytes + targetShardBytes - 1) / targetShardBytes)
          .min(Int.MaxValue.toLong).toInt)
      }
    base
      .select(pmod(xxhash64(col("__rawid")), lit(shards.toLong)).as("__shard"),
        col("__id"), col("__uri"), col("__text"), col("__isFirst"), col("__furi"))
      .as[(Long, Long, String, String, Boolean, String)]
      .groupByKey(_._1)
      .mapGroups { (shard, it) =>
        val rows = it.toSeq.sortBy(_._2)
        val out = new java.io.ByteArrayOutputStream()
        rows.foreach { case (_, _, uri, text, isFirst, furi) =>
          val body = Option(text).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val rec =
            if (isFirst)
              buildWarcRecord("conversion", Option(uri), date, "text/plain", body)
            else
              buildWarcRecord("revisit", Option(uri), date,
                "application/http", Array.emptyByteArray,
                extraHeaders = Seq(
                  "WARC-Refers-To-Target-URI" -> furi,
                  "WARC-Payload-Digest" -> ("sha1:" + sha1Base32(body)),
                  "WARC-Profile" ->
                    "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"))
          out.write(if (gzipPerRecord) gzipMemberBytes(rec) else rec)
        }
        WetShard(shard, rows.length.toLong, out.toByteArray)
      }
  }

  /** Re-ingest a dedup-aware archive ([[wetExportRevisits]] layout, or
    * any identical-payload-digest crawl) back to one row per FETCH:
    * `conversion` records contribute their own body text; `revisit`
    * records resolve through their `WARC-Payload-Digest` header to the
    * original's body. Output: (media_id, record_idx, url, text) —
    * exactly the corpus [[wetExportRevisits]] archived (the
    * MultimodalSpec recovery law, productized). Revisits whose original
    * is absent from the record set (a partial re-ingest) are dropped —
    * an inner join, so the output never carries fabricated text.
    *
    * Scale shape: original BODIES shuffle once, keyed by digest
    * (distinct payloads only — the dedup already collapsed repeats);
    * revisit rows are body-less and narrow. Duplicate conversions of
    * one digest across archives collapse to the lexicographically
    * smallest (their texts are identical by the digest).
    */
  def resolveRevisits(records: Dataset[WarcRecord]): DataFrame = {
    val df = records.toDF()
    val convs = df.filter(col("warc_type") === "conversion")
      .select(col("media_id"), col("record_idx"), col("target_uri").as("url"),
        col("body").cast("string").as("text"), col("payload_digest"))
    val originals = convs
      .groupBy(col("payload_digest").as("__dig"))
      .agg(min(col("text")).as("text"))
    val revs = df.filter(col("warc_type") === "revisit" && col("header_digest").isNotNull)
      .select(col("media_id"), col("record_idx"), col("target_uri").as("url"),
        col("header_digest").as("__dig"))
      .join(originals, Seq("__dig"))
      .select(col("media_id"), col("record_idx"), col("url"), col("text"))
    convs.select(col("media_id"), col("record_idx"), col("url"), col("text"))
      .unionByName(revs)
  }

  final case class CdxjEntry(
      media_id: Long, record_idx: Int, surt: String, ts: String, url: String,
      mime: String, digest: String, offset: Long, length: Long)

  /** Locate every WARC record in a payload with its CDX byte span:
    * plain `.warc` spans come from [[parseWarcRecordsOff]] (version line
    * through body end); `.warc.gz` spans are the enclosing gzip MEMBER's
    * (offset, compressed length) — the convention web-archive CDX files
    * use, because `payload[offset, offset+length)` must be independently
    * fetchable and decodable (a member is a standalone gzip stream).
    */
  private def locateWarcRecords(payload: Array[Byte]): Seq[(ParsedWarc, Long, Long)] =
    parseWarcRecordsOff(payload).map(_._1)
      .orElse(gunzipMembersBounded(payload).map(_._1.flatMap { m =>
        parseWarcRecordsOff(m.bytes).map(_._1).getOrElse(Seq.empty)
          .map { case (rec, _, _) => (rec, m.offset, m.compLen) }
      }))
      .getOrElse(Seq.empty)

  /** RFC 4648 base32 (no padding needed: SHA-1's 160 bits are exactly
    * 32 chars) — the WARC-Payload-Digest spelling CDX files carry.
    */
  private def sha1Base32(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1").digest(bytes)
    val alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val sb = new StringBuilder(32)
    var acc = 0L; var bits = 0; var i = 0
    while (i < d.length) {
      acc = (acc << 8) | (d(i) & 0xFF); bits += 8
      while (bits >= 5) { bits -= 5; sb.append(alpha(((acc >> bits) & 31).toInt)) }
      i += 1
    }
    sb.toString
  }

  /** CDX(J) index entries for a WARC/WET shard set — the lookup sibling
    * of [[wetExport]]: web archives pair every `.warc(.gz)` with a
    * CDX(J) index whose lines carry (SURT key, 14-digit timestamp) and
    * the locator fields (url, digest, mime, byte offset, length) needed
    * to fetch ONE record without scanning the archive. `offset/length`
    * follow the archive convention: the gzip MEMBER span for `.warc.gz`
    * (a standalone re-inflatable stream), the record's own byte span
    * for plain `.warc`. `digest` is the WARC-Payload-Digest spelling
    * (`sha1:` + base32 of the body); `ts` is the WARC-Date's digits
    * (yyyyMMddhhmmss). The SURT key is the SAME
    * [[TextAnalysis.surtKey]]∘[[TextAnalysis.canonicalUrl]] column the
    * dedup keys use, grafted onto the scan rows — so sorting entries by
    * (surt, ts) yields the CDX ordering and per-domain lookups are
    * key-range scans.
    *
    * Scale shape: one streaming pass per blob (bounded inflation, like
    * [[warcRecords]]), digest/offset computed scan-side, no shuffle; the
    * CDX sort, if the caller wants files, is one `orderBy` over
    * index-sized rows (never the bodies).
    */
  def cdxjRecords(media: DataFrame): Dataset[CdxjEntry] = {
    val spark = media.sparkSession
    import spark.implicits._
    val base = media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          locateWarcRecords(payload).zipWithIndex.map {
            case (((_, uri, date, ctype, _, body, _, hdig), off, len), i) =>
              // a revisit record's meaningful digest is the REFERENCED
              // payload's (its own body is empty by design) — CDX carries
              // the header digest when the record spells one, so
              // digest-keyed joins stay exact against deduped archives
              (id, i, date.map(_.filter(_.isDigit).take(14)).getOrElse(""),
                uri.orNull, ctype.orNull,
                hdig.getOrElse("sha1:" + sha1Base32(body)), off, len)
          }
        }
      }
      .toDF("media_id", "record_idx", "ts", "url", "mime", "digest", "offset", "length")
    base
      .withColumn("surt",
        TextAnalysis.surtKey(TextAnalysis.canonicalUrl(col("url"))))
      .select(col("media_id"), col("record_idx"), col("surt"), col("ts"),
        col("url"), col("mime"), col("digest"), col("offset"), col("length"))
      .as[CdxjEntry]
  }

  /** Serialize [[CdxjEntry]] rows as CDXJ text lines — `<surt> <ts>
    * {json}`, the sort-merge-able index file format web archives pair
    * with their WARCs. The JSON block is Spark's codegen'd `to_json`
    * over the locator struct (null url/mime fields are omitted, the
    * CDXJ convention); `media_id` stands in for the archive filename
    * (this engine addresses shards by id, not path). Writing actual
    * files is the caller's one-liner —
    * `cdxjLines(e).orderBy("surt", "ts").select("line").write.text(dir)`
    * — a global sort over INDEX-sized rows (never bodies), which Spark
    * range-partitions; the engine does not reimplement the text sink.
    */
  def cdxjLines(entries: Dataset[CdxjEntry]): DataFrame = {
    // missing key fields serialize as the CDX "-" placeholder — a
    // warcinfo record has no WARC-Target-URI (null surt) and a record
    // can lack WARC-Date (empty ts); concat_ws would silently DROP a
    // null column and field-shift the line for its consumer
    val surtOut = coalesce(col("surt"), lit("-"))
    val tsOut = when(col("ts").isNull || col("ts") === "", lit("-"))
      .otherwise(col("ts"))
    entries.toDF().select(surtOut.as("surt"), tsOut.as("ts"),
      concat_ws(" ", surtOut, tsOut,
        to_json(struct(col("url"), col("mime"), col("digest"),
          col("offset"), col("length"), col("media_id"), col("record_idx"))))
        .as("line"))
  }

  final case class CdxShard(shard_id: Long, n_lines: Long, payload: Array[Byte])

  /** CDX-SORTED index shards — the writer face of [[cdxjLines]]: the
    * full entry set globally ordered by (surt, ts) and serialized into
    * newline-delimited text blobs, the `.cdxj` file convention web
    * archives keep beside their `.warc.gz` shards (a binary-searchable
    * merged index: concatenating the blobs in `shard_id` order IS the
    * sorted CDX file, since range partitions are emitted in key order
    * and each shard is sorted within). Ties beyond (surt, ts) order by
    * the full line text, which embeds (media_id, record_idx) — a total,
    * deterministic order. Text order equals tuple order because the
    * line's field separator (space) sorts below every character SURT
    * keys and timestamps use.
    *
    * `numShards = 0` (default) derives the count from a column-pruned
    * size pre-pass targeting `targetShardBytes` (the [[wetExport]]
    * precedent — one task assembles one shard, so per-task memory IS
    * shard size); an explicit count is honored as given.
    *
    * Scale shape: ONE `repartitionByRange` over index-sized rows (never
    * bodies) + in-partition sort; each blob assembles in its own task
    * with no further shuffle. Empty ranges yield no row.
    */
  def cdxExport(
      entries: Dataset[CdxjEntry],
      numShards: Int = 0,
      targetShardBytes: Long = 128L << 20): Dataset[CdxShard] = {
    require(numShards >= 0, s"numShards must be >= 1 (or 0 = derive from size), got $numShards")
    require(targetShardBytes >= 1024, s"targetShardBytes must be >= 1 KiB, got $targetShardBytes")
    val spark = entries.sparkSession
    import spark.implicits._
    val lines = cdxjLines(entries)
    val (base, shards) =
      if (numShards >= 1) (lines, numShards)
      else {
        // size estimate and export share one materialization (the
        // wetExport rationale: a derived input would otherwise pay its
        // whole upstream lineage twice)
        val cached = graft.StageCache.mat(lines)
        val bytes = cached
          .agg(coalesce(sum(octet_length(col("line")) + lit(1L)), lit(0L)))
          .head().getLong(0)
        (cached, math.max(1L, (bytes + targetShardBytes - 1) / targetShardBytes)
          .min(Int.MaxValue.toLong).toInt)
      }
    base
      .repartitionByRange(shards, col("surt"), col("ts"), col("line"))
      .sortWithinPartitions("surt", "ts", "line")
      .withColumn("__shard", spark_partition_id().cast("long"))
      .select(col("__shard"), col("line")).as[(Long, String)]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val out = new java.io.ByteArrayOutputStream()
          var shard = -1L
          var n = 0L
          it.foreach { case (s, l) =>
            shard = s
            out.write(l.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            out.write('\n')
            n += 1
          }
          Iterator.single(CdxShard(shard, n, out.toByteArray))
        }
      }
  }

  final case class CdxShardRange(shard_id: Long, first_key: String, last_key: String)

  /** Per-shard key range off a CDX shard set — the index-of-the-index:
    * because [[cdxExport]] blobs are sorted within AND across shards,
    * a blob's first and last `<surt> <ts>` keys ARE its exact min/max,
    * so a key-range query prunes shards from this catalog alone. The
    * keys are read without splitting the blob (first line = bytes to
    * the first newline; last line = bytes after the last interior
    * newline) — one bounded peek per blob, no full parse.
    */
  def cdxShardRanges(shards: Dataset[CdxShard]): Dataset[CdxShardRange] = {
    val spark = shards.sparkSession
    import spark.implicits._
    shards.flatMap { s =>
      keyRangeOf(s.payload).map { case (first, last) =>
        CdxShardRange(s.shard_id, first, last)
      }
    }
  }

  /** (first key, last key) of a newline-delimited CDX blob, peeked from
    * the ends without materializing lines. None for an empty blob. The
    * key is the `<surt> <ts>` prefix (first two fields).
    */
  private[graft] def keyRangeOf(payload: Array[Byte]): Option[(String, String)] = {
    if (payload == null || payload.isEmpty) return None
    val n = payload.length
    var fe = 0
    while (fe < n && payload(fe) != '\n') fe += 1
    // last line starts after the final interior newline (blobs end \n)
    var ls = if (payload(n - 1) == '\n') n - 2 else n - 1
    while (ls >= 0 && payload(ls) != '\n') ls -= 1
    val first = new String(payload, 0, fe, java.nio.charset.StandardCharsets.UTF_8)
    val lastEnd = if (payload(n - 1) == '\n') n - 1 else n
    val last = new String(payload, ls + 1, lastEnd - ls - 1,
      java.nio.charset.StandardCharsets.UTF_8)
    def key(line: String): String = {
      val a = line.indexOf(' ')
      val b = if (a < 0) -1 else line.indexOf(' ', a + 1)
      if (b < 0) line else line.substring(0, b)
    }
    Some((key(first), key(last)))
  }

  /** SURT-prefix lookup over CDX-sorted shards — the READ face of
    * [[cdxExport]]: shards whose [first, last] key range cannot contain
    * the prefix are skipped WITHOUT splitting their text (the peeked
    * range check is exact because blobs are globally sorted), and only
    * the surviving blobs' lines are materialized and filtered. Output:
    * (shard_id, surt, ts, line) for every entry whose SURT starts with
    * `surtPrefix`, in (surt, ts) order within each shard.
    *
    * Scale shape: at 100 TB the shard catalog ([[cdxShardRanges]]) is
    * index-of-index-sized and the prefix selects O(matching shards); a
    * pruned shard costs the two end-peeks, never a parse. This is the
    * web-archive lookup contract: a binary-searchable merged CDX.
    */
  def cdxLookup(shards: Dataset[CdxShard], surtPrefix: String): DataFrame = {
    require(surtPrefix != null && surtPrefix.nonEmpty, "surtPrefix must be non-empty")
    val spark = shards.sparkSession
    import spark.implicits._
    // The peeked shard keys are the `<surt> <ts>` prefix (two fields);
    // the prune test must compare against AT MOST that much of
    // surtPrefix (ADVICE r20): a prefix extending past the second space
    // (into the JSON field) is LONGER than any matching line's key, so
    // `last >= surtPrefix` could be false for a shard that contains a
    // hit. With >= 2 spaces in the prefix every matching line's key is
    // EXACTLY the truncation, so the overlap test is equality-shaped
    // (first <= kp <= last); with < 2 spaces the truncation is the full
    // prefix and the usual half-open interval applies.
    val a0 = surtPrefix.indexOf(' ')
    val b0 = if (a0 < 0) -1 else surtPrefix.indexOf(' ', a0 + 1)
    val keyPre = if (b0 < 0) surtPrefix else surtPrefix.substring(0, b0)
    val hi = if (b0 < 0) surtPrefix + '￿' else keyPre
    shards.flatMap { s =>
      keyRangeOf(s.payload) match {
        case Some((first, last)) if last >= keyPre && first <= hi =>
          new String(s.payload, java.nio.charset.StandardCharsets.UTF_8)
            .split("\n").iterator
            .filter(_.startsWith(surtPrefix))
            .flatMap { line =>
              val a = line.indexOf(' ')
              val b = if (a < 0) -1 else line.indexOf(' ', a + 1)
              // a foreign/garbled line without the three CDXJ fields is
              // not an entry — skip it rather than throw mid-scan
              if (b < 0) Iterator.empty
              else Iterator.single(
                (s.shard_id, line.substring(0, a), line.substring(a + 1, b), line))
            }
        case _ => Iterator.empty
      }
    }.toDF("shard_id", "surt", "ts", "line")
  }

  /** Random-access record FETCH by CDX locator — the last leg of the
    * archive stack (write: [[wetExport]]/[[wetExportRevisits]]; index:
    * [[cdxExport]]; prune: [[cdxLookup]]; fetch: here): each requested
    * (media_id, offset, length) span is sliced out of its blob and
    * re-parsed standalone — a gzip member re-inflates, a plain span
    * re-parses directly — exactly the independent-fetchability contract
    * the CDX locator guarantees. Output rows are [[WarcRecord]]s with
    * the entry's (media_id, record_idx).
    *
    * Closing law (MultimodalSpec): `cdxFetch(media, cdxjRecords(media))`
    * == `warcRecords(media)` record-for-record, both spellings.
    *
    * Scale shape: the requested spans GROUP per blob first (a narrow
    * aggregation of the index rows), so each blob is visited ONCE and
    * sliced for all of its requested records — bodies never shuffle;
    * the join ships blob bytes to their (usually few) requests, the
    * archive-reader access pattern. Spans that fail to slice or parse
    * (a stale index against a rewritten blob) are dropped, never
    * fabricated.
    */
  def cdxFetch(media: DataFrame, entries: Dataset[CdxjEntry]): Dataset[WarcRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    val wanted = entries.toDF()
      .groupBy("media_id")
      .agg(collect_list(struct(col("record_idx"), col("offset"), col("length"))).as("__spans"))
    media.select(col("media_id"), col("payload")).join(wanted, Seq("media_id"))
      .select(col("media_id"), col("payload"), col("__spans"))
      .as[(Long, Array[Byte], Seq[(Int, Long, Long)])]
      .flatMap { case (id, payload, spans) =>
        spans.iterator.flatMap { case (idx, off, len) =>
          if (payload == null || off < 0 || len <= 0 || off + len > payload.length)
            Iterator.empty
          else {
            val slice = java.util.Arrays.copyOfRange(
              payload, off.toInt, (off + len).toInt)
            // gzip member → inflate then parse; plain span → parse as-is
            val parsed =
              if (slice.length > 1 && (slice(0) & 0xFF) == 0x1F && (slice(1) & 0xFF) == 0x8B)
                gunzipMembers(slice).flatMap(ms => parseWarcRecords(ms.headOption.orNull))
              else parseWarcRecords(slice)
            parsed.toSeq.flatten.headOption.map {
              case (t, uri, date, ctype, clen, body, refersTo, headerDigest) =>
                WarcRecord(id, idx, t, uri, date, ctype, clen, body, complete = true,
                  "sha1:" + sha1Base32(body), refersTo, headerDigest)
            }.iterator
          }
        }
      }
  }

  final case class SniffedFormat(media_id: Long, format: String)

  private def startsWith(p: Array[Byte], at: Int, sig: String): Boolean =
    p.length >= at + sig.length && sig.indices.forall(i => p(at + i) == sig.charAt(i).toByte)

  /** Classify ONE payload. Deep formats are CONFIRMED by their real
    * parsers, not magic prefixes alone.
    */
  private[graft] def sniffOne(p: Array[Byte]): String = {
    if (p == null || p.length == 0) return "empty"
    if (p.length >= 8 && (p(0) & 0xFF) == 0x89 && startsWith(p, 1, "PNG\r\n") &&
        p(6) == 0x1A && p(7) == '\n') return "png"
    if (p.length >= 3 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8 &&
        (p(2) & 0xFF) == 0xFF) return "jpeg"
    if (startsWith(p, 0, "GIF87a") || startsWith(p, 0, "GIF89a")) return "gif"
    if (startsWith(p, 0, "RIFF") && startsWith(p, 8, "WAVE")) return "wav"
    if (startsWith(p, 0, "RIFF") && startsWith(p, 8, "WEBP")) return "webp"
    if (startsWith(p, 0, "FORM") && (startsWith(p, 8, "AIFF") || startsWith(p, 8, "AIFC")))
      return "aiff"
    if (startsWith(p, 0, ".snd")) return "au"
    if (startsWith(p, 0, "fLaC")) return "flac"
    if (startsWith(p, 0, "OggS")) return "ogg"
    if (startsWith(p, 0, "%PDF")) return "pdf"
    if (p.length >= 4 && p(0) == 'P' && p(1) == 'K' && p(2) == 3 && p(3) == 4) return "zip"
    if (parseWarcRecords(p).isDefined) return "warc"
    if ((p(0) & 0xFF) == 0x1F && p.length > 1 && (p(1) & 0xFF) == 0x8B) {
      // gzip vs warc.gz: classify from the FIRST member only, under a
      // small inflation budget — triage must never demux a whole
      // (possibly adversarial) archive just to name it (r19, the
      // decompression-bomb stance). The standard warc.gz layout has
      // EVERY member a record, so member 1 decides; a first member too
      // big for the probe budget classifies by its inflated prefix
      // (deflate structure already verified over the probed span).
      val probeBudget = 4 << 20
      gunzipMembersBounded(p, maxInflated = probeBudget.toLong, maxMembers = 1) match {
        case Some((ms, _)) if ms.nonEmpty =>
          // full first member in budget: the real parser decides
          return if (parseWarcRecords(ms.head.bytes).isDefined) "warc.gz" else "gzip"
        case _ =>
          // first member malformed OR bigger than the probe budget.
          // Only the OVERSIZED case classifies from the inflated
          // prefix: asking for budget+1 bytes distinguishes them — a
          // member whose deflate stream is still producing past the
          // budget is genuinely too big to verify (classify by
          // prefix); anything shorter means the stream ended and the
          // bounded demux rejected its trailer/CRC, so the old
          // contract holds: bad gzip is not gzip, fall through
          inflateFirstPrefix(p, probeBudget + 1) match {
            case Some(pre) if pre.length > probeBudget =>
              return if (startsWith(pre, 0, "WARC/")) "warc.gz" else "gzip"
            case _ => // fall through
          }
      }
    }
    if (parseZstdMeta(p).isDefined) return "zstd"
    if (parseMp4Meta(p).isDefined) return "mp4"
    parseMkvMeta(p) match {
      case Some(m) => return m.container // "mkv" | "webm"
      case None =>
    }
    if (parseAdtsMeta(p).isDefined) return "aac"
    if (parseMp3Meta(p).isDefined) return "mp3"
    // text vs binary: strict UTF-8 decode + >=85% printable/whitespace
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      val s = dec.decode(java.nio.ByteBuffer.wrap(p)).toString
      var printable = 0
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c >= 0x20 || c == '\t' || c == '\n' || c == '\r') printable += 1
        i += 1
      }
      if (s.nonEmpty && printable.toDouble / s.length >= 0.85) "text" else "binary"
    } catch {
      case _: java.nio.charset.CharacterCodingException => "binary"
    }
  }

  /** Magic-byte format triage over a blob column — the dispatch step of
    * a mixed-media ingest (route images to decode, audio/video to the
    * metadata walkers, archives to [[warcRecords]]/decompression, text
    * onward). Deep formats (mp3/AAC framing, MP4/MKV containers,
    * gzip/zstd, WARC) are confirmed by their real byte-walk parsers —
    * random bytes that spell a 2-byte magic do NOT classify; `.warc.gz`
    * is distinguished from plain gzip by demuxing the members. TOTAL
    * over the input: unrecognized payloads fall to "text" (strict UTF-8
    * + printable ratio) or "binary", so the result partitions the
    * corpus. One scan-side pass, no shuffle.
    */
  def sniffFormat(media: DataFrame): Dataset[SniffedFormat] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, p) => SniffedFormat(id, sniffOne(p)) })
  }

  /** ==== DETERMINISTIC FALLBACK ==== for payloads with no JVM decoder
    * (compressed audio/video; a real build binds javacv here): an 8-float vector
    * folded from the payload bytes, so the distributed plumbing behaves
    * identically whether or not the payload decodes.
    */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    while (i < payload.length) { out(i % 8) += (payload(i) & 0xFF) / 255.0f; i += 1 }
    out
  }

  /** 8-float feature from a REAL decoded image: mean luminance of 8
    * vertical bands (deterministic, resolution-independent enough for
    * near-dup blocking; the real-build seam for a CLIP-style embedding).
    */
  private def imageFeature(img: java.awt.image.BufferedImage): Array[Float] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val sums = new Array[Double](8); val counts = new Array[Long](8)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xFF) * 299L + ((rgb >> 8) & 0xFF) * 587L + (rgb & 0xFF) * 114L) / 1000.0
        val band = x * 8 / w
        sums(band) += lum / 255.0; counts(band) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(8)(b => if (counts(b) == 0) 0f else (sums(b) / counts(b)).toFloat)
  }

  final case class Thumbnail(media_id: Long, width: Int, height: Int, pixels: Array[Byte])
  final case class FrameSample(media_id: Long, frame_idx: Int, offset_ms: Long, frame: Array[Byte])

  /** Resize to a w×h grayscale thumbnail. Image payloads take the REAL
    * path: ImageIO decode → bilinear rescale → 8-bit luminance raster.
    * Undecodable payloads (audio/video/blobs) tile their bytes into the
    * buffer — the deterministic fallback, same schema and sizing math.
    */
  def resize(media: DataFrame, w: Int, h: Int): Dataset[Thumbnail] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          decodeImage(payload) match {
            case Some(img) =>
              val scaled = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
              val g = scaled.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null)
              g.dispose()
              val out = new Array[Byte](w * h)
              scaled.getRaster.getDataElements(0, 0, w, h, out)
              Thumbnail(id, w, h, out)
            case None =>
              // empty/null payloads keep the zeroed buffer (the same
              // degenerate-input behavior as extractFeatures)
              val out = new Array[Byte](w * h)
              if (payload != null && payload.length > 0) {
                var i = 0
                while (i < out.length) { out(i) = payload(i % payload.length); i += 1 }
              }
              Thumbnail(id, w, h, out)
          }
        }
      }
  }

  final case class EncodedThumb(media_id: Long, mime: String, png: Array[Byte])

  /** Decode → bilinear-resize → PNG-encode in one `mapPartitions` pass:
    * the thumbnail-generation shape a real media pipeline ships (compressed
    * bytes out, not raw rasters — a 100 TB corpus of w×h rasters is ~3x
    * the PNG cost for nothing). Both codec ends are REAL `javax.imageio`;
    * payloads that don't decode are skipped (flatMap), so audio/video rows
    * simply produce no thumbnail.
    */
  def encodeThumbnails(media: DataFrame, w: Int, h: Int): Dataset[EncodedThumb] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          decodeImage(payload).map { img =>
            val scaled = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = scaled.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(scaled, "png", bos)
            EncodedThumb(id, "image/png", bos.toByteArray)
          }
        }
      }
  }

  /** ==== STUB ==== Frame sampling for video rows: emits `n` evenly-spaced
    * frames per media item (1 row in → n rows out — the flatMap shape a
    * real demuxer needs); frame bytes are a deterministic slice of the
    * payload.
    */
  def sampleFrames(media: DataFrame, n: Int): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select("media_id", "payload", "duration_ms").as[(Long, Array[Byte], Long)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload, durMs) =>
          (0 until n).map { f =>
            val off = if (n == 1) 0L else durMs * f / (n - 1)
            val start = if (payload.isEmpty) 0 else (f * payload.length / math.max(n, 1)) % payload.length
            FrameSample(id, f, off, payload.slice(start, math.min(start + 8, payload.length)))
          }
        }
      }
  }

  /** Feature extraction over media rows: one `mapPartitions` pass — codec
    * init happens once per partition, rows stream through (the Scala
    * equivalent of a batched `mapInPandas` UDF). Input must have
    * `mediaSchema` columns. Payloads that decode as images get REAL
    * pixel-luminance features ([[imageFeature]]); payloads that decode as
    * audio get REAL per-band RMS energy ([[audioFeature]]); everything
    * else falls back to the byte-fold. `n_bytes`/`byte_mean` are payload
    * stats in all paths (schema identical).
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec setup would go here (once, not per row)
        rows.map { case (id, kind, payload) =>
          // dispatch on the kind column FIRST — an audio row must not pay
          // an ImageIO magic-sniff before reaching its own decoder. The
          // cross-decoder fallback stays (lying headers still decode):
          // image and audio magics are disjoint, so trial ORDER only
          // affects cost, never which decoder succeeds.
          val feat = (kind match {
            case "audio" => decodeAudio(payload).map(audioFeature)
              .orElse(decodeImage(payload).map(imageFeature))
            case _ => decodeImage(payload).map(imageFeature)
              .orElse(decodeAudio(payload).map(audioFeature))
          }).getOrElse(decodeStub(payload))
          val bytes = payload.length
          val mean = if (bytes == 0) 0.0 else payload.map(b => (b & 0xFF).toDouble).sum / bytes
          MediaFeatures(id, kind, bytes, mean, feat)
        }
      }
  }
}
