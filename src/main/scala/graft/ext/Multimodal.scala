package graft.ext

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travel as opaque `binary` columns with typed metadata;
  * decode / feature-extract / resize / frame-sample run as partition-local
  * batch functions over `Dataset[T]` (`mapPartitions` — the Scala analog of
  * a vectorized `mapInPandas` stage: one JVM call per batch of rows, no
  * per-row driver involvement, schema known to Catalyst on both sides).
  *
  * The IMAGE and AUDIO codec layers are REAL: PNG/JPEG/GIF/BMP decode,
  * bilinear resize, and re-encode go through the JDK-builtin `javax.imageio`;
  * WAV/AIFF/AU decode goes through `javax.sound.sampled` — no external
  * native libraries, both headless-safe on executors. Bytes no installed
  * reader understands fall back to a quarantine row (clearly marked
  * `decoded=false`) so curation pipelines can quarantine rather than crash.
  * VIDEO is real at both layers: the ISO-BMFF (MP4/MOV) CONTAINER parse is
  * pure byte-walking ([[parseMp4Meta]]/[[decodeVideoMeta]], duration/
  * timescale/track-count/brand, v0+v1 mvhd, largesize headers), and FRAME
  * sampling ([[sampleFrames]]) walks the `stbl` sample table (`stsz` sizes +
  * `stco` offsets) and decodes each sampled payload with the ImageIO path —
  * true pixels for MJPEG-style tracks, the codec family the JDK can decode.
  * Inter-coded codecs (H.264/AV1…) would quarantine at the payload-decode
  * step, exactly like any other undecodable bytes.
  */
object Multimodal {

  case class MediaItem(id: Long, media: Array[Byte], format: String)
  case class DecodedImage(id: Long, width: Int, height: Int, channels: Int,
      decoded: Boolean, feature: Array[Float])
  case class FrameSample(id: Long, frameIdx: Int, width: Int, height: Int,
      decoded: Boolean, feature: Array[Float])

  // ImageIO's default disk-backed stream cache would add a tmp-file write
  // per image per task — pure-memory streams keep the decode stage IO-free.
  ImageIO.setUseCache(false)

  /** Attach a binary media column synthesized from a string column — lets the
    * pipeline be exercised on the text testdata until real media lands.
    */
  def withSyntheticMedia(df: DataFrame, idCol: String, textCol: String): Dataset[MediaItem] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).as("id"), col(textCol).cast("binary").as("media"),
      lit("synthetic/raw").as("format")).as[MediaItem]
  }

  /** Encode a BufferedImage as PNG bytes (test fixtures + resize re-encode). */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic small PNG from (id, w, h): an RGB gradient tile with an
    * id-tinted blue channel — turns tabular testdata into a REAL image corpus
    * whose geometry is known arithmetically, so an encode→decode round trip
    * is verifiable by an engine that cannot decode images (the q31 oracle).
    */
  def synthesizePng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8) | (id & 0xffL).toInt)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** Max pixels a single decode may materialize — the decompression-bomb
    * guard: header dimensions are inspected BEFORE any pixel allocation, so
    * a crafted 65535×65535 JPEG (a few KB of bytes, ~17 GB of pixels)
    * quarantines instead of OOMing the executor. Found by the container
    * fuzz test: bit flips in a JPEG SOF header produce decodable images
    * with arbitrary claimed dimensions.
    */
  val MaxDecodePixels: Long = 64L * 1024 * 1024

  private def tryDecode(bytes: Array[Byte]): Option[BufferedImage] =
    try {
      val in = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(in)
            val w = reader.getWidth(0).toLong
            val h = reader.getHeight(0).toLong
            if (w <= 0 || h <= 0 || w * h > MaxDecodePixels) None
            else Option(reader.read(0))
          } finally reader.dispose()
        }
      } finally in.close()
    } catch { case _: java.io.IOException | _: RuntimeException => None }

  /** JVM twin of [[Dedup.portableTokenHash]]'s SQL arithmetic (md5 hex,
    * first 15 nibbles, as a 60-bit value) — lets partition-local fixture
    * GENERATORS produce content an external engine can re-derive from the
    * same key string.
    */
  def portableHash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    // first 15 hex chars = first 7.5 bytes = the 8-byte big-endian value >> 4
    (java.nio.ByteBuffer.wrap(d, 0, 8).getLong >>> 4)
  }

  /** Deterministic DIVERSE PNG: an 8×8 grid of constant-value grayscale
    * cells (cell layout identical to [[perceptualHash]]'s block grid), cell
    * values drawn from [[portableHash60]] of (contentKey, cell), blue
    * channel tinted by `tintId`. Docs sharing `contentKey` are VISUALLY
    * identical at any size/tint — planted perceptual duplicates with
    * distinct bytes — while different keys differ in ~half their aHash bits
    * (unlike a plain gradient corpus, where every image is the same ramp and
    * pairwise hamming degenerates to ~0 corpus-wide). Constant cells make
    * the q75 oracle exact: block sums factor to v·n, so bit(cell) reduces to
    * v(cell)·w·h > Σ v·n — pure integer arithmetic DuckDB replays from the
    * same md5 keys.
    */
  def synthesizePatternPng(tintId: Long, contentKey: Long, w: Int, h: Int): Array[Byte] = {
    val v = Array.tabulate(64)(c => (portableHash60(s"p:$contentKey:$c") & 0xffL).toInt)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val tint = (tintId & 0xffL).toInt
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val vv = v(by * 8 + x * 8 / w)
        img.setRGB(x, y, (vv << 16) | (vv << 8) | tint)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** `featureDim`-bin normalized luminance histogram — a real, deterministic
    * pixel-derived feature (the shape any learned embedding would flow
    * through; swap the body, keep the schema).
    */
  private def luminanceHistogram(img: BufferedImage, featureDim: Int): Array[Float] = {
    val counts = new Array[Long](featureDim)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
        counts(math.min(lum * featureDim / 256, featureDim - 1)) += 1
        x += 1
      }
      y += 1
    }
    val n = (img.getWidth.toLong * img.getHeight).toFloat
    counts.map(_ / n)
  }

  private def fakeDecode(m: MediaItem, featureDim: Int): DecodedImage = {
    // deterministic byte-hash fake for undecodable bytes (FNV-1a over media)
    val h = m.media.foldLeft(1469598103934665603L)((acc, b) => (acc ^ b) * 1099511628211L)
    val width = 16 + math.floorMod(h, 16).toInt
    val height = 16 + math.floorMod(h >> 8, 16).toInt
    val feat = Array.tabulate(featureDim)(i => math.floorMod(h >> (i * 4), 1024) / 1024.0f)
    DecodedImage(m.id, width, height, 3, decoded = false, feat)
  }

  /** Real image decode: PNG/JPEG/GIF/BMP via `javax.imageio`, true
    * width/height/channel-count plus a luminance-histogram feature; bytes
    * with no reader yield a `decoded=false` fallback row.
    */
  def decodeImages(items: Dataset[MediaItem], featureDim: Int = 8): Dataset[DecodedImage] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        tryDecode(m.media) match {
          case Some(img) =>
            DecodedImage(m.id, img.getWidth, img.getHeight,
              img.getColorModel.getNumComponents, decoded = true,
              luminanceHistogram(img, featureDim))
          case None => fakeDecode(m, featureDim)
        }
      }
    }
  }

  case class PerceptualHash(id: Long, phash: Long, decoded: Boolean)

  /** 64-bit average-hash (aHash) perceptual signature: an 8×8 block grid
    * (pixel → block by `bx = x*8/w`, `by = y*8/h`), integer-scaled BT.601
    * luminance `299·R + 587·G + 114·B` summed per block, bit `by*8+bx` set
    * iff the block mean exceeds the whole-image mean. The comparison is the
    * exact integer cross-multiplication `blockSum·totalN > totalSum·blockN`
    * — no floating point, so an engine that cannot decode images can still
    * replay the hash arithmetically for synthesized corpora (the q75
    * oracle). Adding a constant to every pixel shifts block and image means
    * equally, so the hash is brightness-shift invariant by construction —
    * re-encodes, resizes and small tints land within a few bits, which is
    * what makes it a DEDUP signature where byte hashing sees distinct files.
    * Images past ~1M pixels switch to the double-precision mean comparison
    * (the cross-multiplication could overflow 64-bit there; a 2^-53 relative
    * ULP on a perceptual threshold is immaterial, and oracle fixtures are
    * far smaller).
    */
  def perceptualHash(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val blockSum = new Array[Long](64)
    val blockN = new Array[Long](64)
    var totalSum = 0L
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = ((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L +
          (rgb & 0xff) * 114L
        val bi = by * 8 + x * 8 / w
        blockSum(bi) += lum
        blockN(bi) += 1
        totalSum += lum
        x += 1
      }
      y += 1
    }
    val totalN = w.toLong * h
    val exact = totalN < (1L << 20)
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (blockN(i) > 0) {
        val above =
          if (exact) blockSum(i) * totalN > totalSum * blockN(i)
          else blockSum(i).toDouble / blockN(i) > totalSum.toDouble / totalN
        if (above) hash |= (1L << i)
      }
      i += 1
    }
    hash
  }

  /** Decode + aHash for one payload — None when no installed reader
    * understands the bytes. The partition-local building block under
    * [[perceptualHashes]] and the streaming image dedup stage.
    */
  def perceptualHashOf(bytes: Array[Byte]): Option[Long] =
    tryDecode(bytes).map(perceptualHash)

  /** Perceptual signatures for a media corpus — the decode-stage companion
    * to [[decodeImages]]: partition-local ImageIO decode + [[perceptualHash]],
    * quarantine rows (`decoded=false`, phash 0) for undecodable bytes. The
    * signature is row-local (no shuffle); near-dup grouping over it is the
    * banded-LSH pattern ([[Dedup.simhashNearDuplicatesFromHashes]]), so
    * image dedup at 100 TB has the same plan shape as text SimHash dedup.
    */
  def perceptualHashes(items: Dataset[MediaItem]): Dataset[PerceptualHash] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map { m =>
      tryDecode(m.media) match {
        case Some(img) => PerceptualHash(m.id, perceptualHash(img), decoded = true)
        case None => PerceptualHash(m.id, 0L, decoded = false)
      }
    })
  }

  /** Real resize: decode → bilinear rescale to (w, h) → re-encode PNG,
    * partition-locally. Undecodable items pass through unchanged (same
    * quarantine contract as [[decodeImages]]).
    */
  def resizeImages(items: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        tryDecode(m.media) match {
          case Some(img) =>
            val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
              RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            MediaItem(m.id, encodePng(out), "image/png")
          case None => m
        }
      }
    }
  }

  // ---- audio ---------------------------------------------------------------

  case class DecodedAudio(id: Long, sampleRate: Int, channels: Int,
      nSamples: Long, decoded: Boolean, rms: Double, peak: Double)

  /** Deterministic PCM16 mono WAV from (id, sampleRate, nSamples): a square
    * wave with an id-derived period and amplitude 8192. Every sample is
    * ±8192/32768 = ±0.25 — amplitude, its square (0.0625) and the RMS
    * (√0.0625 = 0.25) are all exact powers of two, so the decoded RMS is
    * EXACTLY 0.25 in IEEE arithmetic: an invariant an engine that cannot
    * parse WAV can still verify (the q38 oracle).
    */
  def synthesizeWav(id: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val amp: Short = 8192
    val halfPeriod = 2 + math.floorMod(id, 37).toInt // samples per half-cycle
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      buf.putShort(if ((i / halfPeriod) % 2 == 0) amp else (-amp).toShort)
      i += 1
    }
    buf.array()
  }

  /** Drain an [[javax.sound.sampled.AudioInputStream]] with the two guards
    * `readAllBytes` lacks (the audio twin of [[MaxDecodePixels]]):
    *
    *  - **zero-progress break** — `AudioInputStream.read` returns 0 (not −1)
    *    whenever the requested length is smaller than the header's frame
    *    size, so a mutated block-align field (frameSize > buffer) spins
    *    `readAllBytes` forever at 100% CPU (found by the WAV mutation fuzz
    *    test). A 0 before any progress quarantines; a 0 after progress ends
    *    the drain with what decoded.
    *  - **size budget** — decoded PCM is capped at 4× the container bytes
    *    + 64 KiB (covers ULAW/ALAW→PCM16 expansion); a header declaring
    *    more is a decompression bomb and quarantines instead of allocating.
    */
  private def readAudioBounded(in: javax.sound.sampled.AudioInputStream,
      containerBytes: Int): Array[Byte] = {
    val cap = 4L * containerBytes + 65536L
    val out = new java.io.ByteArrayOutputStream(8192)
    val buf = new Array[Byte](32768)
    var total = 0L
    var done = false
    while (!done) {
      val n = in.read(buf, 0, buf.length)
      if (n > 0) {
        total += n
        if (total > cap)
          throw new java.io.IOException(
            s"decoded audio exceeds size budget ($total > $cap bytes)")
        out.write(buf, 0, n)
      } else if (n == 0 && total == 0L) {
        throw new java.io.IOException(
          "audio stream makes no progress (frame size exceeds read buffer)")
      } else done = true // EOF, or a mid-stream 0 after real progress
    }
    out.toByteArray
  }

  /** Real audio decode: WAV/AIFF/AU via the JDK-builtin `javax.sound.sampled`
    * parser (headless-safe, no native libs), reporting true sample rate /
    * channel count / sample count plus RMS and peak amplitude over the PCM16
    * samples. Bytes no installed reader understands yield a zeroed
    * `decoded=false` quarantine row — same contract as [[decodeImages]].
    */
  def decodeAudio(items: Dataset[MediaItem]): Dataset[DecodedAudio] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(m.media))
          val fmt = in.getFormat
          val pcm = readAudioBounded(in, m.media.length)
          in.close()
          val frameBytes = math.max(1, fmt.getFrameSize)
          val nFrames = pcm.length / frameBytes
          var rms = 0.0
          var peak = 0.0
          if (fmt.getSampleSizeInBits == 16 && pcm.length >= 2) {
            val bb = java.nio.ByteBuffer.wrap(pcm).order(
              if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN)
            val total = pcm.length / 2
            var sumSq = 0.0
            var i = 0
            while (i < total) {
              val s = bb.getShort(i * 2) / 32768.0
              sumSq += s * s
              val a = math.abs(s)
              if (a > peak) peak = a
              i += 1
            }
            rms = math.sqrt(sumSq / total)
          }
          DecodedAudio(m.id, fmt.getSampleRate.toInt, fmt.getChannels, nFrames,
            decoded = true, rms, peak)
        } catch {
          // RuntimeException included deliberately (same contract as
          // tryDecode): JDK audio parsers throw unchecked exceptions on
          // some malformed-but-recognized headers (truncated chunk sizes),
          // and one bad file must quarantine, not kill the stage
          case _: javax.sound.sampled.UnsupportedAudioFileException |
               _: java.io.IOException | _: RuntimeException =>
            DecodedAudio(m.id, 0, 0, 0L, decoded = false, 0.0, 0.0)
        }
      }
    }
  }

  /** Deterministic PCM16 mono WAV with a planted 64-segment energy pattern —
    * the audio twin of [[synthesizePatternPng]]: sample j belongs to segment
    * `j*64/nSamples`, and segment i carries a ±`amp` square wave when bit i
    * of `contentKey` is set, silence otherwise. Loudness (`amp`) plays the
    * role tint plays for images: re-levelled copies of the same key are
    * byte-distinct but energy-pattern identical, so
    * [[audioPerceptualHashes]] collapses them to one signature. `amp` must
    * be a multiple of 4096 so every segment mean-square is an exact IEEE
    * double ((k·4096/32768)² = k²·2⁻⁶) and the signature replays as pure
    * integer arithmetic in an engine that cannot parse WAV (the q83 oracle).
    */
  def synthesizePatternWav(contentKey: Long, amp: Short, sampleRate: Int,
      nSamples: Int): Array[Byte] = {
    require(amp > 0 && amp % 4096 == 0, s"amp must be a positive multiple of 4096, got $amp")
    val halfPeriod = 7 // any period works; signature depends only on |s|
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var j = 0
    while (j < nSamples) {
      val seg = (j.toLong * 64L / nSamples).toInt
      val s: Short =
        if ((contentKey >>> seg & 1L) == 0L) 0
        else if ((j / halfPeriod) % 2 == 0) amp
        else (-amp).toShort
      buf.putShort(s)
      j += 1
    }
    buf.array()
  }

  case class AudioHash(id: Long, phash: Long, decoded: Boolean)

  /** 64-bit audio perceptual signature over decoded PCM16 — the audio twin
    * of [[perceptualHash]]: samples split into 64 equal time segments
    * (segment of sample j = `j*64/total`, the generator's mapping), bit i
    * set iff segment i's mean-square energy exceeds the mean of the 64
    * segment energies. Scaling every sample by a constant scales both sides
    * of the comparison equally, so the signature is loudness-invariant —
    * re-levelled/re-encoded copies byte-hash dedup cannot see collapse to
    * one signature. Decode path and quarantine contract (zeroed
    * `decoded=false` row) are [[decodeAudio]]'s.
    */
  def audioPerceptualHashes(items: Dataset[MediaItem]): Dataset[AudioHash] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map { m =>
      audioPerceptualHashOf(m.media) match {
        case Some(h) => AudioHash(m.id, h, decoded = true)
        case None    => AudioHash(m.id, 0L, decoded = false)
      }
    })
  }

  /** Decode + energy signature for one payload — None when the bytes don't
    * decode to PCM16 (the quarantine case). Row-local core of
    * [[audioPerceptualHashes]], also the streaming map
    * ([[graft.streaming.StreamOps.streamingAudioNearDuplicates]]).
    */
  def audioPerceptualHashOf(bytes: Array[Byte]): Option[Long] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      val pcm = readAudioBounded(in, bytes.length)
      in.close()
      if (fmt.getSampleSizeInBits != 16 || pcm.length < 2) None
      else {
        val bb = java.nio.ByteBuffer.wrap(pcm).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        val total = pcm.length / 2
        val sumSq = new Array[Double](64)
        val cnt = new Array[Long](64)
        var j = 0
        while (j < total) {
          val s = bb.getShort(j * 2) / 32768.0
          sumSq((j.toLong * 64L / total).toInt) += s * s
          cnt((j.toLong * 64L / total).toInt) += 1
          j += 1
        }
        val energy = new Array[Double](64)
        var mean = 0.0
        var i = 0
        while (i < 64) {
          energy(i) = if (cnt(i) > 0) sumSq(i) / cnt(i) else 0.0
          mean += energy(i)
          i += 1
        }
        mean /= 64.0
        var h = 0L
        i = 0
        while (i < 64) { if (energy(i) > mean) h |= 1L << i; i += 1 }
        Some(h)
      }
    } catch {
      // same unchecked-exception quarantine contract as decodeAudio
      case _: javax.sound.sampled.UnsupportedAudioFileException |
           _: java.io.IOException | _: RuntimeException => None
    }

  // ---- video (ISO-BMFF container metadata + sample-table frame decode) -----

  case class VideoMeta(id: Long, majorBrand: String, timescale: Int,
      durationUnits: Long, durationS: Double, nTracks: Int, decoded: Boolean)

  /** (fourcc, payloadOffset, boxEnd) of the ISO-BMFF box at `off`, or null
    * on a malformed header. Handles the 64-bit `largesize` form and the
    * size-0 (box-runs-to-EOF) form. Shared by the metadata parser and the
    * sample-table walker.
    */
  private def boxAt(bytes: Array[Byte], bb: java.nio.ByteBuffer, off: Int,
      limit: Int): (String, Int, Int) = {
    if (off + 8 > limit) return null
    val size32 = bb.getInt(off).toLong & 0xffffffffL
    val typ = new String(bytes, off + 4, 4, "US-ASCII")
    val (payload, end) =
      if (size32 == 1) { // 64-bit largesize
        if (off + 16 > limit) return null
        (off + 16, off + bb.getLong(off + 8))
      } else if (size32 == 0) (off + 8, limit.toLong) // box runs to EOF
      else (off + 8, off + size32)
    if (end > limit || end <= payload) null else (typ, payload, end.toInt)
  }

  /** Minimal VALID ISO-BMFF (MP4-family) container from (id, timescale,
    * duration, nTracks): `ftyp` + `moov(mvhd + nTracks × trak(tkhd))`, laid
    * out per the public ISO/IEC 14496-12 box grammar (big-endian
    * size+fourcc headers, version-0 full boxes). No media samples — the
    * synthesized corpus carries exactly the container METADATA the parser
    * side reads, the same synthesize→parse contract as [[synthesizePng]] /
    * [[synthesizeWav]].
    */
  def synthesizeMp4(id: Long, timescale: Int, durationUnits: Long,
      nTracks: Int): Array[Byte] = {
    // version-0 mvhd/tkhd carry unsigned 32-bit durations; a larger value
    // would silently wrap through toInt below (emit a v1 box if ever needed)
    require(durationUnits >= 0 && durationUnits <= 0xFFFFFFFFL,
      s"durationUnits=$durationUnits exceeds the version-0 32-bit box field")
    val ftypSize = 20
    val mvhdSize = 108
    val trakSize = 100 // 8 (trak hdr) + 92 (tkhd box)
    val moovSize = 8 + mvhdSize + nTracks * trakSize
    val buf = java.nio.ByteBuffer.allocate(ftypSize + moovSize) // big-endian
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    buf.putInt(ftypSize); fourcc("ftyp"); fourcc("isom"); buf.putInt(0); fourcc("isom")
    buf.putInt(moovSize); fourcc("moov")
    buf.putInt(mvhdSize); fourcc("mvhd")
    buf.putInt(0) // version 0 + flags
    buf.putInt(0).putInt(0) // creation / modification time
    buf.putInt(timescale)
    buf.putInt(durationUnits.toInt)
    buf.putInt(0x00010000) // rate 1.0
    buf.putShort(0x0100.toShort).putShort(0) // volume 1.0 + reserved
    buf.putInt(0).putInt(0) // reserved
    // unity matrix
    buf.putInt(0x00010000).putInt(0).putInt(0)
    buf.putInt(0).putInt(0x00010000).putInt(0)
    buf.putInt(0).putInt(0).putInt(0x40000000)
    (0 until 6).foreach(_ => buf.putInt(0)) // pre_defined
    buf.putInt(nTracks + 1) // next_track_ID
    (0 until nTracks).foreach { t =>
      buf.putInt(trakSize); fourcc("trak")
      buf.putInt(92); fourcc("tkhd")
      buf.putInt(0x00000007) // version 0, flags: enabled|in-movie|in-preview
      buf.putInt(0).putInt(0) // times
      buf.putInt(t + 1) // track_ID
      buf.putInt(0) // reserved
      buf.putInt(durationUnits.toInt)
      buf.putInt(0).putInt(0) // reserved
      buf.putShort(0).putShort(0).putShort(0).putShort(0) // layer/group/volume/reserved
      buf.putInt(0x00010000).putInt(0).putInt(0)
      buf.putInt(0).putInt(0x00010000).putInt(0)
      buf.putInt(0).putInt(0).putInt(0x40000000)
      buf.putInt(0).putInt(0) // width / height (non-visual track)
    }
    buf.array()
  }

  /** REAL ISO-BMFF container parse (pure byte walking, no codec, no deps):
    * top-level box scan for `ftyp` (major brand) and `moov`, then a child
    * scan for `mvhd` (v0 AND v1 layouts: 32- vs 64-bit times) and `trak`
    * count. Handles 64-bit `largesize` headers; malformed/truncated/foreign
    * bytes quarantine as `decoded=false` — the [[decodeImages]] contract.
    * Works on any spec-conforming MP4/MOV-family file, not just
    * [[synthesizeMp4]] output.
    */
  def parseMp4Meta(id: Long, bytes: Array[Byte]): VideoMeta = {
    val quarantine = VideoMeta(id, "", 0, 0L, 0.0, 0, decoded = false)
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes) // ISO-BMFF is big-endian
      def fourcc(off: Int): String =
        new String(bytes, off, 4, "US-ASCII")
      def box(off: Int, limit: Int): (String, Int, Int) = boxAt(bytes, bb, off, limit)
      var off = 0
      var brand = ""
      var timescale = 0
      var duration = 0L
      var tracks = 0
      var sawMoov = false
      while (off < bytes.length) {
        val b = box(off, bytes.length)
        if (b == null) return quarantine
        val (typ, payload, end) = b
        typ match {
          case "ftyp" => brand = fourcc(payload)
          case "moov" =>
            sawMoov = true
            var c = payload
            while (c < end) {
              val child = box(c, end)
              if (child == null) return quarantine
              val (ct, cp, ce) = child
              ct match {
                case "mvhd" =>
                  val version = bytes(cp) & 0xff
                  if (version == 1) { // 64-bit creation/modification/duration
                    timescale = bb.getInt(cp + 20)
                    duration = bb.getLong(cp + 24)
                  } else {
                    timescale = bb.getInt(cp + 12)
                    duration = bb.getInt(cp + 16).toLong & 0xffffffffL
                  }
                case "trak" => tracks += 1
                case _ => ()
              }
              c = ce
            }
          case _ => ()
        }
        off = end
      }
      if (!sawMoov || timescale <= 0) quarantine
      else VideoMeta(id, brand, timescale, duration,
        duration.toDouble / timescale, tracks, decoded = true)
    } catch { case _: RuntimeException => quarantine }
  }

  /** Real video-container metadata decode over a binary media column —
    * the `mapPartitions` batch stage a demux pipeline fronts with. Frame
    * pixels: [[sampleFrames]].
    */
  def decodeVideoMeta(items: Dataset[MediaItem]): Dataset[VideoMeta] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map(m => parseMp4Meta(m.id, m.media)))
  }

  /** Deterministic JPEG frame for the MJPEG fixtures: the [[synthesizePng]]
    * gradient with a per-frame blue tint, JPEG-encoded. Lossy encoding does
    * not disturb the GEOMETRY contract (width/height decode exactly), which
    * is what the q76 oracle verifies arithmetically.
    */
  def synthesizeJpegFrame(id: Long, frameIdx: Int, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8) |
          ((id + frameIdx * 17) & 0xffL).toInt)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** MJPEG-style ISO-BMFF container: `ftyp` + `mdat` holding the encoded
    * frame payloads + a full `moov(mvhd, trak(tkhd, mdia(mdhd, hdlr,
    * minf(stbl(stsd 'mjpa', stts, stsc, stsz, stco)))))` sample table —
    * one sample per chunk, absolute file offsets, version-0 boxes per
    * ISO/IEC 14496-12. [[sampleFrames]] walks exactly these boxes back out;
    * [[parseMp4Meta]] reads the same container's movie-level metadata.
    */
  def synthesizeMjpegMp4(timescale: Int, durationUnits: Long,
      frames: Seq[Array[Byte]], width: Int, height: Int): Array[Byte] = {
    require(frames.nonEmpty, "container needs at least one frame")
    require(durationUnits >= 0 && durationUnits <= 0xFFFFFFFFL,
      s"durationUnits=$durationUnits exceeds the version-0 32-bit box field")
    val n = frames.length
    val ftypSize = 20
    val mdatSize = 8 + frames.map(_.length).sum
    val stsdSize = 8 + 8 + 86 // header + vf/entry_count + VisualSampleEntry
    val sttsSize = 24
    val stscSize = 28
    val stszSize = 20 + 4 * n
    val stcoSize = 16 + 4 * n
    val stblSize = 8 + stsdSize + sttsSize + stscSize + stszSize + stcoSize
    val minfSize = 8 + stblSize
    val hdlrSize = 33 // 8 + vf(4) + pre_defined(4) + handler(4) + reserved(12) + NUL name(1)
    val mdhdSize = 32
    val mdiaSize = 8 + mdhdSize + hdlrSize + minfSize
    val trakSize = 8 + 92 + mdiaSize
    val moovSize = 8 + 108 + trakSize
    val buf = java.nio.ByteBuffer.allocate(ftypSize + mdatSize + moovSize)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    buf.putInt(ftypSize); fourcc("ftyp"); fourcc("isom"); buf.putInt(0); fourcc("isom")
    // mdat precedes moov so stco carries known absolute offsets
    buf.putInt(mdatSize); fourcc("mdat")
    val offsets = new Array[Int](n)
    var pos = ftypSize + 8
    frames.zipWithIndex.foreach { case (f, i) =>
      offsets(i) = pos; buf.put(f); pos += f.length
    }
    buf.putInt(moovSize); fourcc("moov")
    buf.putInt(108); fourcc("mvhd")
    buf.putInt(0) // version 0 + flags
    buf.putInt(0).putInt(0) // creation / modification time
    buf.putInt(timescale)
    buf.putInt(durationUnits.toInt)
    buf.putInt(0x00010000) // rate 1.0
    buf.putShort(0x0100.toShort).putShort(0) // volume + reserved
    buf.putInt(0).putInt(0) // reserved
    buf.putInt(0x00010000).putInt(0).putInt(0)
    buf.putInt(0).putInt(0x00010000).putInt(0)
    buf.putInt(0).putInt(0).putInt(0x40000000)
    (0 until 6).foreach(_ => buf.putInt(0)) // pre_defined
    buf.putInt(2) // next_track_ID
    buf.putInt(trakSize); fourcc("trak")
    buf.putInt(92); fourcc("tkhd")
    buf.putInt(0x00000007) // v0, enabled|in-movie|in-preview
    buf.putInt(0).putInt(0) // times
    buf.putInt(1) // track_ID
    buf.putInt(0) // reserved
    buf.putInt(durationUnits.toInt)
    buf.putInt(0).putInt(0) // reserved
    buf.putShort(0).putShort(0).putShort(0).putShort(0)
    buf.putInt(0x00010000).putInt(0).putInt(0)
    buf.putInt(0).putInt(0x00010000).putInt(0)
    buf.putInt(0).putInt(0).putInt(0x40000000)
    buf.putInt(width << 16).putInt(height << 16) // 16.16 fixed-point
    buf.putInt(mdiaSize); fourcc("mdia")
    buf.putInt(mdhdSize); fourcc("mdhd")
    buf.putInt(0)
    buf.putInt(0).putInt(0) // times
    buf.putInt(timescale).putInt(durationUnits.toInt)
    buf.putShort(0x55C4.toShort).putShort(0) // language 'und' + pre_defined
    buf.putInt(hdlrSize); fourcc("hdlr")
    buf.putInt(0).putInt(0); fourcc("vide")
    buf.putInt(0).putInt(0).putInt(0) // reserved
    buf.put(0.toByte) // empty NUL name
    buf.putInt(minfSize); fourcc("minf")
    buf.putInt(stblSize); fourcc("stbl")
    buf.putInt(stsdSize); fourcc("stsd")
    buf.putInt(0).putInt(1) // vf + entry_count
    buf.putInt(86); fourcc("mjpa") // VisualSampleEntry
    (0 until 6).foreach(_ => buf.put(0.toByte)) // reserved
    buf.putShort(1) // data_reference_index
    buf.putShort(0).putShort(0) // pre_defined + reserved
    buf.putInt(0).putInt(0).putInt(0) // pre_defined[3]
    buf.putShort(width.toShort).putShort(height.toShort)
    buf.putInt(0x00480000).putInt(0x00480000) // 72 dpi
    buf.putInt(0) // reserved
    buf.putShort(1) // frame_count per sample
    buf.put(new Array[Byte](32)) // compressorname (zeroed pascal string)
    buf.putShort(24) // depth
    buf.putShort(-1) // pre_defined
    buf.putInt(sttsSize); fourcc("stts")
    buf.putInt(0).putInt(1) // vf + entry_count
    buf.putInt(n).putInt(math.max(1, (durationUnits / n).toInt)) // count, delta
    buf.putInt(stscSize); fourcc("stsc")
    buf.putInt(0).putInt(1) // vf + entry_count
    buf.putInt(1).putInt(1).putInt(1) // first_chunk, samples/chunk, sd index
    buf.putInt(stszSize); fourcc("stsz")
    buf.putInt(0).putInt(0).putInt(n) // vf, sample_size=0 (per-sample), count
    frames.foreach(f => buf.putInt(f.length))
    buf.putInt(stcoSize); fourcc("stco")
    buf.putInt(0).putInt(n) // vf + entry_count
    offsets.foreach(buf.putInt)
    buf.array()
  }

  /** REAL frame sampling: walks the ISO-BMFF sample table (`moov → trak →
    * mdia → minf → stbl`, per-sample sizes from `stsz`, absolute offsets
    * from `stco` — one sample per chunk) and decodes every `stride`-th
    * sample payload with the same ImageIO path as [[decodeImages]]: true
    * pixel features for MJPEG-style tracks. Containers without a parseable
    * sample table quarantine as one `frameIdx=-1, decoded=false` row;
    * individually undecodable payloads quarantine per-frame — either way no
    * item silently vanishes, the [[decodeImages]] contract.
    */
  def sampleFrames(items: Dataset[MediaItem], stride: Int = 2,
      featureDim: Int = 8): Dataset[FrameSample] = {
    require(stride >= 1, s"stride=$stride must be >= 1")
    import items.sparkSession.implicits._
    items.flatMap(m => sampleFramesLocal(m.id, m.media, stride, featureDim))
  }

  /** Every `stride`-th sample payload from the container's sample table, as
    * (sampleIdx, bytes) slices — null when the table is unparseable, a null
    * payload for an individually out-of-range sample. The shared walk under
    * [[sampleFrames]] and [[framePerceptualHashes]].
    */
  private def framePayloadsLocal(bytes: Array[Byte],
      stride: Int): Seq[(Int, Array[Byte])] = {
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      // first child box of the given type within [from, limit)
      def child(from: Int, limit: Int, typ: String): (Int, Int) = {
        var off = from
        while (off < limit) {
          val b = boxAt(bytes, bb, off, limit)
          if (b == null) return null
          if (b._1 == typ) return (b._2, b._3)
          off = b._3
        }
        null
      }
      val moov = child(0, bytes.length, "moov")
      if (moov == null) return null
      val trak = child(moov._1, moov._2, "trak")
      if (trak == null) return null
      val mdia = child(trak._1, trak._2, "mdia")
      if (mdia == null) return null
      val minf = child(mdia._1, mdia._2, "minf")
      if (minf == null) return null
      val stbl = child(minf._1, minf._2, "stbl")
      if (stbl == null) return null
      val stsz = child(stbl._1, stbl._2, "stsz")
      val stco = child(stbl._1, stbl._2, "stco")
      if (stsz == null || stco == null) return null
      val fixedSize = bb.getInt(stsz._1 + 4)
      val nSamples = bb.getInt(stsz._1 + 8)
      val nChunks = bb.getInt(stco._1 + 4)
      // clamp declared counts to what the boxes PHYSICALLY hold: a corrupt
      // or hostile header claiming ~2^30 samples must not materialize ~2^30
      // tuples (and read neighboring boxes as entries) before the per-frame
      // range checks can quarantine anything
      val stszCap =
        if (fixedSize != 0) Int.MaxValue else (stsz._2 - stsz._1 - 12) / 4
      val stcoCap = (stco._2 - stco._1 - 8) / 4
      val n = math.min(math.min(nSamples, nChunks), math.min(stszCap, stcoCap))
      if (n <= 0) return null
      (0 until n by stride).map { i =>
        val size = if (fixedSize != 0) fixedSize else bb.getInt(stsz._1 + 12 + 4 * i)
        val offset = bb.getInt(stco._1 + 8 + 4 * i)
        val bad = size <= 0 || offset < 0 || offset.toLong + size > bytes.length
        i -> (if (bad) null
              else java.util.Arrays.copyOfRange(bytes, offset, offset + size))
      }
    } catch { case _: RuntimeException => null }
  }

  /** Partition-local core of [[sampleFrames]] (also direct-callable in
    * tests and custom `mapPartitions` stages).
    */
  def sampleFramesLocal(id: Long, bytes: Array[Byte], stride: Int,
      featureDim: Int): Seq[FrameSample] = {
    val payloads = framePayloadsLocal(bytes, stride)
    if (payloads == null)
      return Seq(FrameSample(id, -1, 0, 0, decoded = false, Array.empty))
    payloads.map { case (i, p) =>
      (if (p == null) None else tryDecode(p)) match {
        case Some(img) => FrameSample(id, i, img.getWidth, img.getHeight,
          decoded = true, luminanceHistogram(img, featureDim))
        case None => FrameSample(id, i, 0, 0, decoded = false, Array.empty)
      }
    }
  }

  case class FramePHash(id: Long, frameIdx: Int, phash: Long, decoded: Boolean)

  /** Per-frame perceptual signatures straight off the container — the
    * sample-table walk of [[sampleFrames]] feeding [[perceptualHash]]
    * instead of the histogram feature. The decode stage of cross-VIDEO
    * near-dup detection: per-frame signatures are row-local (no shuffle),
    * and frame-level banded matching then video-level agreement counting
    * are keyed equi-joins (q77) — the pixel-dedup story extended to the
    * last modality.
    */
  def framePerceptualHashes(items: Dataset[MediaItem],
      stride: Int = 1): Dataset[FramePHash] = {
    require(stride >= 1, s"stride=$stride must be >= 1")
    import items.sparkSession.implicits._
    items.flatMap { m =>
      val payloads = framePayloadsLocal(m.media, stride)
      if (payloads == null) Seq(FramePHash(m.id, -1, 0L, decoded = false))
      else payloads.map { case (i, p) =>
        (if (p == null) None else tryDecode(p)) match {
          case Some(img) => FramePHash(m.id, i, perceptualHash(img), decoded = true)
          case None => FramePHash(m.id, i, 0L, decoded = false)
        }
      }
    }
  }

  /** Media dataset summary — the kind of partition-pruned scan a curation
    * pipeline runs before an expensive decode stage (byte sizes only; the
    * binary column is never materialized on the driver).
    */
  def mediaStats(items: Dataset[MediaItem]): DataFrame =
    items.groupBy(col("format")).agg(
      count(lit(1)).as("n_items"),
      avg(length(col("media"))).as("avg_bytes"),
      max(length(col("media"))).as("max_bytes"))
}
