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
  * VIDEO is split: the ISO-BMFF (MP4/MOV) CONTAINER layer is real — pure
  * byte-walking box parse ([[parseMp4Meta]]/[[decodeVideoMeta]], duration/
  * timescale/track-count/brand, v0+v1 mvhd, largesize headers) — while
  * frame-pixel decoding ([[sampleFrames]]) remains a declared stub: the JDK
  * ships no video codec.
  */
object Multimodal {

  case class MediaItem(id: Long, media: Array[Byte], format: String)
  case class DecodedImage(id: Long, width: Int, height: Int, channels: Int,
      decoded: Boolean, feature: Array[Float])
  case class FrameSample(id: Long, frameIdx: Int, feature: Array[Float])

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

  private def tryDecode(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: java.io.IOException | _: RuntimeException => None }

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
          val pcm = in.readAllBytes()
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

  // ---- video (ISO-BMFF container metadata — real; frame CODEC — stub) ------

  case class VideoMeta(id: Long, majorBrand: String, timescale: Int,
      durationUnits: Long, durationS: Double, nTracks: Int, decoded: Boolean)

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
      // returns (payloadOffset, boxEnd) or null on malformed header
      def boxAt(off: Int, limit: Int): (String, Int, Int) = {
        if (off + 8 > limit) return null
        val size32 = bb.getInt(off).toLong & 0xffffffffL
        val typ = fourcc(off + 4)
        val (payload, end) =
          if (size32 == 1) { // 64-bit largesize
            if (off + 16 > limit) return null
            (off + 16, off + bb.getLong(off + 8))
          } else if (size32 == 0) (off + 8, limit.toLong) // box runs to EOF
          else (off + 8, off + size32)
        if (end > limit || end <= payload) null else (typ, payload, end.toInt)
      }
      var off = 0
      var brand = ""
      var timescale = 0
      var duration = 0L
      var tracks = 0
      var sawMoov = false
      while (off < bytes.length) {
        val box = boxAt(off, bytes.length)
        if (box == null) return quarantine
        val (typ, payload, end) = box
        typ match {
          case "ftyp" => brand = fourcc(payload)
          case "moov" =>
            sawMoov = true
            var c = payload
            while (c < end) {
              val child = boxAt(c, end)
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
    * DECODING stays a declared stub ([[sampleFrames]]): the JDK ships no
    * video codec; the container layer here is real.
    */
  def decodeVideoMeta(items: Dataset[MediaItem]): Dataset[VideoMeta] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map(m => parseMp4Meta(m.id, m.media)))
  }

  /** STUB frame sampling for video bytes: emits every `stride`-th fake frame;
    * the JDK ships no video CODEC, so real pixel extraction needs a native
    * decoder per partition — the schema/batch contract here is what it would
    * target. Container METADATA (duration, tracks, brand) is real: see
    * [[decodeVideoMeta]].
    */
  def sampleFrames(items: Dataset[MediaItem], nFrames: Int = 4,
      featureDim: Int = 8): Dataset[FrameSample] = {
    import items.sparkSession.implicits._
    items.flatMap { m =>
      val h = m.media.foldLeft(1469598103934665603L)((acc, b) => (acc ^ b) * 1099511628211L)
      (0 until nFrames).map { f =>
        val fh = h * (f + 1)
        FrameSample(m.id, f,
          Array.tabulate(featureDim)(i => math.floorMod(fh >> (i * 4), 1024) / 1024.0f))
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
