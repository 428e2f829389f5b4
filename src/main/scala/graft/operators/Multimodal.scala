package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines: image/audio/video
  * payloads ride as opaque `binary` columns with a typed metadata struct, and
  * the compute stages (decode → feature-extract / resize / frame-sample) run
  * as partition-local batch transforms.
  *
  * The header decode is real ([[Multimodal.sniffImage]] parses PNG/JPEG/GIF
  * container headers from magic bytes, pure JVM); only the learned-embedding
  * featurizer (`decodeStub`) is a clearly-marked deterministic stand-in —
  * and every Spark-side decision is the real one a production pipeline
  * needs:
  *
  *  - schema: `payload: binary` + `media: struct<...>` keeps the blob
  *    column-pruned away unless a stage actually needs bytes;
  *  - partition shape: `mapPartitions` over an iterator, so a JNI/FFI codec
  *    initializes once per partition (not per row) and rows stream through
  *    without materializing the partition;
  *  - repartition before decode: payload bytes dominate task size, so
  *    decode parallelism follows row count, not file-split count;
  *  - feature output: fixed-width `array<float>`, ready for the vector ops
  *    in [[graft.queries.SimilarityOps]] / `quantized_cosine`.
  */
object Multimodal {

  // ImageIO's default stream cache backs every encode/decode with a TEMP
  // FILE; under 32 concurrent decode tasks the create/delete round-trips
  // serialize the whole stage on the filesystem. Payloads here are
  // in-memory byte arrays (KBs), so memory-backed streams are strictly
  // better. Object-init runs once per executor JVM on first use.
  javax.imageio.ImageIO.setUseCache(false)

  /** Typed media metadata carried beside the payload. */
  case class MediaMeta(
      modality: String, // image | audio | video
      width: Int, height: Int, channels: Int,
      sampleRateHz: Int, nFrames: Int)

  /** Sniffed image container info, parsed from real magic bytes. */
  case class ImageInfo(format: String, width: Int, height: Int, channels: Int)

  /** Pure-JVM image header parsing from the payload's leading bytes — no
    * codec libraries involved, just the public container formats:
    *  - PNG: 8-byte signature, then the IHDR chunk (always first) carries
    *    width/height as big-endian ints and a color type that fixes the
    *    channel count (PNG spec, RFC 2083 §4.1.1);
    *  - JPEG: FF D8 SOI, then marker segments; any SOFn frame header
    *    (C0–CF minus C4/C8/CC) carries height, width, component count
    *    (ITU T.81 §B.2.2);
    *  - GIF: "GIF87a"/"GIF89a", then little-endian logical screen size.
    * Returns None for anything unrecognized or truncated — callers keep
    * their declared metadata in that case.
    */
  def sniffImage(bytes: Array[Byte]): Option[ImageInfo] = {
    if (bytes == null || bytes.length < 10) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    // PNG
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (bytes.length >= 26 && pngSig.indices.forall(i => u8(i) == pngSig(i)) &&
        new String(bytes, 12, 4, java.nio.charset.StandardCharsets.US_ASCII) == "IHDR") {
      val channels = u8(25) match {
        case 0 => 1 // greyscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette index
        case 4 => 2 // grey + alpha
        case 6 => 4 // truecolor + alpha
        case _ => return None
      }
      return Some(ImageInfo("png", be32(16), be32(20), channels))
    }
    // JPEG
    if (u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 3 < bytes.length) {
        if (u8(i) != 0xff) return None // desynced marker stream
        var m = u8(i + 1)
        while (m == 0xff && i + 2 < bytes.length) { i += 1; m = u8(i + 1) } // fill bytes
        m match {
          case 0xd8 | 0x01 => i += 2 // SOI / TEM: standalone
          case r if r >= 0xd0 && r <= 0xd7 => i += 2 // RSTn: standalone
          case 0xd9 => return None // EOI before any frame header
          case sof if sof >= 0xc0 && sof <= 0xcf &&
              sof != 0xc4 && sof != 0xc8 && sof != 0xcc =>
            if (i + 9 >= bytes.length) return None
            return Some(ImageInfo("jpeg", be16(i + 7), be16(i + 5), u8(i + 9)))
          case _ =>
            if (i + 3 >= bytes.length) return None
            i += 2 + be16(i + 2) // length field includes itself
        }
      }
      return None
    }
    // GIF
    if (bytes.length >= 10 &&
        new String(bytes, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
          .matches("GIF8[79]a"))
      return Some(ImageInfo("gif", le16(6), le16(8), 3))
    None
  }

  /** Sniffed audio container info, parsed from real magic bytes. */
  case class AudioInfo(format: String, channels: Int, sampleRateHz: Int)

  /** WAV (RIFF/WAVE) header parsing: "RIFF" + chunk size + "WAVE", then a
    * chunk walk to "fmt " whose body carries channels and sample rate as
    * little-endian fields (the public RIFF spec). Returns None for
    * anything unrecognized or truncated.
    */
  def sniffAudio(bytes: Array[Byte]): Option[AudioInfo] = {
    if (bytes == null || bytes.length < 28) return None
    def ascii(i: Int, n: Int) =
      new String(bytes, i, n, java.nio.charset.StandardCharsets.US_ASCII)
    def le16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def le32(i: Int): Long = (le16(i).toLong) | (le16(i + 2).toLong << 16)
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
    // LONG chunk cursor: a corrupt/adversarial header can declare a chunk
    // size near 2^31, and an Int cursor would wrap negative and throw on
    // the next ascii() read instead of honoring the None-for-undecodable
    // contract. Word-aligned stepping, monotonicity-guarded.
    var i = 12L
    while (i + 8 <= bytes.length) {
      val off = i.toInt // safe: i < bytes.length <= Int.MaxValue here
      val id = ascii(off, 4)
      val size = le32(off + 4)
      // a declared chunk size near/over 2^31 is a lying header, not a
      // payload this parser could ever see — refuse (None), as before the
      // Long-cursor fix
      if (size > Int.MaxValue - 8) return None
      if (id == "fmt ") {
        if (i + 16 > bytes.length) return None
        return Some(AudioInfo("wav", le16(off + 10), le32(off + 12).toInt))
      }
      // word-aligned advance; le32 is non-negative by construction, so the
      // cursor is strictly monotone and the loop bound terminates the walk
      i += 8 + size + (size & 1)
    }
    None
  }

  /** REAL sample decode for the audio modality: parses a RIFF/WAVE container
    * carrying 16-bit PCM (the interchange format every audio pipeline can
    * produce) and returns (sampleRateHz, channels, mono samples). Multi-
    * channel audio is mixed down by integer-averaging each frame's channels
    * — deterministic, no float rounding. None for anything that is not
    * 16-bit PCM WAV (compressed codecs need a real decoder; callers skip
    * the row rather than fabricate samples, the [[decodeGray]] contract).
    */
  def decodePcm(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes == null || bytes.length < 44) return None
    def ascii(i: Int, n: Int) =
      new String(bytes, i, n, java.nio.charset.StandardCharsets.US_ASCII)
    def le16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def le32(i: Int): Long = (le16(i).toLong) | (le16(i + 2).toLong << 16)
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
    var fmtCode = -1; var channels = 0; var rate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    // LONG chunk cursor (same reasoning as [[sniffAudio]]): an Int cursor
    // wraps negative on adversarial ~2^31 chunk sizes and throws instead
    // of returning None.
    var i = 12L
    while (i + 8 <= bytes.length) {
      val off = i.toInt // safe: i < bytes.length <= Int.MaxValue here
      val id = ascii(off, 4)
      val size = le32(off + 4)
      // lying header (declared chunk near/over 2^31): refuse, as before
      // the Long-cursor fix — never decode a clamped partial payload of it
      if (size > Int.MaxValue - 8) return None
      if (id == "fmt " && i + 24 <= bytes.length) {
        fmtCode = le16(off + 8); channels = le16(off + 10)
        rate = le32(off + 12).toInt; bits = le16(off + 22)
      } else if (id == "data") {
        dataOff = off + 8
        dataLen = math.min(size, (bytes.length - dataOff).toLong).toInt
      }
      // word-aligned advance; le32 is non-negative by construction, so the
      // cursor is strictly monotone and the loop bound terminates the walk
      i += 8 + size + (size & 1)
    }
    if (fmtCode != 1 || bits != 16 || channels <= 0 || rate <= 0 ||
        dataOff < 0) return None
    val frameBytes = 2 * channels
    val nFrames = dataLen / frameBytes
    if (nFrames <= 0) return None
    val mono = new Array[Int](nFrames)
    var f = 0
    while (f < nFrames) {
      var sum = 0
      var c = 0
      while (c < channels) {
        val o = dataOff + f * frameBytes + 2 * c
        sum += (le16(o) << 16) >> 16 // sign-extend the little-endian int16
        c += 1
      }
      mono(f) = sum / channels
      f += 1
    }
    Some((rate, channels, mono))
  }

  /** 64-bit audio fingerprint over REAL decoded samples — the audio analog
    * of [[dHash64]]: split the clip into 33 equal-DURATION frames
    * (normalized time, so the same recording at 8 kHz and 44.1 kHz frames
    * identically), then emit
    *  - bits 0–31: adjacent-frame LOUDNESS comparisons (mean |sample|,
    *    compared via cross-multiplied integer sums — the dHash discipline,
    *    no float rounding). Comparisons, not levels: volume scaling
    *    cancels.
    *  - bits 32–63: each frame's ZERO-CROSSING RATE against the clip's
    *    overall rate (cross-multiplied counts). Crossings are a property
    *    of the underlying waveform, not the sampling grid, so the bits
    *    survive resampling; and sign survives volume scaling.
    * Together: a loudness-envelope half and a pitch-envelope half —
    * re-encodes (resample, gain change) land within a few bits, distinct
    * recordings differ in ~32. None for undecodable payloads or clips too
    * short to frame.
    */
  def aHash64(bytes: Array[Byte]): Option[Long] =
    decodePcm(bytes).flatMap { case (_, _, mono) =>
      val n = mono.length
      if (n < 66) None // < 2 samples per frame: the grid is meaningless
      else {
        val F = 33
        val sumAbs = new Array[Long](F)
        val cnt = new Array[Long](F)
        val zc = new Array[Long](F)
        var lastSign = 0
        var i = 0
        while (i < n) {
          val k = (i.toLong * F / n).toInt
          val s = mono(i)
          sumAbs(k) += math.abs(s)
          cnt(k) += 1
          val sgn = if (s > 0) 1 else if (s < 0) -1 else 0
          // a crossing is strict positive -> strict negative (or back);
          // zero samples extend the previous run instead of oscillating
          if (sgn != 0) {
            if (lastSign != 0 && sgn != lastSign) zc(k) += 1
            lastSign = sgn
          }
          i += 1
        }
        var bits = 0L
        var totZc = 0L
        var k = 0
        while (k < F) { totZc += zc(k); k += 1 }
        k = 0
        while (k < 32) {
          // mean-|s| comparison via cross-multiplied sums: pure integer
          if (sumAbs(k) * cnt(k + 1) < sumAbs(k + 1) * cnt(k))
            bits |= (1L << k)
          // frame ZCR above the clip's overall ZCR (n.toLong = total count)
          if (zc(k) * n > totZc * cnt(k)) bits |= (1L << (32 + k))
          k += 1
        }
        Some(bits)
      }
    }

  /** Deterministic synthetic audio clip: a smooth seeded "tune" — a carrier
    * whose PITCH sweeps (seeded center + sweep rate) under a seeded
    * LOUDNESS envelope — rendered as 16-bit PCM mono WAV at the requested
    * sample rate in NORMALIZED time (two renders of one seed at different
    * rates record the same half-second of sound, i.e. a true resample), at
    * `volumePct` gain (aHash64 must ignore it). The carrier phase
    * accumulates per sample from the instantaneous frequency, so crossing
    * positions track the continuous waveform at any rate. StrictMath keeps
    * every sample bit-identical across JVMs. This is the test/fixture audio
    * source — the container ships no audio corpus, and a production
    * pipeline swaps in its real blobs at exactly this column.
    */
  def renderWav(seed: Long, sampleRateHz: Int, volumePct: Int = 100): Array[Byte] = {
    val durationMs = 500
    val n = sampleRateHz * durationMs / 1000
    // loudness-envelope frequencies stay LOW (2..4 / 3..6 cycles per clip)
    // so adjacent 15 ms frames differ by a solid margin except right at
    // envelope extrema — the same reasoning as renderImage's scene terms
    val a = (mix64(seed) >>> 33) % 3 + 2
    val b = (mix64(seed + 1) >>> 33) % 4 + 3
    val c = (mix64(seed + 2) >>> 33) % 4 + 2 // pitch-sweep cycles per clip
    val phase = (mix64(seed + 3) >>> 40) % 628 / 100.0
    val phase2 = (mix64(seed + 4) >>> 40) % 628 / 100.0
    val phase3 = (mix64(seed + 5) >>> 40) % 628 / 100.0
    val f0 = ((mix64(seed + 6) >>> 33) % 500 + 700).toDouble // 700..1199 Hz
    val pcm = new Array[Byte](n * 2)
    var ph = 0.0
    var i = 0
    while (i < n) {
      val u = (i + 0.5) / n // normalized clip time, 0..1 at any rate
      val amp = 0.55 + 0.25 * StrictMath.cos(2 * StrictMath.PI * a * u + phase) +
        0.20 * StrictMath.sin(2 * StrictMath.PI * b * u + phase2)
      val f = f0 + 450.0 * StrictMath.cos(2 * StrictMath.PI * c * u + phase3)
      ph += 2 * StrictMath.PI * f / sampleRateHz
      val v = amp * StrictMath.sin(ph) * 30000.0 * volumePct / 100.0
      val s = math.max(-32768L, math.min(32767L, StrictMath.round(v))).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRateHz.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL pixel decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP readers ship
    * with the JVM — no external codec): returns (width, height, grayscale
    * 0..255 row-major). None for undecodable/empty payloads — callers skip
    * the row rather than fabricate pixels. Row-local; initialize per
    * partition like every decode in this module (ImageIO readers are
    * cheap, but the call sits inside the same mapPartitions batch shape a
    * JNI codec would).
    */
  def decodeGray(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes == null || bytes.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return None
    grayPlane(img)
  }

  /** BT.601 integer-luma grayscale plane of a decoded image — the ONE
    * pixel-read path of the module ([[decodeGray]] and the per-frame video
    * decode both use it, so the two hash spaces share pixels by
    * construction). Bulk `getRGB(0,0,w,h,...)` over a row-major buffer:
    * the same sRGB conversion as per-pixel getRGB, minus a per-pixel
    * virtual call + ColorModel dispatch (several× faster on large frames;
    * hash bits unchanged — MultimodalSpec pins exact collide/distinct
    * cases and the lossless PNG round-trip).
    */
  private def grayPlane(img: java.awt.image.BufferedImage)
      : Option[(Int, Int, Array[Int])] = {
    val (w, h) = (img.getWidth, img.getHeight)
    if (w <= 0 || h <= 0) return None
    val rgbs = img.getRGB(0, 0, w, h, null, 0, w)
    val gray = new Array[Int](w * h)
    var i = 0
    while (i < gray.length) {
      val rgb = rgbs(i)
      // ITU-R BT.601 integer luma — deterministic, no float rounding
      gray(i) = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
        114 * (rgb & 0xff)) / 1000
      i += 1
    }
    Some((w, h, gray))
  }

  /** 64-bit difference hash (dHash) over REAL decoded pixels: box-average
    * the grayscale image onto a 9x8 grid (each cell averages its whole
    * pixel box, so codec noise — JPEG quantization, resize resampling —
    * averages out), then emit one bit per horizontal neighbor comparison
    * (cell < right-neighbor), 8x8 = 64 bits. Scale-invariant by
    * construction (the grid samples normalized coordinates), brightness-
    * shift-invariant (comparisons, not levels), and row-local — the
    * standard perceptual pre-filter a VLM corpus dedups images with
    * BEFORE any embedding model runs. Near-duplicates (re-encodes,
    * resizes, small edits) land within a few bits; distinct images differ
    * in ~32. None for undecodable payloads or images too small to grid.
    */
  def dHash64(bytes: Array[Byte]): Option[Long] =
    decodeGray(bytes).flatMap(dHashOfGray)

  /** [[dHash64]]'s grid+comparison core over an already-decoded grayscale
    * plane — shared by the single-image path and the per-frame video path
    * ([[videoHashes]]), so the two hash spaces are identical by
    * construction (an extracted video frame and the same still image get
    * the same bits).
    */
  private def dHashOfGray(plane: (Int, Int, Array[Int])): Option[Long] = {
    val (w, h, gray) = plane
    if (w < 9 || h < 8) None
    else {
        val cells = new Array[Long](72) // sums, 8 rows x 9 cols
        val counts = new Array[Int](72)
        var y = 0
        while (y < h) {
          val r = y * 8 / h
          var x = 0
          while (x < w) {
            val c = x * 9 / w
            cells(r * 9 + c) += gray(y * w + x)
            counts(r * 9 + c) += 1
            x += 1
          }
          y += 1
        }
        var bits = 0L
        var k = 0
        var r = 0
        while (r < 8) {
          var c = 0
          while (c < 8) {
            // compare MEANS via cross-multiplied sums: pure integer math,
            // no float rounding to diverge across runs
            val l = cells(r * 9 + c) * counts(r * 9 + c + 1)
            val rt = cells(r * 9 + c + 1) * counts(r * 9 + c)
            if (l < rt) bits |= (1L << k)
            k += 1
            c += 1
          }
          r += 1
        }
        Some(bits)
    }
  }

  /** REAL multi-frame decode for the video modality: an animated GIF is the
    * one video container the JVM decodes with no external codec (ImageIO's
    * GIF reader returns every frame), so it stands in for the mp4/webm
    * decode a production pipeline plugs in at this exact signature.
    * Returns each frame as a grayscale plane (BT.601 integer luma, the
    * [[decodeGray]] convention). None for undecodable payloads or
    * containers with zero frames.
    */
  def decodeFrames(bytes: Array[Byte]): Option[Seq[(Int, Int, Array[Int])]] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      // try/finally on BOTH resources: an exception mid-read is caught and
      // turned into None, which must not leak the reader or the stream
      // (memory-backed under setUseCache(false), but hygiene is uniform)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          if (n <= 0) return None
          val frames = (0 until n).map { i =>
            grayPlane(reader.read(i)).get // decoded frames have w,h >= 1
          }
          Some(frames)
        } finally reader.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-video perceptual fingerprint: sample `k` frames at NORMALIZED clip
    * positions — frame floor((2j+1)·n / 2k) is the one whose time span
    * contains clip position (2j+1)/2k, so a 6-frame and a 9-frame encode of
    * the same motion sample (nearly) the same instants — and [[dHash64]]
    * each sampled frame through the shared grid core. The result is k
    * 64-bit hashes in clip order: re-encodes (frame-rate change, resize,
    * brightness) drift a few bits per slot, distinct clips differ in ~32
    * per slot. None if the container fails to decode.
    */
  def videoHashes(bytes: Array[Byte], k: Int = 4): Option[Array[Long]] =
    decodeFrames(bytes).flatMap { frames =>
      val n = frames.size
      val hs = (0 until k).map { j =>
        val idx = math.min(n - 1, (2 * j + 1) * n / (2 * k))
        dHashOfGray(frames(idx))
      }
      // a frame too small to grid refuses the whole clip, never a partial hash
      if (hs.forall(_.isDefined)) Some(hs.map(_.get).toArray) else None
    }

  /** Deterministic synthetic video clip: the [[renderImage]] scene family
    * given MOTION — each seeded frequency term's phase drifts linearly over
    * normalized clip time, so a render with more frames is a higher-frame-
    * rate recording of the SAME motion (not a different clip). Encoded as
    * an animated GIF via the JDK's own sequence writer. Grayscale scenes
    * quantize losslessly into GIF's 256-entry palette. This is the
    * test/fixture video source — the container ships no video corpus, and
    * a production pipeline swaps in its real blobs at exactly this column.
    */
  def renderVideo(seed: Long, frames: Int, side: Int,
      brightness: Int = 0): Array[Byte] = {
    val a = (mix64(seed) >>> 33) % 9 + 1
    val b = (mix64(seed + 1) >>> 33) % 7 + 1
    val c = (mix64(seed + 3) >>> 33) % 5 + 1
    val phase = (mix64(seed + 2) >>> 40) % 628 / 100.0
    val phase2 = (mix64(seed + 4) >>> 40) % 628 / 100.0
    // total phase drift over the clip: 0.30..0.99 rad — visible motion,
    // slow enough that the <=1/(2k)-clip sampling offset between frame-rate
    // variants moves each sampled frame's hash only a few bits
    val motion = ((mix64(seed + 5) >>> 40) % 70 + 30) / 100.0
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var fi = 0
    while (fi < frames) {
      val tm = (fi + 0.5) / frames
      // BYTE_GRAY + raster writes: the GIF encoder skips per-frame RGB
      // palette quantization for grayscale rasters, and setSample skips
      // the ColorModel round-trip setRGB pays — the scene is gray anyway
      val img = new java.awt.image.BufferedImage(
        side, side, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      // the scene is a sum of a row term, a column term, and a diagonal
      // term — precompute each as an O(side) lookup so the per-pixel loop
      // does three array reads instead of three StrictMath calls (the
      // fixture renderer runs once per corpus row; at 5k docs x 3 variants
      // x N frames the trig would dominate the whole operator)
      val rowT = Array.tabulate(side)(x =>
        StrictMath.cos(a * ((x + 0.5) / side) * StrictMath.PI + phase + motion * tm))
      val colT = Array.tabulate(side)(y =>
        StrictMath.sin(b * ((y + 0.5) / side) * StrictMath.PI - phase + motion * tm))
      val diagT = Array.tabulate(2 * side - 1)(d =>
        StrictMath.cos(((d + 1.0) / side) * c * StrictMath.PI + phase2 - motion * tm))
      var y = 0
      while (y < side) {
        var x = 0
        while (x < side) {
          val s = rowT(x) + colT(y) + diagT(x + y) + (x - y).toDouble / side
          val g0 = ((s + 4.0) / 8.0 * 255.0).toInt + brightness
          val g = math.max(0, math.min(255, g0))
          raster.setSample(x, y, 0, g)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null),
        writer.getDefaultWriteParam)
      fi += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    out.toByteArray
  }

  /** Deterministic synthetic image: a smooth high-contrast scene seeded by
    * `seed`, rendered at `side`x`side` in NORMALIZED coordinates (so two
    * renders of the same seed at different sizes depict the same picture),
    * encoded with the requested JDK container ("png" lossless / "jpg"
    * lossy). `brightness` shifts every channel (dHash must ignore it).
    * StrictMath keeps the pixels bit-identical across JVMs. This is the
    * test/fixture image source — the container ships no image corpus, and
    * a production pipeline swaps in its real blobs at exactly this column.
    */
  def renderImage(seed: Long, side: Int, format: String,
      brightness: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val a = (mix64(seed) >>> 33) % 9 + 1
    val b = (mix64(seed + 1) >>> 33) % 7 + 1
    val c = (mix64(seed + 3) >>> 33) % 5 + 1
    val phase = (mix64(seed + 2) >>> 40) % 628 / 100.0
    val phase2 = (mix64(seed + 4) >>> 40) % 628 / 100.0
    var y = 0
    while (y < side) {
      var x = 0
      while (x < side) {
        val u = (x + 0.5) / side
        val v = (y + 0.5) / side
        // three seeded frequency terms — enough scene diversity that two
        // different seeds land ~32 bits apart in dHash space (one or two
        // low-frequency terms left many seed pairs within the near-dup
        // threshold)
        val s = StrictMath.cos(a * u * StrictMath.PI + phase) +
          StrictMath.sin(b * v * StrictMath.PI - phase) +
          StrictMath.cos((u + v) * c * StrictMath.PI + phase2) + (u - v)
        val g0 = ((s + 4.0) / 8.0 * 255.0).toInt + brightness
        val g = math.max(0, math.min(255, g0))
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }

  private def mix64(z0: Long): Long = {
    // splitmix64 finalizer — public-domain mixing constants
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  case class MediaRecord(doc_id: Long, payload: Array[Byte], media: MediaMeta)

  case class DecodedRecord(
      doc_id: Long, media: MediaMeta, n_bytes: Long, content_id: String,
      features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media", StructType(Seq(
      StructField("modality", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("sampleRateHz", IntegerType),
      StructField("nFrames", IntegerType))), nullable = true)))

  /** Feature extraction: deterministic stand-in for a learned embedding
    * model (the container has no inference runtime). The header DECODE step
    * above ([[sniffImage]]) is real; only this featurizer is a placeholder a
    * production pipeline swaps for its CNN/audio encoder — same signature,
    * same batch/partition shape. The stand-in "features" are moments of the
    * byte distribution, so they are stable across runs, partitionings, and
    * engines.
    */
  private def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    // a real model (e.g. JPEG -> RGB -> CNN embedding) replaces this body
    val out = new Array[Float](dim)
    if (payload == null || payload.isEmpty) return out
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      out(i % dim) += b / 255.0f
      i += 1
    }
    var j = 0
    while (j < dim) { out(j) = out(j) / payload.length * dim; j += 1 }
    out
  }

  /** decode + feature-extract: partition-local, codec init once per
    * partition, streaming iterator in and out.
    */
  def decodeAndFeaturize(records: Dataset[MediaRecord], dim: Int = 16): Dataset[DecodedRecord] = {
    import records.sparkSession.implicits._
    records
      .repartition(records.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        // real pipeline: initialize the codec/model HERE, once per partition
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        it.map { r =>
          val bytes = Option(r.payload).getOrElse(Array.emptyByteArray)
          digest.reset()
          val id = digest.digest(bytes).map("%02x".format(_)).mkString
          // trust the bytes over the declared metadata: a recognizable
          // image/audio header overrides modality/dims/channels (bad
          // upstream metadata is the norm in scraped corpora)
          val media = sniffImage(bytes) match {
            case Some(info) => r.media.copy(modality = "image",
              width = info.width, height = info.height,
              channels = info.channels)
            case None => sniffAudio(bytes) match {
              case Some(a) => r.media.copy(modality = "audio",
                width = 0, height = 0, channels = a.channels,
                sampleRateHz = a.sampleRateHz)
              case None => r.media
            }
          }
          DecodedRecord(r.doc_id, media, bytes.length.toLong, id,
            decodeStub(bytes, dim))
        }
      }
  }

  /** resize: pure metadata rewrite at this layer (the payload transform is
    * part of the decode stub); keeps aspect-correct target dims.
    */
  def resizePlan(df: DataFrame, maxSide: Int): DataFrame = {
    // non-spatial modalities (audio) carry 0x0 dims: scale 1, no-op resize
    val side = greatest(col("media.width"), col("media.height"))
    val scale = when(side <= 0, lit(1.0))
      .otherwise(least(lit(1.0), lit(maxSide) / side))
    // the least() clamp matters: ceil(dim * (maxSide/side)) can overshoot
    // maxSide by 1 when the scale ratio rounds up in double (e.g. 293 at
    // maxSide=224 -> 224.00000000000003 -> ceil 225)
    df.withColumn("target_width",
        least(ceil(col("media.width") * scale), lit(maxSide.toLong))
          .cast(IntegerType))
      .withColumn("target_height",
        least(ceil(col("media.height") * scale), lit(maxSide.toLong))
          .cast(IntegerType))
  }

  /** frame-sample: every k-th frame index per video row, row-local. */
  def frameSamplePlan(df: DataFrame, everyK: Int): DataFrame =
    df.filter(col("media.modality") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("media.nFrames") - 1, lit(everyK))))
}
