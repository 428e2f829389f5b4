package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRecord}

class MultimodalSpec extends SparkSpec {

  private def records = {
    import spark.implicits._
    Seq(
      MediaRecord(1L, "fake-jpeg-bytes-aaaa".getBytes("UTF-8"),
        MediaMeta("image", 1920, 1080, 3, 0, 0)),
      MediaRecord(2L, "fake-wav-bytes".getBytes("UTF-8"),
        MediaMeta("audio", 0, 0, 1, 16000, 0)),
      MediaRecord(3L, "fake-mp4".getBytes("UTF-8"),
        MediaMeta("video", 640, 480, 3, 0, 10)),
      MediaRecord(4L, Array.emptyByteArray, MediaMeta("image", 8, 8, 1, 0, 0))
    ).toDS()
  }

  test("decodeAndFeaturize is deterministic and partition-shape independent") {
    val a = Multimodal.decodeAndFeaturize(records, dim = 8)
      .collect().sortBy(_.doc_id)
    val b = Multimodal.decodeAndFeaturize(records.repartition(7), dim = 8)
      .collect().sortBy(_.doc_id)
    assert(a.length == 4)
    assert(a.map(_.content_id).toSeq == b.map(_.content_id).toSeq)
    assert(a.map(_.features.toSeq).toSeq == b.map(_.features.toSeq).toSeq)
    assert(a.forall(_.features.length == 8))
    assert(a.find(_.doc_id == 1L).get.n_bytes == 20L)
    // sha-256 of empty payload is the well-known constant
    assert(a.find(_.doc_id == 4L).get.content_id ==
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
  }

  // real container bytes, produced by the JDK's own encoders — the sniffing
  // under test then has to agree with a second, independent implementation
  private def encode(fmt: String, w: Int, h: Int,
      imgType: Int = java.awt.image.BufferedImage.TYPE_INT_RGB): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, imgType)
    img.setRGB(0, 0, 0xff8800) // non-trivial pixel so encoders emit real data
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt encoder")
    out.toByteArray
  }

  test("sniffImage parses real PNG/JPEG/GIF headers, rejects junk") {
    import Multimodal.{sniffImage, ImageInfo}
    assert(sniffImage(encode("png", 640, 360)) ==
      Some(ImageInfo("png", 640, 360, 3)))
    assert(sniffImage(encode("png", 12, 7,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)) ==
      Some(ImageInfo("png", 12, 7, 1)))
    assert(sniffImage(encode("png", 3, 3,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)) ==
      Some(ImageInfo("png", 3, 3, 4)))
    assert(sniffImage(encode("jpg", 320, 200)) ==
      Some(ImageInfo("jpeg", 320, 200, 3)))
    assert(sniffImage(encode("gif", 48, 32)) ==
      Some(ImageInfo("gif", 48, 32, 3)))
    assert(sniffImage("not an image at all, just text".getBytes("UTF-8")).isEmpty)
    assert(sniffImage(Array.emptyByteArray).isEmpty)
    assert(sniffImage(null).isEmpty)
    // truncated PNG: signature only, no IHDR
    assert(sniffImage(encode("png", 10, 10).take(12)).isEmpty)
    // truncated JPEG: SOI + APP0 but cut before any SOF marker
    assert(sniffImage(encode("jpg", 10, 10).take(8)).isEmpty)
  }

  test("sniffAudio parses real WAV headers from the JDK encoder") {
    import Multimodal.{sniffAudio, AudioInfo}
    import javax.sound.sampled._
    def wav(rateHz: Float, channels: Int): Array[Byte] = {
      val fmt = new AudioFormat(rateHz, 16, channels, true, false)
      val pcm = new Array[Byte](fmt.getFrameSize * 100)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 100)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    assert(sniffAudio(wav(16000f, 1)) == Some(AudioInfo("wav", 1, 16000)))
    assert(sniffAudio(wav(44100f, 2)) == Some(AudioInfo("wav", 2, 44100)))
    assert(sniffAudio("RIFFxxxxNOPE".getBytes("UTF-8")).isEmpty)
    assert(sniffAudio(wav(16000f, 1).take(20)).isEmpty) // truncated
    assert(sniffAudio(null).isEmpty)
    // a WAV payload re-types a mislabeled record as audio with real rate
    import spark.implicits._
    val ds = Seq(MediaRecord(20L, wav(22050f, 2),
      MediaMeta("video", 640, 480, 3, 0, 10))).toDS()
    val out = Multimodal.decodeAndFeaturize(ds, dim = 4).collect().head
    assert(out.media == MediaMeta("audio", 0, 0, 2, 22050, 10))
  }

  test("decodeAndFeaturize trusts sniffed headers over declared metadata") {
    import spark.implicits._
    val png = encode("png", 100, 50)
    val ds = Seq(
      // lying metadata: declared 1x1 audio, payload is a real 100x50 PNG
      MediaRecord(10L, png, MediaMeta("audio", 1, 1, 1, 44100, 0)),
      // unrecognizable payload: declared metadata carries through untouched
      MediaRecord(11L, "opaque-bytes".getBytes("UTF-8"),
        MediaMeta("audio", 0, 0, 1, 16000, 0))).toDS()
    val out = Multimodal.decodeAndFeaturize(ds, dim = 4)
      .collect().map(r => r.doc_id -> r.media).toMap
    assert(out(10L) == MediaMeta("image", 100, 50, 3, 44100, 0))
    assert(out(11L) == MediaMeta("audio", 0, 0, 1, 16000, 0))
  }

  test("resizePlan computes aspect-correct bounded dims") {
    val out = Multimodal.resizePlan(records.toDF(), maxSide = 960)
      .select("doc_id", "target_width", "target_height")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(out(1L) == ((960, 540)))  // 1920x1080 halved
    assert(out(4L) == ((8, 8)))      // already small: unchanged
  }

  test("frameSamplePlan explodes every k-th frame for videos only") {
    val frames = Multimodal.frameSamplePlan(records.toDF(), everyK = 4)
      .select("doc_id", "frame_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(frames.toSeq.sorted == Seq((3L, 0), (3L, 4), (3L, 8)))
  }

  test("dHash64: re-encoded/resized near-duplicates collide, distinct images don't") {
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // near-duplicate class: the SAME scene as lossless PNG, a JPEG
    // re-encode, a 48px resize, and a brightness shift must land within
    // the banded-LSH verification threshold (<= 6 bits of 64)
    (0L until 20L).foreach { seed =>
      val base = Multimodal.dHash64(Multimodal.renderImage(seed, 32, "png")).get
      val jpeg = Multimodal.dHash64(Multimodal.renderImage(seed, 32, "jpg")).get
      val resized = Multimodal.dHash64(Multimodal.renderImage(seed, 48, "png")).get
      val brighter = Multimodal.dHash64(
        Multimodal.renderImage(seed, 32, "png", brightness = 8)).get
      assert(ham(base, jpeg) <= 6, s"seed $seed: JPEG re-encode drifted ${ham(base, jpeg)} bits")
      assert(ham(base, resized) <= 6, s"seed $seed: resize drifted ${ham(base, resized)} bits")
      assert(ham(base, brighter) <= 2,
        s"seed $seed: brightness shift must be nearly invisible to comparisons")
    }
    // distinct-image class: different scenes must stay far apart — checked
    // in AGGREGATE (individual low-frequency scenes can genuinely look
    // alike; a dedup threshold lives on the distribution's far side)
    val hashes = (100L until 140L).map(s =>
      Multimodal.dHash64(Multimodal.renderImage(s, 32, "png")).get)
    val dists = for (i <- hashes.indices; j <- i + 1 until hashes.size)
      yield ham(hashes(i), hashes(j))
    assert(dists.count(_ <= 6).toDouble / dists.size <= 0.02,
      s"more than 2% of distinct scene pairs collide: ${dists.count(_ <= 6)}/${dists.size}")
    assert(dists.sum.toDouble / dists.size > 15.0,
      s"mean distinct-pair distance too low: ${dists.sum.toDouble / dists.size}")
    // undecodable payloads refuse with None instead of fabricating pixels
    assert(Multimodal.dHash64("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.dHash64(Array.emptyByteArray).isEmpty)
    assert(Multimodal.dHash64(null).isEmpty)
  }

  test("decodePcm round-trips 16-bit PCM and integer-mixes stereo to mono") {
    import javax.sound.sampled._
    def wav(rateHz: Float, samples: Array[Array[Int]]): Array[Byte] = {
      val channels = samples.head.length
      val fmt = new AudioFormat(rateHz, 16, channels, true, false)
      val pcm = new Array[Byte](samples.length * 2 * channels)
      samples.zipWithIndex.foreach { case (frame, f) =>
        frame.zipWithIndex.foreach { case (s, c) =>
          pcm(2 * (f * channels + c)) = (s & 0xff).toByte
          pcm(2 * (f * channels + c) + 1) = ((s >> 8) & 0xff).toByte
        }
      }
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    // mono: exact sample round-trip, negative values sign-extended
    val mono = Array(Array(0), Array(32767), Array(-32768), Array(-1), Array(123))
    val (rate, ch, got) = Multimodal.decodePcm(wav(16000f, mono)).get
    assert(rate == 16000 && ch == 1)
    assert(got.toSeq == Seq(0, 32767, -32768, -1, 123))
    // stereo: integer per-frame channel average
    val stereo = Array(Array(100, 200), Array(-101, 100), Array(5, 4))
    val (_, ch2, mixed) = Multimodal.decodePcm(wav(8000f, stereo)).get
    assert(ch2 == 2)
    assert(mixed.toSeq == Seq(150, 0, 4)) // (-101+100)/2 and 9/2 truncate toward 0
    // refusals: junk, truncation, null — None, never fabricated samples
    assert(Multimodal.decodePcm("RIFFxxxxWAVEbut-no-chunks".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodePcm(wav(8000f, mono).take(30)).isEmpty)
    assert(Multimodal.decodePcm(null).isEmpty)
  }

  test("aHash64: resampled/volume-scaled near-duplicates collide, distinct clips don't") {
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // near-duplicate class: the SAME tune at 8 kHz, resampled to 11.025 kHz
    // and 44.1 kHz, and at half volume, must land within the banded-LSH
    // verification threshold (<= 6 bits of 64; measured worst drift 3)
    (0L until 20L).foreach { seed =>
      val base = Multimodal.aHash64(Multimodal.renderWav(seed, 8000)).get
      val res = Multimodal.aHash64(Multimodal.renderWav(seed, 11025)).get
      val res44 = Multimodal.aHash64(Multimodal.renderWav(seed, 44100)).get
      val vol = Multimodal.aHash64(Multimodal.renderWav(seed, 8000, volumePct = 50)).get
      assert(ham(base, res) <= 6, s"seed $seed: 11kHz resample drifted ${ham(base, res)} bits")
      assert(ham(base, res44) <= 6, s"seed $seed: 44kHz resample drifted ${ham(base, res44)} bits")
      assert(ham(base, vol) <= 2,
        s"seed $seed: volume scaling must be nearly invisible to comparisons")
    }
    // distinct-clip class: checked in AGGREGATE like dHash64's scenes
    val hashes = (100L until 140L).map(s =>
      Multimodal.aHash64(Multimodal.renderWav(s, 8000)).get)
    val dists = for (i <- hashes.indices; j <- i + 1 until hashes.size)
      yield ham(hashes(i), hashes(j))
    assert(dists.count(_ <= 6).toDouble / dists.size <= 0.02,
      s"more than 2% of distinct clip pairs collide: ${dists.count(_ <= 6)}/${dists.size}")
    assert(dists.sum.toDouble / dists.size > 15.0,
      s"mean distinct-pair distance too low: ${dists.sum.toDouble / dists.size}")
    // undecodable payloads refuse with None instead of fabricating samples
    assert(Multimodal.aHash64("not audio".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.aHash64(Array.emptyByteArray).isEmpty)
    assert(Multimodal.aHash64(null).isEmpty)
  }

  test("videoHashes: frame-rate/resize near-duplicates collide, distinct clips don't") {
    def ham(a: Array[Long], b: Array[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    // near-duplicate class: the SAME motion recorded at 6 and 9 frames, at
    // 48px, and brightness-shifted must land within the verification
    // threshold (<= 24 bits summed over 4 slots — the per-slot <= 6 of
    // dHash64; measured worst drift: frame-rate 6, resize 22, brightness 0)
    (0L until 20L).foreach { seed =>
      val base = Multimodal.videoHashes(Multimodal.renderVideo(seed, 6, 32)).get
      assert(base.length == 4)
      val fr = Multimodal.videoHashes(Multimodal.renderVideo(seed, 9, 32)).get
      val rs = Multimodal.videoHashes(Multimodal.renderVideo(seed, 6, 48)).get
      val br = Multimodal.videoHashes(
        Multimodal.renderVideo(seed, 6, 32, brightness = 8)).get
      assert(ham(base, fr) <= 24, s"seed $seed: frame-rate change drifted ${ham(base, fr)} bits")
      assert(ham(base, rs) <= 24, s"seed $seed: resize drifted ${ham(base, rs)} bits")
      assert(ham(base, br) <= 8,
        s"seed $seed: brightness shift must be nearly invisible to comparisons")
    }
    // distinct-clip class: checked in AGGREGATE like dHash64's scenes
    val hashes = (100L until 140L).map(s =>
      Multimodal.videoHashes(Multimodal.renderVideo(s, 6, 32)).get)
    val dists = for (i <- hashes.indices; j <- i + 1 until hashes.size)
      yield ham(hashes(i), hashes(j))
    assert(dists.count(_ <= 24).toDouble / dists.size <= 0.02,
      s"more than 2% of distinct clip pairs collide: ${dists.count(_ <= 24)}/${dists.size}")
    assert(dists.sum.toDouble / dists.size > 60.0,
      s"mean distinct-pair distance too low: ${dists.sum.toDouble / dists.size}")
    // undecodable payloads refuse with None instead of fabricating frames
    assert(Multimodal.videoHashes("not a video".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.videoHashes(Array.emptyByteArray).isEmpty)
    assert(Multimodal.videoHashes(null).isEmpty)
  }

  test("decodeFrames returns every GIF frame; still images are 1-frame videos") {
    val fs = Multimodal.decodeFrames(Multimodal.renderVideo(3L, 6, 32)).get
    assert(fs.size == 6)
    assert(fs.forall { case (w, h, g) => w == 32 && h == 32 && g.length == 1024 })
    // frames genuinely differ (the motion is real, not a repeated still)
    assert(fs.head._3.toSeq != fs.last._3.toSeq)
    // a single still image decodes as a 1-frame clip whose hash slots all
    // equal the still's dHash64 — the two hash spaces are the same space
    val still = Multimodal.renderImage(5L, 32, "png")
    val vh = Multimodal.videoHashes(still).get
    assert(vh.toSeq == Seq.fill(4)(Multimodal.dHash64(still).get))
  }

  test("decodeGray round-trips the JDK encoder's pixels exactly (PNG lossless)") {
    val bytes = Multimodal.renderImage(7L, 32, "png")
    val (w, h, gray) = Multimodal.decodeGray(bytes).get
    assert(w == 32 && h == 32 && gray.length == 1024)
    assert(gray.forall(g => g >= 0 && g <= 255))
    // grayscale scene: all three channels equal, so luma == channel value;
    // two decodes agree bit-for-bit (determinism of the whole path)
    val again = Multimodal.decodeGray(Multimodal.renderImage(7L, 32, "png")).get._3
    assert(java.util.Arrays.equals(gray, again))
  }

  test("features feed the vector ops: quantized_cosine over decoded output") {
    graft.functions.GraftFunctions.register(spark)
    val d = Multimodal.decodeAndFeaturize(records, dim = 8).toDF()
    val sim = d.as("a").join(d.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(call_function("quantized_cosine", col("a.features"), col("b.features")).as("c"))
      .collect()
    assert(sim.length == 6)
  }
}
