package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.{AudioMeta, MediaBlob, MediaMeta}

/** The multimodal decode path on REAL media bytes: PNG/JPEG headers
  * parse to their true dimensions and WAV headers to their true
  * rate/channels/width; unrecognized payloads keep the deterministic
  * stub (the DuckDB oracle twin for the synthetic text-byte corpus).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Real PNG bytes via the JDK's own encoder — no hand-rolled fixture
    * can drift from the spec this way.
    */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    out.toByteArray
  }

  private def gifBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", out))
    out.toByteArray
  }

  test("gifHeader reads logical screen dimensions from real GIF bytes") {
    val bytes = gifBytes(33, 21)
    assert(Multimodal.gifHeader(bytes) == Some((33, 21, 89))) // ImageIO writes GIF89a
    assert(Multimodal.gifHeader(bytes.take(8)).isEmpty)
    val corrupt = bytes.clone(); corrupt(4) = 'X'.toByte
    assert(Multimodal.gifHeader(corrupt).isEmpty)
    assert(Multimodal.gifHeader("GIF8 but actually text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.gifHeader(Array.empty[Byte]).isEmpty)
    // dispatch: a real GIF decodes to its true dimensions, not the stub
    assert(Multimodal.decodeOne(MediaBlob(9L, bytes)) ==
      MediaMeta(9L, bytes.length, 33, 21, 1))
  }

  test("pngHeader reads IHDR dimensions from real PNG bytes") {
    val bytes = pngBytes(7, 5)
    assert(Multimodal.pngHeader(bytes) == Some((7, 5, 8, 2)))
    // truncation, corruption, and non-PNG payloads all refuse cleanly
    assert(Multimodal.pngHeader(bytes.take(20)).isEmpty)
    val corrupt = bytes.clone(); corrupt(12) = 'X'.toByte
    assert(Multimodal.pngHeader(corrupt).isEmpty)
    assert(Multimodal.pngHeader("plain text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.pngHeader(Array.empty[Byte]).isEmpty)
  }

  test("decode dispatches: real PNGs to the header parser, the rest to the stub") {
    import spark.implicits._
    val png1 = pngBytes(64, 48)
    val png2 = pngBytes(300, 200)
    val text = "not an image at all".getBytes("UTF-8")
    val blobs = Seq(
      MediaBlob(1L, png1), MediaBlob(2L, png2), MediaBlob(3L, text)).toDS()
    val got = Multimodal.decode(blobs).collect().sortBy(_.doc_id).toSeq
    assert(got(0) == MediaMeta(1L, png1.length, 64, 48, 1))
    assert(got(1) == MediaMeta(2L, png2.length, 300, 200, 1))
    assert(got(2) == Multimodal.decodeStub(MediaBlob(3L, text)))

    // and the decode→resize chain runs on real bytes: 300×200 capped to
    // a 256-px longest side preserving aspect
    val resized = Multimodal.resize(Multimodal.decode(blobs))
      .collect().sortBy(_.doc_id).toSeq
    assert(resized(0).target_w == 64 && resized(0).target_h == 48)
    assert(resized(1).target_w == 256 && resized(1).target_h == 200 * 256 / 300)
  }

  /** Real JPEG bytes via the JDK's own encoder. */
  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out))
    out.toByteArray
  }

  test("jpegHeader reads SOF dimensions from real JPEG bytes") {
    val bytes = jpegBytes(17, 11)
    assert(Multimodal.jpegHeader(bytes) == Some((17, 11, 3)))
    // the ImageIO stream leads with APP0/DQT/... segments before the
    // SOF — the marker walk must skip them by declared length, so a
    // prefix that ends inside those segments refuses cleanly
    assert(Multimodal.jpegHeader(bytes.take(12)).isEmpty)
    assert(Multimodal.jpegHeader(bytes.take(2)).isEmpty)
    assert(Multimodal.jpegHeader("plain text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.jpegHeader(Array.empty[Byte]).isEmpty)
    // a PNG payload is not a JPEG and vice versa — the dispatchers can
    // never shadow each other
    assert(Multimodal.jpegHeader(pngBytes(5, 5)).isEmpty)
    assert(Multimodal.pngHeader(bytes).isEmpty)
  }

  test("decode dispatches real JPEGs to the header parser") {
    import spark.implicits._
    val jpg = jpegBytes(120, 80)
    val got = Multimodal.decode(Seq(MediaBlob(1L, jpg)).toDS()).collect()
    assert(got.head == MediaMeta(1L, jpg.length, 120, 80, 1))
  }

  /** Real WAV bytes via the JDK's own RIFF writer — `AudioSystem.write`
    * with a raw-PCM stream, no hand-rolled header.
    */
  private def wavBytes(rate: Int, channels: Int, bits: Int, nSamples: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      rate.toFloat, bits, channels, true, false)
    val frameBytes = channels * bits / 8
    val pcm = Array.tabulate[Byte](nSamples * frameBytes)(i => (i * 13 % 251).toByte)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      stream, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("wavHeader reads fmt/data chunks from real WAV bytes") {
    val bytes = wavBytes(16000, 1, 16, 480)
    assert(Multimodal.wavHeader(bytes) == Some((16000, 1, 16, 960L)))
    val stereo = wavBytes(44100, 2, 16, 100)
    assert(Multimodal.wavHeader(stereo) == Some((44100, 2, 16, 400L)))
    // truncated prefixes and non-RIFF payloads refuse cleanly
    assert(Multimodal.wavHeader(bytes.take(11)).isEmpty)
    assert(Multimodal.wavHeader("plain text but long enough to pass the length gate"
      .getBytes("UTF-8")).isEmpty)
    assert(Multimodal.wavHeader(Array.empty[Byte]).isEmpty)
    assert(Multimodal.wavHeader(jpegBytes(8, 8)).isEmpty)
  }

  test("decodeAudio dispatches: real WAVs to the header parser, the rest to the stub") {
    import spark.implicits._
    val wav = wavBytes(22050, 2, 16, 333)
    val text = "not audio".getBytes("UTF-8")
    val got = Multimodal.decodeAudio(Seq(
      MediaBlob(1L, wav), MediaBlob(2L, text)).toDS()).collect().sortBy(_.doc_id)
    assert(got(0) == AudioMeta(1L, wav.length, 22050, 2, 16, 333L))
    assert(got(1) == Multimodal.audioStub(MediaBlob(2L, text)))
  }

  test("dHash sets exactly the strictly-brighter-right-neighbor bits, row-major") {
    // 3×2 gray raster, rows (10, 20, 20) and (90, 50, 200):
    // comparisons (20>10)=1, (20>20)=0, (50<90)=0, (200>50)=1 → bits 0,3
    val img = graft.operators.Png.Image(3, 2, 1,
      Array[Byte](10, 20, 20, 90.toByte, 50, 200.toByte))
    assert(Multimodal.dHash(img) == ((1L << 0) | (1L << 3)))
    // the cap truncates the bit stream, never wraps into high bits
    assert(Multimodal.dHash(img, maxBits = 1) == 1L)
    assert(Multimodal.dHash(img, maxBits = 3) == 1L)
    // a raster with more comparisons than maxBits only fills maxBits
    val wide = graft.operators.Png.Image(62, 2, 1,
      Array.tabulate[Byte](124)(i => (i % 250).toByte))
    val h = Multimodal.dHash(wide)
    assert(h >= 0L && h < (1L << 60))
  }

  test("dHash survives the PNG codec round-trip (decode∘encode is identity on the hash)") {
    (0L until 40L).foreach { id =>
      val w = (4 + id % 13).toInt
      val h = (3 + id % 11).toInt
      val px = Array.tabulate(w * h)(i => ((id * 31 + i.toLong * 7) % 256).toByte)
      val img = graft.operators.Png.Image(w, h, 1, px)
      val rt = graft.operators.Png.decode(graft.operators.Png.encode(w, h, 1, px)).get
      assert(Multimodal.dHash(rt) == Multimodal.dHash(img), s"doc $id")
    }
  }

  test("q153's banded Hamming join equals brute force over q152's hashes (pigeonhole recall)") {
    val dir = "/root/testdata/sf0.001"
    val hashes = Multimodal.q152ImageDhash.run(spark, dir)
      .select("doc_id", "width", "height", "dhash").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val brute = (for {
      (a, wa, ha, xa) <- hashes
      (b, wb, hb, xb) <- hashes
      if a < b && wa == wb && ha == hb &&
        java.lang.Long.bitCount(xa ^ xb) <= 3
    } yield (a, b, java.lang.Long.bitCount(xa ^ xb))).sorted.toSeq
    val banded = Multimodal.q153ImageNeardup.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(banded == brute)
    assert(brute.nonEmpty, "fixture must exercise the near-dup path")
  }

  test("wavBytes∘wavPcm16 round-trips every sample, including the extremes") {
    val samples = Array[Short](0, 1, -1, Short.MaxValue, Short.MinValue, 12345, -32000)
    assert(Multimodal.wavPcm16(Multimodal.wavBytes(samples, 16000))
      .map(_.toSeq) == Some(samples.toSeq))
    // empty signal: header-only WAV with a present-but-empty data chunk
    assert(Multimodal.wavPcm16(Multimodal.wavBytes(Array.empty[Short], 8000))
      .map(_.toSeq) == Some(Seq.empty[Short]))
  }

  test("wavPcm16 agrees with the JDK's RIFF reader on our bytes, and reads JDK-written bytes") {
    val samples = Array.tabulate[Short](300)(i => ((i * 7919) % 65536 - 32768).toShort)
    val ours = Multimodal.wavBytes(samples, 16000)
    // the JDK parses our render to the same PCM stream
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(ours))
    assert(in.getFormat.getChannels == 1 && in.getFormat.getSampleSizeInBits == 16)
    val raw = in.readAllBytes()
    val jdk = Array.tabulate(raw.length / 2)(k =>
      ((raw(2 * k) & 0xff) | (raw(2 * k + 1) << 8)).toShort)
    assert(jdk.toSeq == samples.toSeq)
    // and we parse the JDK's render of the same signal back to it
    val pcmLe = Array.tabulate[Byte](samples.length * 2)(i =>
      if (i % 2 == 0) (samples(i / 2) & 0xff).toByte else (samples(i / 2) >> 8).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcmLe), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    assert(Multimodal.wavPcm16(out.toByteArray).map(_.toSeq) == Some(samples.toSeq))
  }

  test("mulawEncode matches the JDK ULAW codec byte-for-byte; companding is a quantization fixpoint") {
    // dense pseudo-random sweep + every boundary the segment thresholds
    // care about — capped at ±CLIP (32635): the JDK codec omits the
    // CCITT CLIP step and WRAPS beyond it (32767 → 0xFF, the encoding
    // of silence; -32768 → 0x7F), so above-clip inputs are exactly
    // where the reference algorithm and the JDK disagree and our
    // encoder follows the standard (clip asserted separately below)
    val samples = Array.tabulate[Short](4096)(i =>
      (((i * 9973 + 17) % 65536) - 32768).toShort)
      .filter(s => math.abs(s.toInt) <= 32635) ++
      Array[Short](0, 1, -1, 131, 132, 133, 255, 256, 32635, -32635)
    val pcmLe = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcmLe(2 * i) = (s & 0xff).toByte
      pcmLe(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val srcFmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ulaw = javax.sound.sampled.AudioSystem.getAudioInputStream(
      javax.sound.sampled.AudioFormat.Encoding.ULAW,
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcmLe), srcFmt, samples.length.toLong))
    val jdk = ulaw.readAllBytes()
    assert(jdk.toSeq == samples.map(Multimodal.mulawEncode).toSeq,
      "engine companding disagrees with the JDK ULAW codec")
    // decode∘encode is idempotent on the quantized lattice: every byte
    // re-encodes to itself — except 0x7F (negative zero), which the
    // standard collapses onto 0xFF
    for (b <- 0 until 256 if b != 0x7f) {
      assert(Multimodal.mulawEncode(Multimodal.mulawDecode(b.toByte)) == b.toByte,
        s"byte $b is not a companding fixpoint")
    }
    assert(Multimodal.mulawDecode(0x7f.toByte) == 0)
    assert(Multimodal.mulawDecode(0xff.toByte) == 0)
    // the CCITT CLIP the JDK lacks: everything above ±32635 companding
    // to the top segment code, not wrapping to silence
    assert(Multimodal.mulawEncode(32767) == Multimodal.mulawEncode(32635))
    assert(Multimodal.mulawEncode(-32768) == Multimodal.mulawEncode(-32635))
  }

  test("wavBytesMulaw∘wavMulaw round-trips; format tags gate both parsers") {
    val pcm = Array.tabulate[Short](300)(i => ((i * 1103) % 65536 - 32768).toShort)
    val companded = pcm.map(Multimodal.mulawEncode)
    val g711 = Multimodal.wavBytesMulaw(companded, 8000)
    assert(Multimodal.wavMulaw(g711).map(_.toSeq) == Some(companded.toSeq))
    // header metadata reads through the SHARED walk: tag 7, mono, 8-bit
    assert(Multimodal.wavHeader(g711) == Some((8000, 1, 8, companded.length.toLong)))
    // cross-format: a µ-law file is not PCM16 and vice versa
    assert(Multimodal.wavPcm16(g711).isEmpty)
    assert(Multimodal.wavMulaw(Multimodal.wavBytes(pcm, 8000)).isEmpty)
    // truncation yields the present bytes, like the PCM path
    assert(Multimodal.wavMulaw(g711.take(44 + 10)).map(_.length) == Some(10))
  }

  test("aviBytes∘aviFrames round-trips frame payloads byte-for-byte, odd sizes included") {
    // odd-length payloads force the RIFF pad byte path
    val frames = Seq(
      Array[Byte](1, 2, 3),
      Array[Byte](4, 5, 6, 7),
      Array.tabulate[Byte](255)(i => (i * 3).toByte))
    val avi = Multimodal.aviBytes(frames, 8, 6)
    val Some((declared, got)) = Multimodal.aviFrames(avi)
    assert(declared == 3)
    assert(got.map(_.toSeq) == frames.map(_.toSeq))
    // an empty clip is still a well-formed container
    assert(Multimodal.aviFrames(Multimodal.aviBytes(Seq.empty, 4, 4)) ==
      Some((0, Seq.empty)))
  }

  test("aviFrames refuses non-AVI payloads and malformed chunk sizes") {
    assert(Multimodal.aviFrames("definitely not a RIFF container, but long enough"
      .getBytes("UTF-8")).isEmpty)
    // a RIFF envelope of the wrong type (WAVE) is not an AVI
    assert(Multimodal.aviFrames(
      Multimodal.wavBytes(Array[Short](1, 2, 3), 8000)).isEmpty)
    // a declared chunk size running past the envelope fails closed
    val avi = Multimodal.aviBytes(Seq(Array[Byte](1, 2, 3, 4)), 4, 4)
    val truncated = avi.take(avi.length - 3)
    assert(Multimodal.aviFrames(truncated).isEmpty)
    assert(Multimodal.aviFrames(Array.empty[Byte]).isEmpty)
  }

  test("aviVideoCodec reads the declared handler; decodeFrame dispatches on it") {
    // the writer round-trips its codec fourcc through the strh walk
    val png = graft.operators.Png.encode(4, 3, 1,
      Array.tabulate[Byte](12)(i => (i * 17).toByte))
    val mpng = Multimodal.aviBytes(Seq(png), 4, 3)
    assert(Multimodal.aviVideoCodec(mpng) == Some("MPNG"))
    val jpg = graft.operators.Jpeg.encodeGray(1, 1, Array(200))
    val mjpg = Multimodal.aviBytes(Seq(jpg), 8, 8, codec = "MJPG")
    assert(Multimodal.aviVideoCodec(mjpg) == Some("MJPG"))
    // dispatch: each fourcc reaches its own codec and decodes exactly
    val viaMpng = Multimodal.decodeFrame("MPNG", png).get
    assert(viaMpng.pixels.toSeq == Array.tabulate[Byte](12)(i => (i * 17).toByte).toSeq)
    val viaMjpg = Multimodal.decodeFrame("MJPG", jpg).get
    assert(viaMjpg.pixels.forall(b => (b & 0xff) == 200))
    // a CROSSED dispatch fails closed (a JPEG payload is not a PNG
    // stream and vice versa) — the reason dispatch-by-declared-handler
    // must come from the container, not a guess
    assert(Multimodal.decodeFrame("MPNG", jpg).isEmpty)
    assert(Multimodal.decodeFrame("MJPG", png).isEmpty)
    // unknown fourccs fail closed; a WAVE container has no vids strh
    assert(Multimodal.decodeFrame("H264", jpg).isEmpty)
    assert(Multimodal.aviVideoCodec(
      Multimodal.wavBytes(Array[Short](1, 2), 8000)).isEmpty)
  }

  test("MPNG frames inside the container decode to the exact rendered rasters") {
    val w = 5
    val h = 4
    val rendered = (0 until 6).map { f =>
      graft.operators.Png.encode(w, h, 1,
        Array.tabulate(w * h)(i => ((f * 11 + i * 7) % 256).toByte))
    }
    val Some((n, frames)) = Multimodal.aviFrames(Multimodal.aviBytes(rendered, w, h))
    assert(n == 6 && frames.length == 6)
    frames.zipWithIndex.foreach { case (bytes, f) =>
      val img = graft.operators.Png.decode(bytes).get
      assert(img.width == w && img.height == h)
      assert(img.pixels.toSeq ==
        Array.tabulate(w * h)(i => ((f * 11 + i * 7) % 256).toByte).toSeq, s"frame $f")
    }
  }

  test("wavPcm16 refuses non-mono-16-bit payloads and yields present samples on truncation") {
    // stereo is not this codec's shape
    assert(Multimodal.wavPcm16(wavBytes(44100, 2, 16, 100)).isEmpty)
    // 8-bit is not either
    assert(Multimodal.wavPcm16(wavBytes(8000, 1, 8, 100)).isEmpty)
    // non-audio payloads refuse cleanly
    assert(Multimodal.wavPcm16("not a wav at all, but comfortably past 44 bytes long"
      .getBytes("UTF-8")).isEmpty)
    // a truncated data chunk yields exactly the samples present
    val samples = Array.tabulate[Short](100)(i => (i * 11).toShort)
    val whole = Multimodal.wavBytes(samples, 16000)
    val cut = whole.take(whole.length - 40) // drop the last 20 samples
    assert(Multimodal.wavPcm16(cut).map(_.toSeq) == Some(samples.take(80).toSeq))
  }

  test("interleaved A/V AVI demuxes both streams exactly") {
    val frames = (0 until 3).map { f =>
      graft.operators.Png.encode(8, 8, 1,
        Array.tabulate(64)(i => ((f * 19 + i * 3) % 256).toByte))
    }
    val pcm = Array.tabulate(1000)(i => ((i * 37) % 60000 - 30000).toShort)
    val mulaw = pcm.map(Multimodal.mulawEncode)
    val avi = Multimodal.aviAvBytes(frames, 8, 8, mulaw, 8000, 320)
    // video side: same walk as a video-only AVI
    val Some((n, got)) = Multimodal.aviFrames(avi)
    assert(n == 3 && got.map(_.toSeq) == frames.map(_.toSeq))
    assert(Multimodal.aviVideoCodec(avi) == Some("MPNG"))
    // audio side: declared format + every chunk back in order
    val Some((tag, rate, data)) = Multimodal.aviAudio(avi)
    assert(tag == 7 && rate == 8000)
    assert(data.toSeq == mulaw.toSeq,
      "audio bytes must survive chunk split + tail remainder")
    // a video-only AVI has no audio; a WAV is not an AVI
    assert(Multimodal.aviAudio(Multimodal.aviBytes(frames, 8, 8)).isEmpty)
    assert(Multimodal.aviAudio(
      Multimodal.wavBytes(Array[Short](1, 2), 8000)).isEmpty)
    // truncation fails closed
    assert(Multimodal.aviAudio(avi.take(avi.length - 5)).isEmpty)
  }

  test("EXIF GPS round-trips through the APP1 writer and the IFD walk") {
    val jpeg = graft.operators.Jpeg.encodeGray(2, 1, Array(10, 250))
    val tagged = Multimodal.withApp1(jpeg,
      Multimodal.exifApp1Gps('N', (51, 30, 26), 'W', (0, 7, 39)))
    assert(Multimodal.exifGps(jpeg).isEmpty, "untagged JPEG has no GPS")
    assert(Multimodal.exifGps(tagged) ==
      Some(Multimodal.GpsInfo("N", 51, 30, 26, "W", 0, 7, 39)))
    // the strip removes exactly the 138-byte segment and nothing else
    val stripped = Multimodal.stripExif(tagged)
    assert(tagged.length - stripped.length == 138)
    assert(Multimodal.exifGps(stripped).isEmpty, "GPS must be gone")
    assert(stripped.toSeq == jpeg.toSeq,
      "strip must restore the pre-tag byte stream exactly")
  }

  test("EXIF-tagged JPEG decodes identically for our codec and ImageIO") {
    val jpeg = graft.operators.Jpeg.encodeGray(3, 2, Array(0, 64, 128, 192, 255, 33))
    val tagged = Multimodal.withApp1(jpeg,
      Multimodal.exifApp1Gps('S', (12, 0, 59), 'E', (179, 59, 0)))
    // metadata must not perturb pixel decode — ours or the JDK's
    val ours = graft.operators.Jpeg.decode(tagged).get
    assert(ours.pixels.toSeq == graft.operators.Jpeg.decode(jpeg).get.pixels.toSeq)
    val viaImageIo = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(tagged))
    assert(viaImageIo != null, "ImageIO must accept the APP1-tagged stream")
    assert(viaImageIo.getWidth == 24 && viaImageIo.getHeight == 16)
    val raster = viaImageIo.getRaster
    val fromJdk = for (y <- 0 until 16; x <- 0 until 24)
      yield raster.getSample(x, y, 0)
    assert(fromJdk == ours.pixels.toSeq.map(_ & 0xff),
      "JDK and our decoder must agree on the tagged stream")
  }

  test("EXIF parser handles big-endian TIFF and fails closed on malformed input") {
    // hand-build the MM (big-endian) twin of the writer's II layout
    val tiff = java.nio.ByteBuffer.allocate(128)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    tiff.put('M'.toByte).put('M'.toByte).putShort(42)
    tiff.putInt(8)
    tiff.putShort(1)
    tiff.putShort(0x8825.toShort).putShort(4).putInt(1).putInt(26)
    tiff.putInt(0)
    tiff.putShort(4)
    tiff.putShort(1).putShort(2).putInt(2)
      .put('N'.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    tiff.putShort(2).putShort(5).putInt(3).putInt(80)
    tiff.putShort(3).putShort(2).putInt(2)
      .put('E'.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    tiff.putShort(4).putShort(5).putInt(3).putInt(104)
    tiff.putInt(0)
    // rationals with den=2 to exercise the floor-div reduction
    Seq(90, 20, 30, 100, 40, 50).foreach { v => tiff.putInt(v); tiff.putInt(2) }
    val payload = "Exif\u0000\u0000".getBytes("US-ASCII") ++ tiff.array()
    val len = payload.length + 2
    val app1 = Array(0xff.toByte, 0xe1.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ payload
    val jpeg = graft.operators.Jpeg.encodeGray(1, 1, Array(77))
    val tagged = Multimodal.withApp1(jpeg, app1)
    assert(Multimodal.exifGps(tagged) ==
      Some(Multimodal.GpsInfo("N", 45, 10, 15, "E", 50, 20, 25)))
    // malformed inputs fail closed, never throw
    assert(Multimodal.exifGps(Array.empty[Byte]).isEmpty)
    assert(Multimodal.exifGps("not a jpeg at all, but long enough to walk"
      .getBytes("UTF-8")).isEmpty)
    val truncated = tagged.take(30) // APP1 length now runs past the buffer
    assert(Multimodal.exifGps(truncated).isEmpty)
    // zero-denominator rational fails closed (offset 80 holds lat num/den)
    val zeroDen = tagged.clone()
    // den of the first latitude rational: TIFF base (2+2+4+6=offset 14 in
    // segment) — locate it as tagged SOI(2) + marker/len(4) + "Exif\0\0"(6)
    // + 80 (data area) + 4 (num) = byte offset 2+4+6+80+4
    for (k <- 0 until 4) zeroDen(2 + 4 + 6 + 80 + 4 + k) = 0
    assert(Multimodal.exifGps(zeroDen).isEmpty)
  }

  test("q207 scene cuts are a subset of true scene boundaries, with high recall") {
    // within a scene frames are pixel-identical → Hamming 0 < τ, so a
    // FALSE POSITIVE is impossible by construction and any reported cut
    // must be a true boundary (f % L == 0); a true boundary may go
    // undetected when two scenes' gradients happen to hash within τ —
    // that miss rate is a property of dHash, measured here, not hidden
    val rows = Multimodal.q207SceneCuts.run(spark, "/root/testdata/sf0.001")
      .select("doc_id", "n_frames", "n_cuts", "cut_frames")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    var trueB = 0L
    var caught = 0L
    rows.foreach { case (id, n, nCuts, cutStr) =>
      assert(n === (6 + id % 7).toInt)
      val l = (2 + id % 3).toInt
      val truth = (1 until n).filter(_ % l == 0).toSet
      val cuts = if (cutStr.isEmpty) Set.empty[Int]
        else cutStr.split(",").map(_.toInt).toSet
      assert(cuts.size === nCuts)
      assert(cuts.subsetOf(truth), s"doc $id: false cut in $cuts, truth $truth")
      trueB += truth.size; caught += cuts.size
    }
    assert(trueB > 0 && caught * 10 >= trueB * 8,
      s"recall ${caught}/$trueB below 80% — dHash separation degraded")
  }

  test("q208 VAD recovers the seeded speech/silence windows exactly") {
    // the 4096-vs-64 amplitude margin swamps µ-law quantization error, so
    // here (unlike q207's hash-proximity misses) the detector must equal
    // ground truth frame-for-frame — a single disagreement means the
    // energy fold or the companding round-trip is off
    val rows = Multimodal.q208AudioVad.run(spark, "/root/testdata/sf0.001")
      .select("doc_id", "n_frames", "n_voiced", "n_segments", "voiced_mask")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nf, nv, nseg, mask) =>
      val n = (200 + id % 300).toInt
      val truth = (0 until (n + 63) / 64).map(b => (id + b) % 3 != 0)
      assert(nf === truth.size && mask.length === nf)
      assert(mask === truth.map(v => if (v) "1" else "0").mkString,
        s"doc $id VAD mask diverged from construction")
      assert(nv === truth.count(identity))
      val expSeg = truth.indices.count(f => truth(f) && (f == 0 || !truth(f - 1)))
      assert(nseg === expSeg)
    }
    // both classes and a multi-segment doc must actually occur
    assert(rows.exists(_._5.contains("0")) && rows.exists(_._5.contains("1")))
    assert(rows.exists(_._4 > 1))
  }

  test("q220 upsample keeps originals at even indices; decimation inverts it") {
    // the linear-interpolation contract, checked sample-for-sample on a
    // hand signal incl. negative midpoints (the div-vs-floor trap zone)
    val in = Array[Short](-32768, -3, 0, 5, 32767, -1000)
    val out = new Array[Short](2 * in.length - 1)
    for (i <- in.indices) {
      out(2 * i) = in(i)
      if (i + 1 < in.length)
        out(2 * i + 1) = (((in(i) + 32768) + (in(i + 1) + 32768)) / 2 - 32768).toShort
    }
    assert(out.zipWithIndex.collect { case (v, j) if j % 2 == 0 => v }.toSeq == in.toSeq)
    assert(out(1) === ((-32768 + -3) / 2 - 1).toShort || out(1) === -16386) // floor midpoint
    assert(out(7) === ((5 + 32767) / 2).toShort)
    // and the gate's stats agree with a direct driver recompute
    val got = Multimodal.q220AudioResample.run(spark, "/root/testdata/sf0.001")
      .select("doc_id", "n_in", "n_out", "sum_abs")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    got.foreach { case (id, nIn, nOut, sumAbs) =>
      val n = (100 + id % 200).toInt
      assert(nIn === n && nOut === 2 * n - 1)
      val s = Array.tabulate(n)(i => ((id * 17 + i.toLong * 12289) % 65536) - 32768)
      val mids = (0 until n - 1).map(i => ((s(i) + 32768) + (s(i + 1) + 32768)) / 2 - 32768)
      assert(sumAbs === s.map(math.abs).sum + mids.map(math.abs(_)).sum)
    }
  }

  test("wht8 is orthogonal: Parseval, impulse response, involution (q237)") {
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val v = Array.fill(8)(rnd.nextInt(65536) - 32768)
      val c = Multimodal.wht8(v)
      // Parseval: Σ coef² = 8 · Σ v²  (orthogonal rows of norm √8)
      assert(c.map(x => x.toLong * x).sum === 8L * v.map(x => x.toLong * x).sum)
      // involution: H(H(v)) = 8 · v
      assert(Multimodal.wht8(c).toSeq === v.map(_ * 8).toSeq)
    }
    // impulse at j: coef(k) = (−1)^popcount(k & j)
    (0 until 8).foreach { j =>
      val v = Array.fill(8)(0); v(j) = 1
      val c = Multimodal.wht8(v)
      (0 until 8).foreach { k =>
        val want = if (java.lang.Integer.bitCount(k & j) % 2 == 0) 1 else -1
        assert(c(k) === want, s"impulse j=$j coef k=$k")
      }
    }
    // constant signal: all AC signs are 0 ⇒ the 7-bit code is 0 —
    // level-invariance of the fingerprint
    val flat = Multimodal.wht8(Array.fill(8)(1234))
    assert(flat(0) === 8 * 1234 && flat.drop(1).forall(_ === 0))
  }
}
