package graft

import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Jpeg

/** The baseline JPEG decoder against `javax.imageio` as the
  * INDEPENDENT implementation:
  *
  *  - ImageIO-WRITTEN grayscale JPEGs (its own FDCT, standard quant +
  *    Huffman tables, full AC coefficient machinery) must decode to
  *    the same raster within ±2 per pixel — the only legitimate
  *    divergence between two conformant decoders is IDCT rounding
  *    (T.81 Annex A leaves the IDCT implementation-defined; libjpeg's
  *    fixed-point vs our double-precision reference);
  *  - ImageIO-WRITTEN color JPEGs (YCbCr, subsampled chroma) decode
  *    through the upsample + color-convert path; flat-color frames
  *    make every upsampling filter agree, isolating the same ±2
  *    IDCT/rounding tolerance;
  *  - [[Jpeg.encodeGray]]'s flat-block output is BIT-EXACT through
  *    [[Jpeg.decode]] (unit quant table + DC-only blocks — see the
  *    codec doc) and must also be readable by ImageIO to the exact
  *    same pixels, pinning the encoder as spec-compliant rather than
  *    merely self-consistent — including the DRI/RSTn restart path;
  *  - malformed input (progressive SOF, truncation, garbage) fails
  *    closed to None.
  */
class JpegSpec extends AnyFunSuite {

  private def grayImage(w: Int, h: Int, px: Array[Byte]): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, px)
    img
  }

  private def imageioJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    w.setOutput(ios)
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    w.dispose()
    ios.close()
    out.toByteArray
  }

  private def imageioRead(bytes: Array[Byte]): BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  test("decode reads ImageIO-written grayscale JPEG within IDCT tolerance") {
    for (quality <- Seq(1.0f, 0.85f, 0.5f); (w, h) <- Seq((24, 16), (37, 23))) {
      // structured but smooth-ish raster: exercises nonzero AC
      // coefficients at every quality without pathological ringing
      val px = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        (60 + 5 * x + 3 * y + ((x * y) % 17)).toByte
      }
      val bytes = imageioJpeg(grayImage(w, h, px), quality)
      val mine = Jpeg.decode(bytes)
        .getOrElse(fail(s"ImageIO gray JPEG (q=$quality ${w}x$h) did not decode"))
      assert(mine.width === w && mine.height === h && mine.channels === 1)
      // compare decoder-vs-decoder on the SAME file: the only allowed
      // difference is IDCT arithmetic
      val ref = imageioRead(bytes)
      val refPx = new Array[Byte](w * h)
      ref.getRaster.getDataElements(0, 0, w, h, refPx)
      var maxDiff = 0
      for (i <- 0 until w * h)
        maxDiff = math.max(maxDiff, math.abs((mine.pixels(i) & 0xff) - (refPx(i) & 0xff)))
      assert(maxDiff <= 2, s"gray q=$quality ${w}x$h: max per-pixel diff $maxDiff")
    }
  }

  private def colorMaxDiff(mine: graft.operators.Png.Image, ref: BufferedImage,
      keep: (Int, Int) => Boolean): Int = {
    var maxDiff = 0
    for (y <- 0 until mine.height; x <- 0 until mine.width if keep(x, y)) {
      val rgb = ref.getRGB(x, y)
      val o = (y * mine.width + x) * 3
      maxDiff = math.max(maxDiff, math.abs((mine.pixels(o) & 0xff) - ((rgb >> 16) & 0xff)))
      maxDiff = math.max(maxDiff, math.abs((mine.pixels(o + 1) & 0xff) - ((rgb >> 8) & 0xff)))
      maxDiff = math.max(maxDiff, math.abs((mine.pixels(o + 2) & 0xff) - (rgb & 0xff)))
    }
    maxDiff
  }

  test("decode reads ImageIO-written color JPEG (subsampled chroma) within tolerance") {
    // whole-frame flat colors: chroma is constant, so EVERY conformant
    // upsampling filter agrees and the comparison isolates IDCT/color
    // rounding across the full YCbCr + subsample + convert path
    for (color <- Seq(0x4080c0, 0xc04010, 0x10c040, 0xf0f0f0, 0x203040)) {
      val (w, h) = (40, 24) // not MCU-aligned: exercises the crop path
      val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, color)
      val bytes = imageioJpeg(img, 0.9f)
      val mine = Jpeg.decode(bytes)
        .getOrElse(fail(f"ImageIO color JPEG ($color%06x) did not decode"))
      assert(mine.width === w && mine.height === h && mine.channels === 3)
      val d = colorMaxDiff(mine, imageioRead(bytes), (_, _) => true)
      assert(d <= 2, f"flat color $color%06x: max per-channel diff $d")
    }
  }

  test("decode agrees with ImageIO on tile interiors (upsampling filters differ at edges)") {
    // 16x16 flat tiles are chroma-flat per 4:2:0 block, but libjpeg's
    // fancy (triangle) upsampling blends ACROSS tile boundaries while
    // we replicate — both conformant (T.81 leaves upsampling
    // implementation-defined). Compare only pixels >= 4 image pixels
    // (2 chroma samples) from a tile edge, where the filters coincide.
    val (w, h) = (48, 32)
    val colors = Array(0x4080c0, 0xc04010, 0x10c040, 0x806020, 0xf0f0f0, 0x203040)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, colors(((y / 16) * (w / 16) + x / 16) % colors.length))
    val bytes = imageioJpeg(img, 0.9f)
    val mine = Jpeg.decode(bytes).getOrElse(fail("ImageIO tiled color JPEG did not decode"))
    val interior = (x: Int, y: Int) => x % 16 >= 4 && x % 16 < 12 && y % 16 >= 4 && y % 16 < 12
    val d = colorMaxDiff(mine, imageioRead(bytes), interior)
    assert(d <= 2, s"tiled color interiors: max per-channel diff $d")
  }

  test("encodeGray round-trips bit-exact through decode, restarts included") {
    for ((wb, hb, ri) <- Seq((1, 1, 0), (3, 2, 0), (4, 3, 2), (2, 5, 1), (5, 1, 3))) {
      val vals = Array.tabulate(wb * hb)(b => (b * 47 + 13 * wb + ri) % 256)
      // force the extreme-category and category-0 (diff = 0) DC paths
      if (vals.length >= 3) {
        vals(0) = 0; vals(1) = 255; vals(2) = 255 // dc -1024 -> 1016 -> diff 0
      }
      val bytes = Jpeg.encodeGray(wb, hb, vals, ri)
      val img = Jpeg.decode(bytes)
        .getOrElse(fail(s"engine-encoded JPEG (${wb}x$hb ri=$ri) did not decode"))
      assert(img.width === wb * 8 && img.height === hb * 8 && img.channels === 1)
      for (by <- 0 until hb; bx <- 0 until wb; y <- 0 until 8; x <- 0 until 8) {
        val got = img.pixels((by * 8 + y) * (wb * 8) + bx * 8 + x) & 0xff
        assert(got === vals(by * wb + bx),
          s"block ($bx,$by) pixel ($x,$y) in ${wb}x$hb ri=$ri")
      }
    }
  }

  test("encodeGray output is spec-compliant: ImageIO reads the same pixels") {
    val (wb, hb) = (4, 3)
    val vals = Array.tabulate(wb * hb)(b => (b * 31 + 7) % 256)
    val bytes = Jpeg.encodeGray(wb, hb, vals, restartInterval = 5)
    val ref = imageioRead(bytes)
    assert(ref != null, "ImageIO could not read the engine-encoded JPEG")
    assert(ref.getWidth === wb * 8 && ref.getHeight === hb * 8)
    val refPx = new Array[Byte](wb * 8 * hb * 8)
    ref.getRaster.getDataElements(0, 0, wb * 8, hb * 8, refPx)
    for (by <- 0 until hb; bx <- 0 until wb; y <- 0 until 8; x <- 0 until 8) {
      val got = refPx((by * 8 + y) * (wb * 8) + bx * 8 + x) & 0xff
      assert(got === vals(by * wb + bx), s"ImageIO block ($bx,$by) pixel ($x,$y)")
    }
  }

  test("malformed input fails closed") {
    val good = Jpeg.encodeGray(2, 2, Array(10, 20, 30, 40))
    // SOF0 patched to SOF2: the stream CLAIMS progressive but carries a
    // baseline scan header (Ss=0, Se=63 — illegal for a DC scan §G.1),
    // so the progressive path must reject it, not misread it
    val prog = good.clone()
    val sof = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assert(Jpeg.decode(prog).isEmpty, "mislabeled progressive must decode to None")
    // SOF0 patched to SOF9 (arithmetic coding): unsupported mode
    val arith = good.clone()
    arith(sof + 1) = 0xc9.toByte
    assert(Jpeg.decode(arith).isEmpty, "arithmetic coding must decode to None")
    // truncation: cut the entropy stream mid-scan
    assert(Jpeg.decode(good.take(good.length - 12)).isEmpty, "truncated must be None")
    // truncation of a REAL progressive stream mid-scan
    val realProg = Jpeg.encodeGray(3, 2, Array(5, 80, 160, 240, 17, 99),
      progressive = true)
    assert(Jpeg.decode(realProg.take(realProg.length - 8)).isEmpty,
      "truncated progressive must be None")
    // not a JPEG at all
    assert(Jpeg.decode("not an image".getBytes("US-ASCII")).isEmpty)
    assert(Jpeg.decode(Array[Byte]()).isEmpty)
    // a PNG signature is not a JPEG
    assert(Jpeg.decode(graft.operators.Png.encode(4, 4, 1, new Array[Byte](16))).isEmpty)
  }

  private def imageioProgressiveJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    w.setOutput(ios)
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    w.dispose()
    ios.close()
    out.toByteArray
  }

  test("decode reads ImageIO-written PROGRESSIVE grayscale within IDCT tolerance") {
    // the JDK writer emits libjpeg's simple-progression scan script —
    // spectral selection AND successive approximation with real AC
    // refinement bits — the full §G machinery on an independent encoder
    for (quality <- Seq(1.0f, 0.85f, 0.5f); (w, h) <- Seq((24, 16), (37, 23))) {
      val px = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        (60 + 5 * x + 3 * y + ((x * y) % 17)).toByte
      }
      val bytes = imageioProgressiveJpeg(grayImage(w, h, px), quality)
      // sanity: it really is a progressive stream (SOF2 present)
      assert(bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
        "fixture must contain SOF2")
      val mine = Jpeg.decode(bytes)
        .getOrElse(fail(s"progressive gray JPEG (q=$quality ${w}x$h) did not decode"))
      assert(mine.width === w && mine.height === h && mine.channels === 1)
      val ref = imageioRead(bytes)
      val refPx = new Array[Byte](w * h)
      ref.getRaster.getDataElements(0, 0, w, h, refPx)
      var maxDiff = 0
      for (i <- 0 until w * h)
        maxDiff = math.max(maxDiff, math.abs((mine.pixels(i) & 0xff) - (refPx(i) & 0xff)))
      assert(maxDiff <= 2, s"progressive gray q=$quality ${w}x$h: max diff $maxDiff")
    }
  }

  test("decode reads ImageIO-written progressive color (subsampled) within tolerance") {
    for (color <- Seq(0x4080c0, 0xc04010, 0xf0f0f0, 0x203040)) {
      val (w, h) = (40, 24)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, color)
      val bytes = imageioProgressiveJpeg(img, 0.9f)
      val mine = Jpeg.decode(bytes)
        .getOrElse(fail(f"progressive color JPEG ($color%06x) did not decode"))
      assert(mine.width === w && mine.height === h && mine.channels === 3)
      val d = colorMaxDiff(mine, imageioRead(bytes), (_, _) => true)
      assert(d <= 2, f"progressive flat color $color%06x: max diff $d")
    }
  }

  test("progressive encodeGray is bit-exact and equals its baseline twin") {
    for ((wb, hb) <- Seq((1, 1), (3, 2), (4, 3), (2, 5), (7, 4))) {
      val vals = Array.tabulate(wb * hb)(b => (b * 47 + 13 * wb) % 256)
      if (vals.length >= 3) { vals(0) = 0; vals(1) = 255; vals(2) = 255 }
      val prog = Jpeg.encodeGray(wb, hb, vals, progressive = true)
      val img = Jpeg.decode(prog)
        .getOrElse(fail(s"engine progressive JPEG (${wb}x$hb) did not decode"))
      assert(img.width === wb * 8 && img.height === hb * 8 && img.channels === 1)
      for (by <- 0 until hb; bx <- 0 until wb; y <- 0 until 8; x <- 0 until 8) {
        val got = img.pixels((by * 8 + y) * (wb * 8) + bx * 8 + x) & 0xff
        assert(got === vals(by * wb + bx),
          s"progressive block ($bx,$by) pixel ($x,$y) in ${wb}x$hb")
      }
      // same pixels as the baseline twin of the same block values
      val base = Jpeg.decode(Jpeg.encodeGray(wb, hb, vals)).get
      assert(img.pixels.toSeq == base.pixels.toSeq)
      // and ImageIO agrees the stream is spec-compliant
      val ref = imageioRead(prog)
      assert(ref != null, "ImageIO could not read the engine progressive JPEG")
      val refPx = new Array[Byte](wb * 8 * hb * 8)
      ref.getRaster.getDataElements(0, 0, wb * 8, hb * 8, refPx)
      assert(refPx.toSeq == img.pixels.toSeq,
        s"ImageIO read different pixels from the progressive stream ${wb}x$hb")
    }
  }
}
