package graft

import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Png

/** The PNG codec against the JDK's `javax.imageio` as the INDEPENDENT
  * implementation, in both directions:
  *
  *  - ImageIO-ENCODED bytes (its own filter choices, its own deflate)
  *    must decode to the exact raster [[Png.decode]] — pins the
  *    inflate + unfilter + palette paths against a foreign encoder;
  *  - [[Png.encode]]'s output (adaptive per-row filters) must be
  *    readable by ImageIO to the exact same pixels — pins our filtered
  *    output as spec-compliant, not merely self-consistent;
  *  - every filter type 0–4 is decoded against a hand-built reference
  *    scanline, so no filter path hides behind the encoders' choices;
  *  - malformed input (bad CRC, truncation, unsupported shape) fails
  *    closed to None.
  */
class PngSpec extends AnyFunSuite {

  /** Deterministic test raster with enough structure that adaptive
    * filtering picks different types on different rows.
    */
  private def raster(w: Int, h: Int, ch: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h * ch) { i =>
      val x = (i / ch) % w; val y = (i / ch) / w; val c = i % ch
      (seed * 17 + x * x + 3 * y + 31 * c + (x * y % 7)).toByte
    }

  private def toBuffered(w: Int, h: Int, ch: Int, px: Array[Byte]): BufferedImage = {
    val img = new BufferedImage(w, h,
      if (ch == 4) BufferedImage.TYPE_INT_ARGB else BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * ch
      def u(i: Int) = px(o + i) & 0xff
      val argb = ch match {
        case 1 => 0xff000000 | (u(0) << 16) | (u(0) << 8) | u(0)
        case 3 => 0xff000000 | (u(0) << 16) | (u(1) << 8) | u(2)
        case 4 => (u(3) << 24) | (u(0) << 16) | (u(1) << 8) | u(2)
      }
      img.setRGB(x, y, argb)
    }
    img
  }

  private def imageioPng(img: BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    out.toByteArray
  }

  test("decode reads ImageIO-encoded RGB pixels exactly") {
    val (w, h) = (37, 23)
    val px = raster(w, h, 3, seed = 5)
    val decoded = Png.decode(imageioPng(toBuffered(w, h, 3, px)))
      .getOrElse(fail("ImageIO PNG did not decode"))
    assert(decoded.width === w && decoded.height === h)
    assert(decoded.channels === 3)
    assert(decoded.pixels.toSeq === px.toSeq)
  }

  test("decode reads ImageIO-encoded RGBA pixels exactly") {
    val (w, h) = (19, 31)
    // alpha 255 everywhere: ImageIO premultiplies nothing then, so the
    // raster survives the BufferedImage round-trip byte-exact
    val px = raster(w, h, 4, seed = 9).zipWithIndex.map {
      case (_, i) if i % 4 == 3 => 0xff.toByte
      case (v, _) => v
    }
    val decoded = Png.decode(imageioPng(toBuffered(w, h, 4, px)))
      .getOrElse(fail("ImageIO RGBA PNG did not decode"))
    assert(decoded.width === w && decoded.height === h)
    assert(decoded.channels === 4)
    assert(decoded.pixels.toSeq === px.toSeq)
  }

  test("decode reads ImageIO-encoded grayscale pixels exactly") {
    val (w, h) = (29, 17)
    val px = raster(w, h, 1, seed = 3)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, px)
    val decoded = Png.decode(imageioPng(img))
      .getOrElse(fail("ImageIO gray PNG did not decode"))
    assert(decoded.width === w && decoded.height === h)
    assert(decoded.channels === 1)
    assert(decoded.pixels.toSeq === px.toSeq)
  }

  test("decode expands ImageIO-encoded palette (indexed) PNGs to RGB") {
    val (w, h) = (16, 11)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 40) << 16) | ((y * 20) << 8) | 0x33)
    val bytes = imageioPng(img)
    val decoded = Png.decode(bytes).getOrElse(fail("palette PNG did not decode"))
    assert(decoded.width === w && decoded.height === h)
    assert(decoded.channels === 3)
    // the indexed write quantizes colors, so compare against what the
    // INDEPENDENT decoder says the palette resolves to
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      assert((decoded.pixels(o) & 0xff) === ((rgb >> 16) & 0xff), s"R at ($x,$y)")
      assert((decoded.pixels(o + 1) & 0xff) === ((rgb >> 8) & 0xff), s"G at ($x,$y)")
      assert((decoded.pixels(o + 2) & 0xff) === (rgb & 0xff), s"B at ($x,$y)")
    }
  }

  test("ImageIO reads encode()'s adaptive-filtered output to the same pixels") {
    for ((w, h, ch, seed) <- Seq((40, 25, 3, 1), (7, 9, 1, 2), (13, 8, 4, 7))) {
      val px = raster(w, h, ch, seed)
      val bytes = Png.encode(w, h, ch, px)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(ref != null, s"ImageIO rejected encode($w,$h,$ch)")
      assert(ref.getWidth === w && ref.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * ch
        val rgb = ref.getRGB(x, y)
        ch match {
          // gray: getRGB() would pass through CS_GRAY→sRGB color
          // management (nonlinear) — read the raw raster sample instead
          case 1 => assert(ref.getRaster.getSample(x, y, 0) === (px(o) & 0xff),
            s"($x,$y) ch=1")
          case 3 =>
            assert(((rgb >> 16) & 0xff) === (px(o) & 0xff), s"R ($x,$y)")
            assert(((rgb >> 8) & 0xff) === (px(o + 1) & 0xff), s"G ($x,$y)")
            assert((rgb & 0xff) === (px(o + 2) & 0xff), s"B ($x,$y)")
          case 4 =>
            assert(((rgb >> 24) & 0xff) === (px(o + 3) & 0xff), s"A ($x,$y)")
            assert(((rgb >> 16) & 0xff) === (px(o) & 0xff), s"R ($x,$y)")
        }
      }
    }
  }

  test("encode/decode round-trips every channel count byte-exactly") {
    for (ch <- Seq(1, 2, 3, 4); (w, h) <- Seq((1, 1), (2, 3), (23, 19), (64, 1))) {
      val px = raster(w, h, ch, seed = ch * 10 + w)
      val back = Png.decode(Png.encode(w, h, ch, px))
        .getOrElse(fail(s"round-trip failed for ch=$ch ${w}x$h"))
      assert(back.width === w && back.height === h && back.channels === ch)
      assert(back.pixels.toSeq === px.toSeq, s"ch=$ch ${w}x$h")
    }
  }

  test("every filter type 0-4 unfilters against a hand-built reference") {
    // two scanlines of RGB, second line filtered with each type in turn;
    // the expected raster is computed by an independent straightforward
    // re-implementation of §9.2 right here
    val w = 5; val ch = 3; val stride = w * ch
    val line0 = Array.tabulate(stride)(i => (i * 11 + 3).toByte)
    val line1 = Array.tabulate(stride)(i => (250 - i * 7).toByte)
    def paethRef(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    for (ft <- 0 to 4) {
      // build the FILTERED representation of line1 under type ft
      val filtered = Array.tabulate(stride) { x =>
        val cur = line1(x) & 0xff
        val a = if (x >= ch) line1(x - ch) & 0xff else 0
        val b = line0(x) & 0xff
        val c = if (x >= ch) line0(x - ch) & 0xff else 0
        val r = ft match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - (a + b) / 2
          case 4 => cur - paethRef(a, b, c)
        }
        (r & 0xff).toByte
      }
      // raw scanline stream: line0 unfiltered (type 0), line1 type ft
      val raw = (0.toByte +: line0) ++ (ft.toByte +: filtered)
      val deflated = {
        val d = new java.util.zip.Deflater()
        d.setInput(raw); d.finish()
        val buf = new Array[Byte](4096)
        val out = new java.io.ByteArrayOutputStream()
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        d.end(); out.toByteArray
      }
      // wrap in a minimal PNG container (signature + IHDR + IDAT + IEND)
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      def chunk(typ: String, body: Array[Byte]): Unit = {
        def be32(v: Long) = Array((v >>> 24).toByte, (v >>> 16).toByte,
          (v >>> 8).toByte, v.toByte)
        out.write(be32(body.length.toLong)); out.write(typ.getBytes("US-ASCII"))
        out.write(body)
        val crc = new java.util.zip.CRC32()
        crc.update(typ.getBytes("US-ASCII")); crc.update(body)
        out.write(be32(crc.getValue))
      }
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(2).put(8.toByte).put(2.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte)
      chunk("IHDR", ihdr.array()); chunk("IDAT", deflated)
      chunk("IEND", Array.emptyByteArray)
      val img = Png.decode(out.toByteArray)
        .getOrElse(fail(s"filter-type-$ft fixture did not decode"))
      assert(img.pixels.toSeq === (line0 ++ line1).toSeq, s"filter $ft")
    }
  }

  test("malformed input fails closed") {
    val good = Png.encode(9, 7, 3, raster(9, 7, 3, seed = 4))
    assert(Png.decode(good).isDefined)
    // flip one IDAT payload byte: CRC must catch it
    val corrupt = good.clone()
    corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x5a).toByte
    assert(Png.decode(corrupt).isEmpty, "bad CRC must not decode")
    // truncation mid-chunk
    assert(Png.decode(good.dropRight(15)).isEmpty, "truncated stream must not decode")
    // not a PNG at all
    assert(Png.decode("plain text, definitely not a PNG".getBytes("UTF-8")).isEmpty)
    // 16-bit depth is out of scope: must be None, never wrong pixels
    val deep = good.clone()
    deep(24) = 16.toByte // IHDR bit-depth byte
    assert(Png.decode(deep).isEmpty, "unsupported depth must fail closed (CRC breaks anyway)")
  }

  test("boxDownsample averages factor-size blocks per channel") {
    // 4x2 RGB, factor 2 → 2x1; expected means computed by hand
    val px = Array[Int](
      10, 100, 200, 20, 110, 210, 30, 120, 220, 40, 130, 230,
      50, 140, 240, 60, 150, 250, 70, 160, 230, 80, 170, 240
    ).map(_.toByte)
    val out = Png.boxDownsample(Png.Image(4, 2, 3, px), 2)
    assert(out.width === 2 && out.height === 1 && out.channels === 3)
    val exp = Seq((10 + 20 + 50 + 60) / 4, (100 + 110 + 140 + 150) / 4,
      (200 + 210 + 240 + 250) / 4,
      (30 + 40 + 70 + 80) / 4, (120 + 130 + 160 + 170) / 4,
      (220 + 230 + 230 + 240) / 4)
    assert(out.pixels.map(_ & 0xff).toSeq === exp)
  }

  test("boxDownsample drops trailing rows/cols that do not fill a block") {
    val img = Png.Image(5, 3, 1, Array.tabulate(15)(i => i.toByte))
    val out = Png.boxDownsample(img, 2)
    assert(out.width === 2 && out.height === 1)
    assert(out.pixels.map(_ & 0xff).toSeq === Seq((0 + 1 + 5 + 6) / 4, (2 + 3 + 7 + 8) / 4))
  }
}
