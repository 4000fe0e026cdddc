package graft

import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Gif

/** The GIF codec against `javax.imageio` as the INDEPENDENT
  * implementation. GIF is LOSSLESS over its palette, so unlike the
  * JPEG spec there is no tolerance anywhere — every comparison is
  * byte-exact:
  *
  *  - ImageIO-WRITTEN GIFs (its own LZW emitter, its own palette
  *    quantization) must decode to exactly the pixels ImageIO itself
  *    reads back — pins sub-block framing, variable code widths, and
  *    palette resolution against a foreign encoder;
  *  - [[Gif.encodeGray]]'s output — plain and INTERLACED — must be
  *    readable by ImageIO to the exact input raster, pinning our LZW
  *    compressor and 4-pass row order as spec-compliant;
  *  - round-trip through our own decoder is bit-exact for rasters that
  *    force dictionary growth across code widths and the 4096 reset;
  *  - malformed input fails closed.
  */
class GifSpec extends AnyFunSuite {

  private def imageioRead(bytes: Array[Byte]): BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  private def imageioGif(img: BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", out))
    out.toByteArray
  }

  test("decode reads ImageIO-written GIFs exactly") {
    val (w, h) = (37, 23)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 29 % 256) << 16) | ((y * 41 % 256) << 8) | ((x + y) % 256))
    val bytes = imageioGif(img)
    val mine = Gif.decode(bytes).getOrElse(fail("ImageIO GIF did not decode"))
    assert(mine.width === w && mine.height === h && mine.channels === 3)
    // the indexed write quantizes; compare against what ImageIO itself
    // resolves the palette to — EXACT, GIF is lossless
    val ref = imageioRead(bytes)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      assert((mine.pixels(o) & 0xff) === ((rgb >> 16) & 0xff), s"R at ($x,$y)")
      assert((mine.pixels(o + 1) & 0xff) === ((rgb >> 8) & 0xff), s"G at ($x,$y)")
      assert((mine.pixels(o + 2) & 0xff) === (rgb & 0xff), s"B at ($x,$y)")
    }
  }

  test("encodeGray is spec-compliant: ImageIO reads the exact raster, interlace included") {
    for (interlaced <- Seq(false, true)) {
      val (w, h) = (41, 19)
      // all 256 values appear: the LZW dictionary grows through several
      // code widths
      val px = Array.tabulate(w * h)(i => ((i * 7 + 3) % 256).toByte)
      val bytes = Gif.encodeGray(w, h, px, interlaced)
      val ref = imageioRead(bytes)
      assert(ref != null, s"ImageIO could not read engine GIF (interlaced=$interlaced)")
      assert(ref.getWidth === w && ref.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        val expect = px(y * w + x) & 0xff
        val rgb = ref.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) === expect, s"($x,$y) interlaced=$interlaced")
        assert(((rgb >> 8) & 0xff) === expect && (rgb & 0xff) === expect)
      }
    }
  }

  test("own round-trip is bit-exact through dictionary growth and the 4096 reset") {
    val rnd = new scala.util.Random(42)
    // big enough that the LZW dictionary hits 4096 and resets at least
    // once (random bytes allocate ~one entry per 1-2 input bytes)
    for ((w, h, interlaced) <- Seq((101, 83, false), (64, 128, true), (1, 1, false), (255, 3, true))) {
      val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val img = Gif.decode(Gif.encodeGray(w, h, px, interlaced))
        .getOrElse(fail(s"round-trip failed (${w}x$h interlaced=$interlaced)"))
      assert(img.width === w && img.height === h && img.channels === 3)
      for (i <- 0 until w * h) {
        val e = px(i) & 0xff
        assert((img.pixels(3 * i) & 0xff) === e, s"pixel $i in ${w}x$h")
        assert((img.pixels(3 * i + 1) & 0xff) === e && (img.pixels(3 * i + 2) & 0xff) === e)
      }
    }
  }

  test("malformed input fails closed") {
    val good = Gif.encodeGray(8, 8, Array.tabulate(64)(_.toByte))
    assert(Gif.decode(good.take(good.length - 10)).isEmpty, "truncated must be None")
    assert(Gif.decode("GIF89a only a header".getBytes("US-ASCII")).isEmpty)
    assert(Gif.decode(Array[Byte]()).isEmpty)
    assert(Gif.decode(graft.operators.Png.encode(4, 4, 1, new Array[Byte](16))).isEmpty)
    // corrupted LZW data must never throw: either the stream stays
    // decodable by luck or an invalid code fails closed to None — and a
    // decoded result still has the declared geometry
    val bad = good.clone()
    bad(bad.length - 12) = 0xff.toByte
    bad(bad.length - 11) = 0xff.toByte
    Gif.decode(bad).foreach { img =>
      assert(img.width === 8 && img.height === 8 && img.pixels.length === 192)
    }
  }
}
