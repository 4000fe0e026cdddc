package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaBlob, MediaMeta}

/** The multimodal decode path on REAL media bytes: PNG headers parse to
  * their true dimensions; non-PNG payloads keep the deterministic stub
  * (the DuckDB oracle twin for the synthetic text-byte corpus).
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
}
