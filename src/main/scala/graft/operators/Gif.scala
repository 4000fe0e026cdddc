package graft.operators

/** A real GIF codec — pure JVM, no image library (GIF89a specification,
  * W3C/CompuServe, 1990; LZW per §22 Appendix F).
  *
  * Completes the image trio ([[Png]] lossless truecolor, [[Jpeg]] lossy
  * DCT): [[decode]] parses the logical screen descriptor and color
  * tables, walks the block stream (extensions skipped, sub-block
  * framing honored), LZW-decompresses the first image's index stream
  * (variable-width codes, clear/EOI, 4096-entry dictionary), applies
  * the 4-pass interlace reordering when flagged, and resolves indices
  * through the active palette to RGB pixels. Later frames of an
  * animation are ignored (first frame = the still image semantics);
  * malformed streams, out-of-palette indices, and truncation fail
  * closed to None like the other codecs.
  *
  * [[encodeGray]] writes a spec-compliant single-frame GIF89a with a
  * 256-entry grayscale global palette and a real LZW compressor —
  * GIF is lossless over its palette, so decode(encodeGray(px)) == px
  * bit-exactly for ANY gray raster (no flat-block trick needed, unlike
  * JPEG), which is what puts the full LZW path on the DuckDB oracle
  * gate (q183). GifSpec cross-checks both directions against
  * `javax.imageio` — lossless means EXACT agreement, not a tolerance.
  *
  * Scale shape: a pure per-blob kernel run partition-local by
  * [[Multimodal]] — parallel with the file splits, no pixel shuffle.
  */
object Gif {

  /** Full pixel decode of the FIRST image in the stream. Output is RGB
    * (channels = 3) — palette resolution is part of decoding.
    */
  def decode(bytes: Array[Byte]): Option[Png.Image] = {
    def u8(o: Int): Int = bytes(o) & 0xff
    def le16(o: Int): Int = u8(o) | (u8(o + 1) << 8)
    if (bytes.length < 14) return None
    if (bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != '8' ||
      (bytes(4) != '7' && bytes(4) != '9') || bytes(5) != 'a') return None
    val packed = u8(10)
    var gct: Array[Byte] = null
    var i = 13
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 0x07) // entries
      if (i + 3 * n > bytes.length) return None
      gct = java.util.Arrays.copyOfRange(bytes, i, i + 3 * n)
      i += 3 * n
    }
    while (i < bytes.length) {
      u8(i) match {
        case 0x3b => return None // trailer before any image
        case 0x21 => // extension: label + sub-blocks, skip
          i += 2
          while (i < bytes.length && u8(i) != 0) {
            i += 1 + u8(i)
          }
          if (i >= bytes.length) return None
          i += 1 // block terminator
        case 0x2c => // image descriptor
          if (i + 10 > bytes.length) return None
          val w = le16(i + 5)
          val h = le16(i + 7)
          val f = u8(i + 9)
          i += 10
          var pal = gct
          if ((f & 0x80) != 0) { // local color table wins
            val n = 2 << (f & 0x07)
            if (i + 3 * n > bytes.length) return None
            pal = java.util.Arrays.copyOfRange(bytes, i, i + 3 * n)
            i += 3 * n
          }
          if (pal == null || w < 1 || h < 1) return None
          val interlaced = (f & 0x40) != 0
          if (i >= bytes.length) return None
          val minCode = u8(i)
          i += 1
          // concatenate the LZW sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while (i < bytes.length && u8(i) != 0) {
            val n = u8(i)
            if (i + 1 + n > bytes.length) return None
            data.write(bytes, i + 1, n)
            i += 1 + n
          }
          if (i >= bytes.length) return None
          val idx = lzwDecode(data.toByteArray, minCode, w * h).getOrElse(return None)
          val rows = if (interlaced) deinterlace(idx, w, h) else idx
          val out = new Array[Byte](w * h * 3)
          var k = 0
          while (k < w * h) {
            val p = rows(k) & 0xff
            if (3 * p + 2 >= pal.length) return None // index outside palette
            out(3 * k) = pal(3 * p)
            out(3 * k + 1) = pal(3 * p + 1)
            out(3 * k + 2) = pal(3 * p + 2)
            k += 1
          }
          return Some(Png.Image(w, h, 3, out))
        case _ => return None // unknown block type: not a valid GIF stream
      }
    }
    None
  }

  /** GIF's 4-pass interlace: rows are STORED pass-ordered (every 8th
    * from 0, every 8th from 4, every 4th from 2, every 2nd from 1);
    * re-scatter them into display order.
    */
  private def deinterlace(idx: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](idx.length)
    var src = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < h) {
        System.arraycopy(idx, src * w, out, y * w, w)
        src += 1
        y += step
      }
    }
    out
  }

  /** Variable-width LZW decode (GIF flavor: clear = 2^min, eoi =
    * clear + 1, codes grow to 12 bits, dictionary resets on clear).
    * Stops after `expect` output bytes. None on any malformed stream.
    */
  private def lzwDecode(data: Array[Byte], minCode: Int, expect: Int): Option[Array[Byte]] = {
    if (minCode < 2 || minCode > 8) return None
    val clear = 1 << minCode
    val eoi = clear + 1
    // dictionary as (prefix code, appended byte); first `clear` are roots
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new Array[Byte](expect)
    var outLen = 0
    var next = eoi + 1
    var width = minCode + 1
    var bitPos = 0
    var prev = -1
    val firstOf = new Array[Byte](4096)
    var j = 0
    while (j < clear) { suffix(j) = j.toByte; firstOf(j) = j.toByte; j += 1 }

    def read(): Int = {
      if (bitPos + width > data.length * 8) return -1
      var v = 0
      var k = 0
      while (k < width) {
        val b = (data((bitPos + k) >> 3) >> ((bitPos + k) & 7)) & 1
        v |= b << k
        k += 1
      }
      bitPos += width
      v
    }
    // emit the expansion of `code` (walk prefixes, reverse order)
    val stack = new Array[Byte](4096)
    def emit(code: Int): Boolean = {
      var c = code
      var top = 0
      while (c >= clear) { // composite: push suffix, follow prefix
        if (top >= stack.length || c >= next) return false
        stack(top) = suffix(c)
        top += 1
        c = prefix(c)
      }
      stack(top) = suffix(c)
      top += 1
      while (top > 0 && outLen < expect) {
        top -= 1
        out(outLen) = stack(top)
        outLen += 1
      }
      top == 0
    }

    var code = read()
    while (code != -1) {
      if (code == eoi) return if (outLen == expect) Some(out) else None
      else if (code == clear) {
        next = eoi + 1
        width = minCode + 1
        prev = -1
      } else if (prev == -1) {
        if (code >= clear) return None // first code after clear must be a root
        if (!emit(code)) return None
        prev = code
      } else {
        if (code > next || (code == next && next >= 4096)) return None
        val cur = if (code == next) prev else code // the KwKwK case
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = firstOf(cur)
          firstOf(next) = firstOf(prev)
          next += 1
        }
        if (code == next - 1 && code >= eoi + 1) {
          // the just-created entry (KwKwK): emit prev + first(prev)
          if (!emit(code)) return None
        } else if (!emit(code)) return None
        if (next < 4096 && next == (1 << width) && width < 12) width += 1
        prev = code
      }
      if (outLen >= expect) {
        // enough pixels: the stream may still carry a terminating EOI,
        // which well-formed encoders write — accept either way
        return Some(out)
      }
      code = read()
    }
    None
  }

  /** Single-frame grayscale GIF89a with a 256-entry gray palette and a
    * real variable-width LZW compressor (clear emitted up front and on
    * dictionary overflow — the canonical encoder behavior every decoder
    * must accept). `interlaced = true` stores rows in 4-pass order and
    * sets the flag, exercising the decoder's de-interlace path.
    */
  def encodeGray(w: Int, h: Int, pixels: Array[Byte], interlaced: Boolean = false): Array[Byte] = {
    require(w >= 1 && h >= 1 && pixels.length == w * h, "w*h gray bytes")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(w); le16(h)
    out.write(0xf7) // GCT present, 8 bits/entry, 256 entries
    out.write(0) // background color
    out.write(0) // aspect ratio
    var p = 0
    while (p < 256) { out.write(p); out.write(p); out.write(p); p += 1 }
    out.write(0x2c) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    out.write(if (interlaced) 0x40 else 0x00)
    val rows =
      if (!interlaced) pixels
      else {
        val r = new Array[Byte](pixels.length)
        var dst = 0
        for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
          var y = start
          while (y < h) {
            System.arraycopy(pixels, y * w, r, dst * w, w)
            dst += 1
            y += step
          }
        }
        r
      }
    val lzw = lzwEncode(rows, 8)
    out.write(8) // LZW minimum code size
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** GIF-flavor LZW compress: dictionary of (prefix, byte) → code,
    * variable width growing WITH the code the decoder will allocate,
    * clear + reset at 4096.
    */
  private def lzwEncode(data: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0
    var nBits = 0
    var width = minCode + 1
    def put(code: Int): Unit = {
      cur |= code << nBits
      nBits += width
      while (nBits >= 8) {
        out.write(cur & 0xff)
        cur >>= 8
        nBits -= 8
      }
    }
    val dict = new java.util.HashMap[Long, Integer]()
    def reset(): Unit = { dict.clear(); }
    var next = eoi + 1
    put(clear)
    var prefix = -1
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xff
      if (prefix == -1) prefix = b
      else {
        val key = (prefix.toLong << 8) | b
        val hit = dict.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          put(prefix)
          if (next < 4096) {
            dict.put(key, next)
            next += 1
            // width grows when the DECODER's next allocation crosses a
            // power of two — mirror its schedule exactly
            if (next - 1 == (1 << width) && width < 12) width += 1
          } else {
            put(clear)
            reset()
            next = eoi + 1
            width = minCode + 1
          }
          prefix = b
        }
      }
      i += 1
    }
    if (prefix != -1) put(prefix)
    put(eoi)
    if (nBits > 0) out.write(cur & 0xff)
    out.toByteArray
  }
}
