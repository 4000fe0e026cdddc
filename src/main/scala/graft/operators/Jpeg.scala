package graft.operators

/** A JPEG codec — pure JVM, no image library (ITU-T T.81 /
  * ISO 10918-1), covering BOTH Huffman DCT modes real web images use.
  *
  * [[decode]] is a REAL pixel decoder: it walks the marker stream
  * (DQT/DHT/SOF/DRI/SOS, §B.2), entropy-decodes with canonical Huffman
  * tables (§F.2.2), dequantizes and de-zigzags each block, applies the
  * 2-D inverse DCT (§A.3.3, double-precision separable form),
  * replication-upsamples subsampled chroma planes, and converts JFIF
  * YCbCr to RGB — yielding actual pixel bytes for grayscale and
  * 3-component images at any sampling factors (4:4:4, 4:2:2, 4:2:0,
  * …), with restart-marker support. BASELINE (SOF0/1) decodes the
  * single interleaved scan directly; PROGRESSIVE (SOF2, §G) loops over
  * every scan — spectral-selection first passes (DC interleaved or
  * single-component, AC with EOB runs) and successive-approximation
  * refinements (DC raw bits, AC correction bits) — accumulating
  * coefficients until EOI, then reconstructs once. Arithmetic coding,
  * 12-bit precision, lossless, and hierarchical modes decode to None
  * rather than wrong pixels — the same fail-closed contract as
  * [[Png.decode]].
  *
  * [[encodeGray]] is the deterministic inverse for the oracle gate's
  * round-trip discipline (the q148 pattern): it writes a spec-compliant
  * baseline grayscale JPEG of FLAT 8×8 blocks with a unit quantization
  * table. A flat block's FDCT is DC-only (DC = 8·(v−128), every AC
  * exactly zero), and with quant step 1 the coefficient survives
  * quantization unchanged, so the lossy format becomes bit-exact:
  * decode(encodeGray(...)) reproduces every input block value — which
  * is what lets DuckDB replay the decoded pixels in closed form
  * (q179/q180). The entropy stream still exercises the real machinery:
  * canonical Huffman DC categories 0–11, differential DC prediction,
  * EOB-coded AC, byte stuffing, and (optionally) DRI/RSTn restarts.
  * JpegSpec additionally cross-checks [[decode]] against
  * `javax.imageio` on ImageIO-WRITTEN fixtures — full AC coefficients,
  * standard quant/Huffman tables, chroma subsampling — the independent
  * implementation.
  *
  * Scale shape: like [[Png]], the codec is a pure per-blob kernel —
  * [[Multimodal]] runs it partition-local (`mapPartitions`), so at
  * 100 TB it parallelizes with the file splits and never shuffles
  * pixel data.
  */
object Jpeg {

  /** §A.3.6 zig-zag coefficient order: zigzag(k) = raster index of the
    * k-th coefficient in transmission order.
    */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** IDCT basis m(u)(x) = C(u)·cos((2x+1)uπ/16)/2, so that
    * s(x,y) = Σu Σv m(u)(x)·m(v)(y)·S(u,v) is exactly §A.3.3's
    * normalization (DC-only blocks reconstruct to S(0,0)/8 — the
    * identity [[encodeGray]]'s exactness rests on).
    */
  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c * math.cos((2 * x + 1) * u * math.Pi / 16.0) / 2.0
  }

  /** Canonical Huffman decode tables (§F.2.2.3's MINCODE/MAXCODE/VALPTR
    * form): `counts(i)` codes of length i+1, symbol values in `vals`.
    */
  private final class HuffTable(counts: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    val symbols: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1)
          k += counts(l - 1)
          maxCode(l) = code - 1
        } else maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy-coded-segment bit reader: MSB-first, 0xFF00 byte stuffing
    * unstuffed, any other 0xFF-marker ends the segment (restart markers
    * are consumed explicitly via [[restart]]). A read past the segment
    * end sets `bad` — the caller fails the whole decode closed.
    */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    var bad = false

    def nextBit(): Int = {
      if (cnt == 0) {
        if (pos >= bytes.length) { bad = true; return 0 }
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= bytes.length) { bad = true; return 0 }
          val b2 = bytes(pos) & 0xff
          if (b2 == 0x00) { pos += 1; b = 0xff }
          else { pos -= 1; bad = true; return 0 } // marker mid-read
        }
        buf = b
        cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }

    /** §F.2.2.4 RECEIVE: the next n bits as an unsigned integer. */
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }

    def decodeHuff(t: HuffTable): Int = {
      var code = nextBit()
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l) && code >= t.minCode(l))
          return t.symbols(t.valPtr(l) + code - t.minCode(l))
        code = (code << 1) | nextBit()
        l += 1
      }
      bad = true
      0
    }

    /** Byte-align and consume the expected RSTn marker (§E.2.4). */
    def restart(n: Int): Unit = {
      cnt = 0 // discard the padded tail of the previous restart segment
      if (pos + 1 >= bytes.length ||
        (bytes(pos) & 0xff) != 0xff || (bytes(pos + 1) & 0xff) != (0xd0 + n)) {
        bad = true
      } else pos += 2
    }
  }

  /** §F.2.2.1 EXTEND: sign-extend an s-bit magnitude code. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final case class Component(
      id: Int, h: Int, v: Int, tq: Int, var td: Int = 0, var ta: Int = 0)

  /** Full baseline pixel decode: grayscale → channels=1, 3-component
    * JFIF YCbCr → channels=3 RGB. None for anything outside baseline
    * Huffman sequential 8-bit single-scan — fail closed, never garbage.
    */
  def decode(bytes: Array[Byte]): Option[Png.Image] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None
    def u8(o: Int): Int = bytes(o) & 0xff
    def be16(o: Int): Int = (u8(o) << 8) | u8(o + 1)

    val quant = new Array[Array[Int]](4)
    val dcTab = new Array[HuffTable](4)
    val acTab = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var progressive = false

    var i = 2
    while (i + 3 < bytes.length) {
      if (u8(i) != 0xff) return None
      var m = u8(i + 1)
      while (m == 0xff && i + 2 < bytes.length) { i += 1; m = u8(i + 1) }
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 }
      else if (m == 0xd9) return None // EOI before any scan
      else {
        if (i + 3 >= bytes.length) return None
        val len = be16(i + 2)
        if (len < 2 || i + 2 + len > bytes.length) return None
        val body = i + 4 // first byte after the length field
        m match {
          case 0xdb => // DQT — possibly several tables per segment
            var p = body
            while (p < i + 2 + len) {
              val pq = u8(p) >> 4
              val tq = u8(p) & 0x0f
              if (tq > 3 || pq > 1) return None
              val n = if (pq == 0) 64 else 128
              if (p + 1 + n > i + 2 + len) return None
              quant(tq) = Array.tabulate(64)(k =>
                if (pq == 0) u8(p + 1 + k) else be16(p + 1 + 2 * k))
              p += 1 + n
            }
          case 0xc4 => // DHT — possibly several tables per segment
            var p = body
            while (p < i + 2 + len) {
              val tc = u8(p) >> 4
              val th = u8(p) & 0x0f
              if (tc > 1 || th > 3) return None
              if (p + 17 > i + 2 + len) return None
              val counts = Array.tabulate(16)(k => u8(p + 1 + k))
              val n = counts.sum
              if (p + 17 + n > i + 2 + len) return None
              val vals = Array.tabulate(n)(k => u8(p + 17 + k))
              val t = new HuffTable(counts, vals)
              if (tc == 0) dcTab(th) = t else acTab(th) = t
              p += 17 + n
            }
          case 0xc0 | 0xc1 | 0xc2 => // SOF0/SOF1 sequential, SOF2 progressive
            if (u8(body) != 8) return None // 8-bit precision only
            height = be16(body + 1)
            width = be16(body + 3)
            val nc = u8(body + 5)
            if (width < 1 || height < 1 || (nc != 1 && nc != 3)) return None
            if (len < 8 + 3 * nc) return None
            comps = Array.tabulate(nc) { k =>
              val o = body + 6 + 3 * k
              Component(u8(o), u8(o + 1) >> 4, u8(o + 1) & 0x0f, u8(o + 2))
            }
            if (comps.exists(c => c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3))
              return None
            progressive = m == 0xc2
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // lossless / arithmetic / hierarchical: unsupported
          case 0xdd => // DRI
            if (len != 4) return None
            restartInterval = be16(body)
          case 0xda if progressive => // first scan of a progressive stream
            if (comps == null) return None
            return decodeProgressive(bytes, i, comps, quant, dcTab, acTab,
              width, height, restartInterval)
          case 0xda => // SOS — entropy-coded data follows
            if (comps == null) return None
            val ns = u8(body)
            if (ns != comps.length) return None // single interleaved scan only
            var p = body + 1
            var k = 0
            while (k < ns) {
              val cid = u8(p)
              val copt = comps.find(_.id == cid)
              if (copt.isEmpty) return None
              copt.get.td = u8(p + 1) >> 4
              copt.get.ta = u8(p + 1) & 0x0f
              p += 2
              k += 1
            }
            return decodeScan(bytes, p + 3, comps, quant, dcTab, acTab,
              width, height, restartInterval)
          case _ => // APPn / COM / anything skippable
        }
        if (m != 0xda) i += 2 + len
      }
    }
    None
  }

  /** Decode the interleaved scan into component planes, then assemble
    * the output raster (crop + upsample + color convert).
    */
  private def decodeScan(bytes: Array[Byte], scanStart: Int,
      comps: Array[Component], quant: Array[Array[Int]],
      dcTab: Array[HuffTable], acTab: Array[HuffTable],
      width: Int, height: Int, restartInterval: Int): Option[Png.Image] = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    // per-component sample planes, padded to whole MCUs
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planes = comps.zipWithIndex.map { case (c, k) =>
      new Array[Byte](planeW(k) * mcusY * 8 * c.v)
    }
    if (comps.exists(c => c.td > 3 || c.ta > 3 || dcTab(c.td) == null ||
      acTab(c.ta) == null || quant(c.tq) == null)) return None

    val r = new BitReader(bytes, scanStart)
    val pred = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val block = new Array[Double](64)
    var rstIdx = 0
    var mcusToRestart = restartInterval

    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcusToRestart == 0) {
          r.restart(rstIdx)
          rstIdx = (rstIdx + 1) & 7
          java.util.Arrays.fill(pred, 0)
          mcusToRestart = restartInterval
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val q = quant(c.tq)
          var bj = 0
          while (bj < c.v) {
            var bi = 0
            while (bi < c.h) {
              // --- one 8x8 block: entropy decode + dequant + de-zigzag
              java.util.Arrays.fill(coef, 0)
              val t = r.decodeHuff(dcTab(c.td))
              if (t > 15) return None
              pred(ci) += extend(r.receive(t), t)
              coef(0) = pred(ci) * q(0)
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = r.decodeHuff(acTab(c.ta))
                val run = rs >> 4
                val s = rs & 0x0f
                if (s == 0) {
                  if (run == 15) k += 16 // ZRL
                  else eob = true
                } else {
                  k += run
                  if (k > 63) return None
                  coef(Zigzag(k)) = extend(r.receive(s), s) * q(k)
                  k += 1
                }
              }
              if (r.bad) return None
              idctBlock(coef, planes(ci), planeW(ci),
                (mx * c.h + bi) * 8, (my * c.v + bj) * 8)
              bi += 1
            }
            bj += 1
          }
          ci += 1
        }
        if (restartInterval > 0) mcusToRestart -= 1
        mx += 1
      }
      my += 1
    }
    if (r.bad) return None
    Some(assemble(comps, planes, planeW, width, height, maxH, maxV))
  }

  /** 2-D inverse DCT of one dequantized raster-order block (§A.3.3,
    * separable double-precision form) written into a sample plane at
    * (gx0, gy0) — the shared kernel of the baseline and progressive
    * paths.
    */
  private def idctBlock(coef: Array[Int], plane: Array[Byte], planeW: Int,
      gx0: Int, gy0: Int): Unit = {
    var y0 = 0
    while (y0 < 8) {
      var x0 = 0
      while (x0 < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          val bu = Basis(u)(x0)
          while (v < 8) {
            val cuv = coef(v * 8 + u)
            if (cuv != 0) acc += bu * Basis(v)(y0) * cuv
            v += 1
          }
          u += 1
        }
        val s = math.round(acc).toInt + 128
        val px = if (s < 0) 0 else if (s > 255) 255 else s
        plane((gy0 + y0) * planeW + gx0 + x0) = px.toByte
        x0 += 1
      }
      y0 += 1
    }
  }

  /** Crop, replication-upsample, and color-convert decoded component
    * planes into the output raster — shared by both decode paths.
    */
  private def assemble(comps: Array[Component], planes: Array[Array[Byte]],
      planeW: Array[Int], width: Int, height: Int,
      maxH: Int, maxV: Int): Png.Image = {
    if (comps.length == 1) {
      val out = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        System.arraycopy(planes(0), y * planeW(0), out, y * width, width)
        y += 1
      }
      Png.Image(width, height, 1, out)
    } else {
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          def sample(ci: Int): Int = {
            val c = comps(ci)
            val sx = x * c.h / maxH
            val sy = y * c.v / maxV
            planes(ci)(sy * planeW(ci) + sx) & 0xff
          }
          val yy = sample(0).toDouble
          val cb = sample(1) - 128.0
          val cr = sample(2) - 128.0
          def clamp(d: Double): Byte = {
            val v = math.round(d).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          val o = (y * width + x) * 3
          out(o) = clamp(yy + 1.402 * cr)
          out(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp(yy + 1.772 * cb)
          x += 1
        }
        y += 1
      }
      Png.Image(width, height, 3, out)
    }
  }

  /** Progressive-mode driver (§G): from the first SOS marker onward,
    * loop over scans — each either a spectral band's first pass or a
    * successive-approximation refinement — accumulating coefficients in
    * zig-zag order per block, then dequantize + IDCT + assemble once at
    * EOI. DHT/DQT/DRI segments BETWEEN scans update the live tables
    * (progressive streams re-define Huffman tables per scan). Fails
    * closed on any malformed scan, like the baseline path.
    */
  private def decodeProgressive(bytes: Array[Byte], startPos: Int,
      comps: Array[Component], quant: Array[Array[Int]],
      dcTab: Array[HuffTable], acTab: Array[HuffTable],
      width: Int, height: Int, restartInterval0: Int): Option[Png.Image] = {
    def u8(o: Int): Int = bytes(o) & 0xff
    def be16(o: Int): Int = (u8(o) << 8) | u8(o + 1)
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
    // full MCU-padded block grid (interleaved DC scans cover it) and the
    // component's true block dims (non-interleaved scans cover only these,
    // §A.2.2)
    val bwFull = comps.map(c => mcusX * c.h)
    val bhFull = comps.map(c => mcusY * c.v)
    val bwComp = comps.map(c => (width * c.h + 8 * maxH - 1) / (8 * maxH))
    val bhComp = comps.map(c => (height * c.v + 8 * maxV - 1) / (8 * maxV))
    // per-component coefficient accumulators, zig-zag order per block
    val coefs = comps.indices
      .map(k => new Array[Int](bwFull(k) * bhFull(k) * 64)).toArray
    var restartInterval = restartInterval0
    var sawScan = false

    var i = startPos
    // i+1 (not i+3): EOI is a bare 2-byte marker that legally ends the
    // stream — segment-bearing cases re-check their own bounds below
    while (i + 1 < bytes.length) {
      if (u8(i) != 0xff) return None
      var m = u8(i + 1)
      while (m == 0xff && i + 2 < bytes.length) { i += 1; m = u8(i + 1) }
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 }
      else if (m == 0xd9) { // EOI — all scans in; reconstruct
        if (!sawScan) return None
        if (comps.exists(c => quant(c.tq) == null)) return None
        val planeW = bwFull.map(_ * 8)
        val planes = comps.indices
          .map(k => new Array[Byte](planeW(k) * bhFull(k) * 8)).toArray
        val raster = new Array[Int](64)
        var ci = 0
        while (ci < comps.length) {
          val q = quant(comps(ci).tq)
          var by = 0
          while (by < bhFull(ci)) {
            var bx = 0
            while (bx < bwFull(ci)) {
              java.util.Arrays.fill(raster, 0)
              val off = (by * bwFull(ci) + bx) * 64
              var k = 0
              while (k < 64) {
                val v = coefs(ci)(off + k)
                if (v != 0) raster(Zigzag(k)) = v * q(k)
                k += 1
              }
              idctBlock(raster, planes(ci), planeW(ci), bx * 8, by * 8)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        return Some(assemble(comps, planes, planeW, width, height, maxH, maxV))
      } else {
        if (i + 3 >= bytes.length) return None
        val len = be16(i + 2)
        if (len < 2 || i + 2 + len > bytes.length) return None
        val body = i + 4
        m match {
          case 0xdb => // DQT between scans
            var p = body
            while (p < i + 2 + len) {
              val pq = u8(p) >> 4
              val tq = u8(p) & 0x0f
              if (tq > 3 || pq > 1) return None
              val n = if (pq == 0) 64 else 128
              if (p + 1 + n > i + 2 + len) return None
              quant(tq) = Array.tabulate(64)(k =>
                if (pq == 0) u8(p + 1 + k) else be16(p + 1 + 2 * k))
              p += 1 + n
            }
          case 0xc4 => // DHT between scans — the normal progressive layout
            var p = body
            while (p < i + 2 + len) {
              val tc = u8(p) >> 4
              val th = u8(p) & 0x0f
              if (tc > 1 || th > 3) return None
              if (p + 17 > i + 2 + len) return None
              val counts = Array.tabulate(16)(k => u8(p + 1 + k))
              val n = counts.sum
              if (p + 17 + n > i + 2 + len) return None
              val vals = Array.tabulate(n)(k => u8(p + 17 + k))
              val t = new HuffTable(counts, vals)
              if (tc == 0) dcTab(th) = t else acTab(th) = t
              p += 17 + n
            }
          case 0xdd =>
            if (len != 4) return None
            restartInterval = be16(body)
          case 0xda => // one scan
            val ns = u8(body)
            if (ns < 1 || ns > comps.length || len < 6 + 2 * ns) return None
            val scanCis = new Array[Int](ns)
            var p = body + 1
            var k = 0
            while (k < ns) {
              val idx = comps.indexWhere(_.id == u8(p))
              if (idx < 0) return None
              comps(idx).td = u8(p + 1) >> 4
              comps(idx).ta = u8(p + 1) & 0x0f
              scanCis(k) = idx
              p += 2
              k += 1
            }
            val ss = u8(p)
            val se = u8(p + 1)
            val ah = u8(p + 2) >> 4
            val al = u8(p + 2) & 0x0f
            if (al > 13 || ah > 13) return None
            val r = new BitReader(bytes, p + 3)
            if (!progScan(r, scanCis, comps, dcTab, acTab, coefs,
              bwFull, bwComp, bhComp, mcusX, mcusY, ss, se, ah, al,
              restartInterval)) return None
            sawScan = true
            // seek the next true marker past entropy padding / restarts
            var q2 = r.pos
            var found = -1
            while (q2 + 1 < bytes.length && found < 0) {
              if (u8(q2) == 0xff) {
                val b2 = u8(q2 + 1)
                if (b2 == 0x00 || (b2 >= 0xd0 && b2 <= 0xd7)) q2 += 2
                else if (b2 == 0xff) q2 += 1
                else found = q2
              } else q2 += 1
            }
            if (found < 0) return None
            i = found
          case _ => () // APPn / COM
        }
        if (m != 0xda) i += 2 + len
      }
    }
    None
  }

  /** Entropy-decode ONE progressive scan into the coefficient
    * accumulators (§G.1.2): DC first/refine (interleaved or single-
    * component), AC first with EOB runs, AC refinement with correction
    * bits. Returns false on any malformation.
    */
  private def progScan(r: BitReader, scanCis: Array[Int],
      comps: Array[Component], dcTab: Array[HuffTable],
      acTab: Array[HuffTable], coefs: Array[Array[Int]],
      bwFull: Array[Int], bwComp: Array[Int], bhComp: Array[Int],
      mcusX: Int, mcusY: Int, ss: Int, se: Int, ah: Int, al: Int,
      ri: Int): Boolean = {
    var rstIdx = 0
    var toRestart = ri
    if (ss == 0) {
      // --- DC scan (first pass when Ah=0, else one refinement bit/block)
      if (se != 0) return false
      if (ah == 0 && scanCis.exists(ci => dcTab(comps(ci).td) == null))
        return false
      val pred = new Array[Int](comps.length)
      def dcUnit(ci: Int, bx: Int, by: Int): Boolean = {
        val off = (by * bwFull(ci) + bx) * 64
        if (ah == 0) {
          val t = r.decodeHuff(dcTab(comps(ci).td))
          if (t > 15 || r.bad) return false
          pred(ci) += extend(r.receive(t), t)
          coefs(ci)(off) = pred(ci) << al
        } else if (r.nextBit() == 1) coefs(ci)(off) |= (1 << al)
        !r.bad
      }
      def atRestart(): Boolean = {
        r.restart(rstIdx)
        rstIdx = (rstIdx + 1) & 7
        java.util.Arrays.fill(pred, 0)
        toRestart = ri
        !r.bad
      }
      if (scanCis.length > 1) {
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            if (ri > 0 && toRestart == 0 && !atRestart()) return false
            var k = 0
            while (k < scanCis.length) {
              val ci = scanCis(k)
              val c = comps(ci)
              var bj = 0
              while (bj < c.v) {
                var bi = 0
                while (bi < c.h) {
                  if (!dcUnit(ci, mx * c.h + bi, my * c.v + bj)) return false
                  bi += 1
                }
                bj += 1
              }
              k += 1
            }
            if (ri > 0) toRestart -= 1
            mx += 1
          }
          my += 1
        }
      } else {
        val ci = scanCis(0)
        var by = 0
        while (by < bhComp(ci)) {
          var bx = 0
          while (bx < bwComp(ci)) {
            if (ri > 0 && toRestart == 0 && !atRestart()) return false
            if (!dcUnit(ci, bx, by)) return false
            if (ri > 0) toRestart -= 1
            bx += 1
          }
          by += 1
        }
      }
      !r.bad
    } else {
      // --- AC scan: always a single component (§G.1.1.1.1)
      if (scanCis.length != 1 || se > 63 || ss > se) return false
      val ci = scanCis(0)
      val acT = acTab(comps(ci).ta)
      if (acT == null) return false
      val coef = coefs(ci)
      val p1 = 1 << al
      val m1 = -1 << al
      var eobrun = 0
      def acFirstUnit(off: Int): Boolean = {
        if (eobrun > 0) { eobrun -= 1; return true }
        var k = ss
        while (k <= se) {
          val rs = r.decodeHuff(acT)
          if (r.bad) return false
          val run = rs >> 4
          val s = rs & 0x0f
          if (s == 0) {
            if (run < 15) { // EOBn: this block ends, run more follow
              eobrun = (1 << run) - 1
              if (run > 0) eobrun += r.receive(run)
              return !r.bad
            }
            k += 16 // ZRL
          } else {
            k += run
            if (k > se) return false
            coef(off + k) = extend(r.receive(s), s) << al
            k += 1
          }
        }
        !r.bad
      }
      def refineNonzero(off: Int, from: Int): Boolean = {
        var k = from
        while (k <= se) {
          val c0 = coef(off + k)
          if (c0 != 0 && r.nextBit() == 1 && (c0 & p1) == 0)
            coef(off + k) = c0 + (if (c0 >= 0) p1 else m1)
          k += 1
        }
        !r.bad
      }
      def acRefineUnit(off: Int): Boolean = {
        if (eobrun > 0) { eobrun -= 1; return refineNonzero(off, ss) }
        var k = ss
        while (k <= se) {
          val rs = r.decodeHuff(acT)
          if (r.bad) return false
          var run = rs >> 4
          val s = rs & 0x0f
          var newval = 0
          if (s == 0) {
            if (run < 15) { // EOBn: correction bits for the tail, then done
              eobrun = (1 << run) - 1
              if (run > 0) eobrun += r.receive(run)
              return refineNonzero(off, k)
            }
            // ZRL: pass 16 zero-history coefficients
          } else {
            if (s != 1) return false // refinement codes carry magnitude 1
            newval = if (r.receive(1) != 0) p1 else m1
          }
          // advance: correction bits for nonzero history, count down the
          // run over zero-history slots, place the new coefficient last
          var placed = false
          while (k <= se && !placed) {
            val c0 = coef(off + k)
            if (c0 != 0) {
              if (r.nextBit() == 1 && (c0 & p1) == 0)
                coef(off + k) = c0 + (if (c0 >= 0) p1 else m1)
            } else if (run == 0) {
              if (s != 0) coef(off + k) = newval
              placed = true
            } else run -= 1
            k += 1
          }
          if (r.bad) return false
        }
        true
      }
      var by = 0
      while (by < bhComp(ci)) {
        var bx = 0
        while (bx < bwComp(ci)) {
          if (ri > 0 && toRestart == 0) {
            r.restart(rstIdx)
            rstIdx = (rstIdx + 1) & 7
            eobrun = 0
            toRestart = ri
            if (r.bad) return false
          }
          val off = (by * bwFull(ci) + bx) * 64
          if (!(if (ah == 0) acFirstUnit(off) else acRefineUnit(off)))
            return false
          if (ri > 0) toRestart -= 1
          bx += 1
        }
        by += 1
      }
      !r.bad
    }
  }

  /** Marker-stream bit writer with §B.1.1.5 byte stuffing. */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(bits: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        buf = (buf << 1) | ((bits >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf)
          if (buf == 0xff) out.write(0x00)
          buf = 0
          cnt = 0
        }
        i -= 1
      }
    }
    /** Pad the current byte with 1-bits (§F.1.2.3) — before RST/EOI. */
    def flush(): Unit = if (cnt > 0) { put(0xff, 8 - cnt) }
  }

  /** Deterministic grayscale encoder for flat 8×8 blocks — see the
    * object doc for why this is bit-exact. `blockVals` is row-major,
    * one 0–255 gray value per block; `restartInterval > 0` adds
    * DRI/RSTn restarts every that many blocks (1 MCU = 1 block for
    * non-subsampled grayscale; baseline mode only).
    *
    * `progressive = true` writes the SAME pixels as a genuine
    * three-scan PROGRESSIVE stream (SOF2): a DC-first scan at
    * successive-approximation Al=1 (point-transformed diffs through
    * the real category coder), a DC refinement scan (Ah=1, one raw bit
    * per block), and an AC first scan (Ss=1..Se=63) that is one EOBn
    * run over every block — exercising [[decodeProgressive]]'s scan
    * loop, DC shift/refine accumulation, and EOB-run machinery while
    * staying bit-exact (a flat block's DC is 8·(v−128); shift + refine
    * bit reassemble it losslessly, and every AC is exactly zero).
    */
  def encodeGray(wBlocks: Int, hBlocks: Int, blockVals: Array[Int],
      restartInterval: Int = 0, progressive: Boolean = false): Array[Byte] = {
    require(blockVals.length == wBlocks * hBlocks, "one value per block")
    require(blockVals.forall(v => v >= 0 && v <= 255), "gray values are 0-255")
    require(!progressive || restartInterval == 0,
      "restart intervals are exercised on the baseline path")
    require(!progressive || blockVals.length <= 32767,
      "a single EOBn code covers at most 2^15 blocks")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      body.foreach(out.write)
    }
    marker(0xd8) // SOI
    // DQT 0: unit table, 8-bit precision — quantization is the identity
    seg(0xdb, Array(0x00) ++ Array.fill(64)(1))
    // SOF0/SOF2: 8-bit, H, W, one component (id 1, 1x1 sampling, table 0)
    val h = hBlocks * 8
    val w = wBlocks * 8
    seg(if (progressive) 0xc2 else 0xc0,
      Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 1, 1, 0x11, 0))
    // DHT: custom canonical tables. DC: categories 0-11, all at code
    // length 4 (12 of 16 codes used). AC baseline: the single EOB symbol
    // at length 2. AC progressive: the fifteen EOBn symbols r=0..14
    // (0x00..0xE0), all at length 4 — canonical code of symbol (r<<4)
    // is r. All valid (incomplete) Huffman tables.
    val dcCounts = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    seg(0xc4, Array(0x00) ++ dcCounts ++ (0 to 11))
    if (progressive) {
      val acCounts = Array(0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
      seg(0xc4, Array(0x10) ++ acCounts ++ (0 to 14).map(_ << 4))
    } else {
      val acCounts = Array(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
      seg(0xc4, Array(0x10) ++ acCounts ++ Array(0x00))
    }
    if (restartInterval > 0)
      seg(0xdd, Array(restartInterval >> 8, restartInterval & 0xff))

    /** DC category + offset bits (§F.1.2.1.2) through the length-4 table. */
    def putDc(bw: BitWriter, diff0: Int): Unit = {
      var diff = diff0
      var t = 0
      var mag = math.abs(diff)
      while (mag > 0) { t += 1; mag >>= 1 }
      bw.put(t, 4) // DC table: category c is code c at length 4
      if (t > 0) {
        if (diff < 0) diff += (1 << t) - 1
        bw.put(diff, t)
      }
    }

    if (progressive) {
      // scan 1: DC first, Ss=0 Se=0 Ah=0 Al=1 — diffs of DC >> 1
      seg(0xda, Array(1, 1, 0x00, 0, 0, 0x01))
      val bw1 = new BitWriter(out)
      var pred = 0
      for (v <- blockVals) {
        val dcAl = (8 * (v - 128)) >> 1
        putDc(bw1, dcAl - pred)
        pred = dcAl
      }
      bw1.flush()
      // scan 2: DC refinement, Ah=1 Al=0 — the held-back low bit, raw
      seg(0xda, Array(1, 1, 0x00, 0, 0, 0x10))
      val bw2 = new BitWriter(out)
      for (v <- blockVals) bw2.put(8 * (v - 128) & 1, 1)
      bw2.flush()
      // scan 3: AC first, Ss=1 Se=63 — every AC is zero: one EOBn run
      // covering all n blocks ((1<<r) + extra with extra < (1<<r))
      seg(0xda, Array(1, 1, 0x00, 1, 63, 0x00))
      val bw3 = new BitWriter(out)
      val n = blockVals.length
      var rr = 0
      while ((1 << (rr + 1)) <= n) rr += 1
      bw3.put(rr, 4) // AC table: symbol (r<<4) is code r at length 4
      if (rr > 0) bw3.put(n - (1 << rr), rr)
      bw3.flush()
    } else {
      // SOS: 1 component, DC table 0 / AC table 0, full spectral range
      seg(0xda, Array(1, 1, 0x00, 0, 63, 0))
      val bw = new BitWriter(out)
      var pred = 0
      var rstIdx = 0
      var b = 0
      while (b < blockVals.length) {
        if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
          bw.flush()
          marker(0xd0 + rstIdx)
          rstIdx = (rstIdx + 1) & 7
          pred = 0
        }
        val dc = 8 * (blockVals(b) - 128) // flat block's only nonzero coefficient
        putDc(bw, dc - pred)
        pred = dc
        bw.put(0, 2) // AC table: EOB is code 00 at length 2
        b += 1
      }
      bw.flush()
    }
    marker(0xd9) // EOI
    out.toByteArray
  }
}
