package graft.functions

/** Pure-JVM baseline JPEG (ITU-T T.81 sequential DCT, SOF0) codec pair:
  * a general DECODER — marker parse, DQT/DHT canonical Huffman, MCU
  * entropy scan with restart markers, dequantize, inverse zigzag,
  * float IDCT, level shift, YCbCr→RGB with sample-replication chroma
  * upsampling — and a minimal ENCODER that emits real single-component
  * baseline JPEGs whose blocks are DC-only, so the decoded image is
  * CLOSED-FORM (each 8×8 block uniformly `128 + dc` when Q[0] = 8:
  * the DC-only IDCT is the constant dc·Q₀/8, exact in floats).
  *
  * The decoder is the general artifact (it decodes `javax.imageio`'s
  * own JPEG output — `MultimodalSpec` pins that differential); the
  * encoder exists to make fixtures whose decode an SQL oracle can
  * recompute without a DCT: lossy codecs are only oracle-checkable
  * where the loss is analytically known.
  *
  * JPEG's spec does NOT mandate a bit-exact IDCT, so cross-decoder
  * pixel equality is ±1-ulp-of-IDCT territory — the reason the
  * hash-matched query (q_jpeg_decode) rides the DC-only fixture while
  * the general path is differentially pinned with a tolerance.
  */
object BaselineJpeg {

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // cos((2x+1)·u·π/16) basis, shared by IDCT
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8)((x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0))
  private val C: Array[Double] = Array.tabulate(8)(u =>
    if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    // canonical code table: (length → (firstCode, firstIndex)), T.81 C.2
    private val maxLen = 16
    private val firstCode = new Array[Int](maxLen + 1)
    private val firstIdx = new Array[Int](maxLen + 1)
    private val countAt = new Array[Int](maxLen + 1)
    locally {
      var code = 0
      var idx = 0
      var l = 1
      while (l <= maxLen) {
        firstCode(l) = code
        firstIdx(l) = idx
        countAt(l) = counts(l - 1)
        code += counts(l - 1)
        idx += counts(l - 1)
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = 0
      var l = 0
      while (l < maxLen) {
        code = (code << 1) | br.bit()
        l += 1
        if (countAt(l) > 0 && code >= firstCode(l) &&
            code - firstCode(l) < countAt(l))
          return symbols(firstIdx(l) + (code - firstCode(l)))
      }
      throw new IllegalArgumentException("invalid Huffman code")
    }
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    /** true + realign when the next marker is RSTn; stops at other markers */
    def atRestart(): Boolean = {
      if (pos + 1 < data.length && (data(pos) & 0xFF) == 0xFF) {
        val m = data(pos + 1) & 0xFF
        if (m >= 0xD0 && m <= 0xD7) { pos += 2; acc = 0; nbits = 0; return true }
      }
      false
    }
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < data.length, "entropy stream exhausted")
        var b = data(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          val nxt = if (pos < data.length) data(pos) & 0xFF else 0xD9
          if (nxt == 0x00) pos += 1 // byte stuffing
          else b = 0 // hit a marker (EOI / next): pad with zero bits, T.81 F.2.2.5
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    /** Batched read: consumes whole byte-remainders at a time instead of
      * bit-by-bit (the magnitude-bits fast path — Huffman code walking
      * still reads single bits through [[bit]]).
      */
    def bits(n: Int): Int = {
      var v = 0
      var need = n
      while (need > 0) {
        if (nbits == 0) { v = (v << 1) | bit(); need -= 1 } // refill via bit()
        else {
          val take = if (need < nbits) need else nbits
          v = (v << take) | ((acc >> (nbits - take)) & ((1 << take) - 1))
          nbits -= take
          need -= take
        }
      }
      v
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var td: Int = 0
    var ta: Int = 0
    var pred: Int = 0
  }

  /** Decode a baseline (SOF0) JPEG. Returns (width, height, channels,
    * pixels) — pixels row-major, `channels` interleaved (1 = grayscale,
    * 3 = RGB).
    */
  def decode(jpeg: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(jpeg.length > 4 && (jpeg(0) & 0xFF) == 0xFF && (jpeg(1) & 0xFF) == 0xD8,
      "not a JPEG (missing SOI)")
    val qt = Array.ofDim[Int](4, 64) // natural order
    val dcT = new Array[Huff](4)
    val acT = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var p = 2
    def u16(i: Int) = ((jpeg(i) & 0xFF) << 8) | (jpeg(i + 1) & 0xFF)

    var sosAt = -1
    while (sosAt < 0) {
      require((jpeg(p) & 0xFF) == 0xFF, f"expected marker at $p, got ${jpeg(p)}%02x")
      var m = jpeg(p + 1) & 0xFF
      while (m == 0xFF) { p += 1; m = jpeg(p + 1) & 0xFF } // fill bytes
      p += 2
      m match {
        case 0xD9 => throw new IllegalArgumentException("EOI before SOS")
        case 0xC0 => // SOF0
          val len = u16(p)
          require((jpeg(p + 2) & 0xFF) == 8, "only 8-bit precision supported")
          height = u16(p + 3); width = u16(p + 5)
          val nc = jpeg(p + 7) & 0xFF
          require(nc == 1 || nc == 3, s"unsupported component count $nc")
          comps = Array.tabulate(nc) { i =>
            val o = p + 8 + 3 * i
            Component(jpeg(o) & 0xFF, (jpeg(o + 1) & 0xF0) >> 4,
              jpeg(o + 1) & 0x0F, jpeg(o + 2) & 0xFF)
          }
          p += len
        case 0xC4 => // DHT (possibly several tables per segment)
          val len = u16(p)
          var q = p + 2
          while (q < p + len) {
            val tc = (jpeg(q) & 0xF0) >> 4
            val th = jpeg(q) & 0x0F
            val counts = Array.tabulate(16)(i => jpeg(q + 1 + i) & 0xFF)
            val total = counts.sum
            val syms = Array.tabulate(total)(i => jpeg(q + 17 + i) & 0xFF)
            val t = new Huff(counts, syms)
            if (tc == 0) dcT(th) = t else acT(th) = t
            q += 17 + total
          }
          p += len
        case 0xDB => // DQT (possibly several tables per segment)
          val len = u16(p)
          var q = p + 2
          while (q < p + len) {
            val pq = (jpeg(q) & 0xF0) >> 4
            val tq = jpeg(q) & 0x0F
            var i = 0
            while (i < 64) {
              val v = if (pq == 0) jpeg(q + 1 + i) & 0xFF
                      else u16(q + 1 + 2 * i)
              qt(tq)(ZigZag(i)) = v
              i += 1
            }
            q += 1 + (if (pq == 0) 64 else 128)
          }
          p += len
        case 0xDD => restartInterval = u16(p + 2); p += u16(p)
        case 0xDA => // SOS
          val len = u16(p)
          val ns = jpeg(p + 2) & 0xFF
          var i = 0
          while (i < ns) {
            val cid = jpeg(p + 3 + 2 * i) & 0xFF
            val c = comps.find(_.id == cid).getOrElse(
              throw new IllegalArgumentException(s"SOS references unknown component $cid"))
            c.td = (jpeg(p + 4 + 2 * i) & 0xF0) >> 4
            c.ta = jpeg(p + 4 + 2 * i) & 0x0F
            i += 1
          }
          sosAt = p + len
        case mk if mk >= 0xC1 && mk <= 0xCF && mk != 0xC4 && mk != 0xC8 =>
          throw new IllegalArgumentException(
            f"unsupported frame type FF$mk%02X (baseline SOF0 only)")
        case _ => p += u16(p) // APPn / COM / anything with a length
      }
    }

    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    // per-component plane at its own sampling resolution
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planeH = comps.map(c => mcusY * 8 * c.v)
    val planes = comps.indices.map(i => new Array[Byte](planeW(i) * planeH(i))).toArray

    val br = new BitReader(jpeg, sosAt)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64) // row-pass intermediate (separable IDCT)
    val out = new Array[Double](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0 && br.atRestart())
        comps.foreach(_.pred = 0)
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0)
            // DC
            val t = dcT(c.td).decode(br)
            c.pred += extend(br.bits(t), t)
            coef(0) = c.pred * qt(c.tq)(0)
            // AC
            var k = 1
            var eob = false
            var anyAc = false
            while (k < 64 && !eob) {
              val rs = acT(c.ta).decode(br)
              if (rs == 0x00) eob = true
              else if (rs == 0xF0) k += 16
              else {
                k += (rs >> 4)
                require(k < 64, "AC run past block end")
                coef(ZigZag(k)) = extend(br.bits(rs & 0x0F), rs & 0x0F) * qt(c.tq)(ZigZag(k))
                anyAc = anyAc || coef(ZigZag(k)) != 0
                k += 1
              }
            }
            if (!anyAc) {
              // the standard DC-only shortcut (libjpeg does the same):
              // the IDCT of a lone DC term is the constant DC/8
              java.util.Arrays.fill(out, coef(0) / 8.0 + 128.0)
            } else {
              // SEPARABLE IDCT (row pass then column pass — 2·8·8·8
              // mults instead of the naive 64×64), with libjpeg's
              // all-zero-row skip: rows of the coefficient grid that are
              // entirely zero contribute a constant 0 to the row pass,
              // so sparse blocks (real entropy-coded data is mostly
              // zeros after quantization) cost near the DC shortcut
              var v = 0
              while (v < 8) {
                var anyRow = false
                var u = 0
                while (u < 8 && !anyRow) { anyRow = coef(v * 8 + u) != 0; u += 1 }
                if (!anyRow) {
                  var x = 0
                  while (x < 8) { tmp(v * 8 + x) = 0.0; x += 1 }
                } else {
                  var x = 0
                  while (x < 8) {
                    var s = 0.0
                    var uu = 0
                    while (uu < 8) {
                      val cc = coef(v * 8 + uu)
                      if (cc != 0) s += C(uu) * cc * Cos(x)(uu)
                      uu += 1
                    }
                    tmp(v * 8 + x) = s
                    x += 1
                  }
                }
                v += 1
              }
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  var s = 0.0
                  var vv = 0
                  while (vv < 8) {
                    val t = tmp(vv * 8 + x)
                    if (t != 0) s += C(vv) * t * Cos(y)(vv)
                    vv += 1
                  }
                  out(y * 8 + x) = s / 4.0 + 128.0
                  x += 1
                }
                y += 1
              }
            }
            // write the block into the component plane
            val ox = (mx * c.h + bx) * 8
            val oy = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                val pix = math.rint(out(yy * 8 + xx)).toInt
                planes(ci)((oy + yy) * planeW(ci) + (ox + xx)) =
                  math.max(0, math.min(255, pix)).toByte
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    if (comps.length == 1) {
      val outPix = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        System.arraycopy(planes(0), y * planeW(0), outPix, y * width, width)
        y += 1
      }
      (width, height, 1, outPix)
    } else {
      // YCbCr → RGB with sample-replication upsampling
      val outPix = new Array[Byte](width * height * 3)
      def sample(ci: Int, x: Int, y: Int): Int = {
        val c = comps(ci)
        val sx = x * c.h / hmax
        val sy = y * c.v / vmax
        planes(ci)(sy * planeW(ci) + sx) & 0xFF
      }
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = sample(0, x, y)
          val cb = sample(1, x, y) - 128
          val cr = sample(2, x, y) - 128
          def clamp(d: Double) = math.max(0, math.min(255, math.rint(d).toInt)).toByte
          val o = (y * width + x) * 3
          outPix(o) = clamp(yy + 1.402 * cr)
          outPix(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          outPix(o + 2) = clamp(yy + 1.772 * cb)
          x += 1
        }
        y += 1
      }
      (width, height, 3, outPix)
    }
  }

  // ---- minimal DC-only encoder ------------------------------------------

  // T.81 Annex K.3.1 luminance DC table (categories 0..11)
  private val DcCounts = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcSyms = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  // K.3.2 luminance AC table prefix is overkill: the only AC symbol a
  // DC-only stream emits is EOB (0x00) — a 2-bit code keeps files tiny
  private val AcCounts = Array(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcSyms = Array(0)

  private final class BitWriter(bos: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    /** Batched append: len ≤ 16 and n < 8 on entry, so acc never
      * exceeds 24 live bits (no Int overflow); whole bytes drain with
      * 0xFF stuffing per T.81 F.1.2.3.
      */
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1 << len) - 1))
      n += len
      while (n >= 8) {
        val b = (acc >> (n - 8)) & 0xFF
        bos.write(b)
        if (b == 0xFF) bos.write(0x00) // byte stuffing
        n -= 8
      }
    }
    def flush(): Unit = if (n > 0) { put(0x7F, 8 - n); () } // 1-pad, T.81 F.1.2.3
  }

  private def canonicalCodes(counts: Array[Int], syms: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var idx = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var k = 0
      while (k < counts(l - 1)) {
        out += syms(idx) -> ((code, l))
        code += 1; idx += 1; k += 1
      }
      code <<= 1
      l += 1
    }
    out.result()
  }

  /** [[canonicalCodes]] as flat symbol-indexed arrays — the per-block
    * hot path allocates nothing (the Map form boxes a tuple per lookup).
    */
  private def canonicalCodeArrays(counts: Array[Int], syms: Array[Int]): (Array[Int], Array[Int]) = {
    val codes = new Array[Int](256)
    val lens = new Array[Int](256)
    canonicalCodes(counts, syms).foreach { case (s, (c, l)) => codes(s) = c; lens(s) = l }
    (codes, lens)
  }

  // AC table for the structured-AC encoder: EOB plus run-9 symbols
  // (9<<4)|size for size 1..8 — exactly what a lone coefficient at
  // zigzag k=10 (natural (u=0, v=4)) needs. All 9 symbols at code
  // length 4 (9 ≤ 2⁴, canonical, prefix-free).
  private val AcV4Counts = Array(0, 0, 0, 9, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcV4Syms = Array(0x00, 0x91, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98)

  /** The (u=0, v=4) basis row-sign pattern: cos((2y+1)·4π/16) =
    * ±√2/2 with signs + − − + + − − + over y — the cancellation that
    * makes the [[encodeGrayDcV4]] fixture's decode closed-form.
    */
  val V4RowSign: Array[Int] = Array(1, -1, -1, 1, 1, -1, -1, 1)

  /** Emit a baseline JPEG of `bw`×`bh` blocks carrying a DC term AND one
    * AC coefficient at zigzag k=10 — natural position (u=0, v=4) — so the
    * decode exercises the general AC Huffman + dequant + full-IDCT path
    * while staying CLOSED-FORM: with Q = 8 at both positions, the (0,4)
    * basis is constant over x and ±√2/2 over y, so
    * `pixel(x, y) = clamp(128 + dc + V4RowSign(y%8) · ac)` EXACTLY (the
    * true value is integral; float IDCT error ~1e-13 never moves
    * `rint`). `dc` ∈ [−128, 127], `ac` ∈ [−255, 255].
    */
  def encodeGrayDcV4(bw: Int, bh: Int, dc: (Int, Int) => Int,
      ac: (Int, Int) => Int): Array[Byte] = {
    require(bw > 0 && bh > 0 && bw * 8 <= 65535 && bh * 8 <= 65535,
      s"image ${bw * 8}x${bh * 8} exceeds the 16-bit SOF0 dimension fields")
    val bos = new java.io.ByteArrayOutputStream()
    def w(b: Int): Unit = bos.write(b & 0xFF)
    def w16(v: Int): Unit = { w(v >> 8); w(v) }
    def marker(m: Int): Unit = { w(0xFF); w(m) }
    marker(0xD8)
    marker(0xDB); w16(2 + 1 + 64); w(0x00)
    w(8) // Q[0] = 8 — the DC exactness contract
    var zz = 1
    while (zz < 64) { w(if (ZigZag(zz) == 32) 8 else 16); zz += 1 } // Q[(0,4)] = 8 too
    marker(0xC0); w16(8 + 3)
    w(8); w16(bh * 8); w16(bw * 8); w(1); w(1); w(0x11); w(0)
    def dht(tc: Int, counts: Array[Int], syms: Array[Int]): Unit = {
      marker(0xC4); w16(2 + 1 + 16 + syms.length); w((tc << 4) | 0)
      counts.foreach(w); syms.foreach(w)
    }
    dht(0, DcCounts, DcSyms)
    dht(1, AcV4Counts, AcV4Syms)
    marker(0xDA); w16(6 + 2); w(1); w(1); w(0x00); w(0); w(63); w(0)
    val (dcCode, dcLen) = canonicalCodeArrays(DcCounts, DcSyms)
    val (acCode, acLen) = canonicalCodeArrays(AcV4Counts, AcV4Syms)
    val bw2 = new BitWriter(bos)
    def mag(v: Int): Int = if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))
    def putMag(v: Int, t: Int): Unit =
      if (t > 0) bw2.put(if (v < 0) v + (1 << t) - 1 else v, t)
    var pred = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        val v = dc(bx, by)
        require(v >= -128 && v <= 127, s"dc out of range: $v")
        val a = ac(bx, by)
        require(a >= -255 && a <= 255, s"ac out of range: $a")
        val diff = v - pred
        pred = v
        val t = mag(diff)
        bw2.put(dcCode(t), dcLen(t))
        putMag(diff, t)
        if (a != 0) {
          val ta = mag(a) // ≤ 8 for |a| ≤ 255
          val rs = (9 << 4) | ta
          bw2.put(acCode(rs), acLen(rs))
          putMag(a, ta)
          // k=10 consumed; positions 11..63 zero → EOB
        }
        bw2.put(acCode(0x00), acLen(0x00))
        bx += 1
      }
      by += 1
    }
    bw2.flush()
    marker(0xD9)
    bos.toByteArray
  }

  /** Emit a real single-component baseline JPEG of `bw`×`bh` 8×8 blocks,
    * each block uniformly `clamp(128 + dc(bx, by))` after ANY conformant
    * decode (Q₀ = 8 makes the DC-only IDCT exact). `dc` must stay in
    * [−128, 127] (the full byte-minus-128 range; −128 decodes to pixel 0).
    */
  def encodeGrayDcOnly(bw: Int, bh: Int, dc: (Int, Int) => Int): Array[Byte] = {
    // SOF0 height/width are 16-bit fields — reject silently-truncating sizes
    require(bw > 0 && bh > 0 && bw * 8 <= 65535 && bh * 8 <= 65535,
      s"image ${bw * 8}x${bh * 8} exceeds the 16-bit SOF0 dimension fields")
    val bos = new java.io.ByteArrayOutputStream()
    def w(b: Int): Unit = bos.write(b & 0xFF)
    def w16(v: Int): Unit = { w(v >> 8); w(v) }
    def marker(m: Int): Unit = { w(0xFF); w(m) }
    marker(0xD8) // SOI
    marker(0xDB); w16(2 + 1 + 64); w(0x00) // DQT, 8-bit, table 0
    // Q[0] = 8 (the exactness contract), everything else 16 (unused)
    w(8); (1 until 64).foreach(_ => w(16))
    marker(0xC0); w16(8 + 3) // SOF0, 1 component
    w(8); w16(bh * 8); w16(bw * 8); w(1); w(1); w(0x11); w(0)
    def dht(tc: Int, counts: Array[Int], syms: Array[Int]): Unit = {
      marker(0xC4); w16(2 + 1 + 16 + syms.length); w((tc << 4) | 0)
      counts.foreach(w); syms.foreach(w)
    }
    dht(0, DcCounts, DcSyms)
    dht(1, AcCounts, AcSyms)
    marker(0xDA); w16(6 + 2); w(1); w(1); w(0x00); w(0); w(63); w(0) // SOS
    val (dcCode, dcLen) = canonicalCodeArrays(DcCounts, DcSyms)
    val (eobCode, eobLen) = canonicalCodes(AcCounts, AcSyms)(0)
    val bw2 = new BitWriter(bos)
    var pred = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        val v = dc(bx, by)
        require(v >= -128 && v <= 127, s"dc out of range: $v")
        val diff = v - pred
        pred = v
        val t = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        bw2.put(dcCode(t), dcLen(t))
        if (t > 0) bw2.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        bw2.put(eobCode, eobLen)
        bx += 1
      }
      by += 1
    }
    bw2.flush()
    marker(0xD9) // EOI
    bos.toByteArray
  }
}
