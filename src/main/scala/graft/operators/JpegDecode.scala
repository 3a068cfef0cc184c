package graft.operators

/**
 * Baseline-JPEG entropy scan for [[Multimodal.decodeJpeg]]: canonical
 * Huffman decode (ITU-T T.81 §F.2.2 algebra — mincode/maxcode/valptr),
 * 0xFF00 byte-unstuffing, DRI/RSTn restart handling, dequantization,
 * separable 8-point float IDCT, and grid accumulation of Y (4×4) plus,
 * for 3-component YCbCr frames whose sampling factors divide the max
 * (4:4:4/4:2:2/4:2:0 — every real encoder), Cb and Cr (2×2 each, at
 * their upsampled pixel positions). Components that do not qualify are
 * still Huffman-decoded to advance the bitstream, and a frame without
 * chroma (grayscale) leaves the chroma grids at neutral gray — an
 * achromatic image features identically with or without stored chroma
 * planes. Any malformed construct —
 * over-long Huffman code, marker inside entropy data, coefficient index
 * past 63, truncation — raises and is caught at the boundary, returning
 * None so the caller degrades to the stub path (the untrusted-payload
 * contract shared by the BMP/PNG/WAV decoders).
 */
private[operators] object JpegDecode {

  /** zigzag position k → natural (row-major) position. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private object Bad extends RuntimeException("malformed jpeg") {
    override def fillInStackTrace(): Throwable = this
  }

  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    private val maxcode = new Array[Int](17)
    private val mincode = new Array[Int](17)
    private val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valptr(l) = k
        mincode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxcode(l) = if (counts(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.bit()
      var l = 1
      while (l < 17 && (maxcode(l) < 0 || code > maxcode(l))) {
        code = (code << 1) | br.bit()
        l += 1
      }
      if (l >= 17) throw Bad
      val idx = valptr(l) + code - mincode(l)
      if (code < mincode(l) || idx >= symbols.length) throw Bad
      symbols(idx)
    }
  }

  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= p.length) throw Bad
        val b = p(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          if (pos >= p.length) throw Bad
          if ((p(pos) & 0xFF) == 0x00) pos += 1 // stuffed data byte
          else throw Bad // a real marker inside entropy data
        }
        acc = b
        nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** byte-align, scan to the next RSTn (skipping the pad byte's
      * possible 0xFF00 stuffing), consume it, reset the bit buffer. */
    def restart(): Unit = {
      nbits = 0
      while (pos + 1 < p.length &&
        !((p(pos) & 0xFF) == 0xFF && (p(pos + 1) & 0xFF) != 0x00)) pos += 1
      if (pos + 1 >= p.length) throw Bad
      val m = p(pos + 1) & 0xFF
      if (m < 0xD0 || m > 0xD7) throw Bad
      pos += 2
    }
  }

  /** EXTEND (T.81 F.12): map the n-bit magnitude v to its signed value. */
  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  private val idctCos: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        t(u * 8 + x) = cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }

  /** separable 2-D IDCT of one dequantized block (natural order). */
  private def idct(coef: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: over u
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += coef(y * 8 + u) * idctCos(u * 8 + x); u += 1 }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) { // columns: over v
      var y2 = 0
      while (y2 < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += tmp(v * 8 + x) * idctCos(v * 8 + y2); v += 1 }
        out(y2 * 8 + x) = s / 2.0
        y2 += 1
      }
      x += 1
    }
  }

  // scratch reused across blocks (driver/executor thread-local by task)
  private def newScratch() = (new Array[Double](64), new Array[Double](64))

  /** Entropy scan entry — see [[Multimodal.decodeJpeg]] for the contract. */
  def scan(p: Array[Byte], start: Int, w: Int, h: Int, nComp: Int,
      compH: Array[Int], compV: Array[Int], compQ: Array[Int],
      qt: Array[Array[Int]],
      hufCounts: Array[Array[Array[Int]]], hufSymbols: Array[Array[Array[Int]]],
      scanComps: Array[Int], scanDc: Array[Int], scanAc: Array[Int],
      restartInterval: Int): Option[(Int, Int, Array[Float])] = try {
    val hmax = compH.max
    val vmax = compV.max
    // luma must carry the max sampling factors (true of every real
    // encoder's Y plane) — its blocks then map 1:1 onto pixel tiles
    if (compH(0) != hmax || compV(0) != vmax) return None
    // chroma transforms only for the canonical 3-component YCbCr frame
    // whose subsampling divides the max factors (integer upsampling);
    // anything else keeps the entropy-advance-only treatment
    def chromaOk(c: Int): Boolean = nComp == 3 && (c == 1 || c == 2) &&
      hmax % compH(c) == 0 && vmax % compV(c) == 0
    val ns = scanComps.length
    val dcHuff = new Array[Huff](ns)
    val acHuff = new Array[Huff](ns)
    var c = 0
    while (c < ns) {
      if (hufCounts(0)(scanDc(c)) == null || hufCounts(1)(scanAc(c)) == null)
        return None
      dcHuff(c) = new Huff(hufCounts(0)(scanDc(c)), hufSymbols(0)(scanDc(c)))
      acHuff(c) = new Huff(hufCounts(1)(scanAc(c)), hufSymbols(1)(scanAc(c)))
      if (qt(compQ(scanComps(c))) == null) return None
      c += 1
    }
    val br = new BitReader(p, start)
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val dcPred = new Array[Int](ns)
    val (coef, pix) = newScratch()
    val grid = new Multimodal.GridLuma(w, h)
    val cbG = Multimodal.chromaGrid(w, h)
    val crG = Multimodal.chromaGrid(w, h)
    var rstCountdown = if (restartInterval > 0) restartInterval else -1
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var sc = 0
        while (sc < ns) {
          val comp = scanComps(sc)
          val qtab = qt(compQ(comp))
          var by = 0
          while (by < compV(comp)) {
            var bx = 0
            while (bx < compH(comp)) {
              // ---- decode one block ----
              val isLuma = comp == 0
              val wantIdct = isLuma || chromaOk(comp)
              if (wantIdct) java.util.Arrays.fill(coef, 0.0)
              val t = dcHuff(sc).decode(br)
              if (t > 15) throw Bad
              val diff = extend(br.receive(t), t)
              dcPred(sc) += diff
              if (wantIdct) coef(0) = dcPred(sc).toDouble * qtab(0)
              var k = 1
              while (k < 64) {
                val rs = acHuff(sc).decode(br)
                val r = rs >> 4
                val s = rs & 15
                if (s == 0) {
                  if (r == 15) k += 16 else k = 64 // ZRL / EOB
                } else {
                  k += r
                  if (k > 63) throw Bad
                  val v = extend(br.receive(s), s)
                  if (wantIdct) coef(ZigZag(k)) = v.toDouble * qtab(k)
                  k += 1
                }
              }
              if (wantIdct) {
                idct(coef, pix)
                // accumulate reconstructed samples: Y at its 1:1 pixel
                // tile, chroma at the integer-upsampled positions its
                // samples cover (each sample stands for an fx×fy tile;
                // the grid mean over samples equals the mean over the
                // replicated pixels up to cell-boundary rounding)
                val tgt = if (isLuma) grid else if (comp == 1) cbG else crG
                val fx = hmax / compH(comp)
                val fy = vmax / compV(comp)
                val px0 = (mx * compH(comp) + bx) * 8
                val py0 = (my * compV(comp) + by) * 8
                var yy = 0
                while (yy < 8) {
                  val py = (py0 + yy) * fy
                  if (py < h) {
                    var xx = 0
                    while (xx < 8) {
                      val px = (px0 + xx) * fx
                      if (px < w) {
                        val v = pix(yy * 8 + xx) + 128.0
                        tgt.add(px, py, math.max(0.0, math.min(255.0, v)))
                      }
                      xx += 1
                    }
                  }
                  yy += 1
                }
              }
              bx += 1
            }
            by += 1
          }
          sc += 1
        }
        if (rstCountdown > 0) {
          rstCountdown -= 1
          val last = my == mcusY - 1 && mx == mcusX - 1
          if (rstCountdown == 0 && !last) {
            br.restart()
            java.util.Arrays.fill(dcPred, 0)
            rstCountdown = restartInterval
          }
        }
        mx += 1
      }
      my += 1
    }
    Some((w, h, Multimodal.imageFeature(grid, cbG, crG)))
  } catch { case scala.util.control.NonFatal(_) => None }
}
