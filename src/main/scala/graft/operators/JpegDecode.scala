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

  /** Accumulate one reconstructed 8×8 block into a feature grid. `px0`/
    * `py0` are the block's top-left in COMPONENT space; each sample
    * stands for an fx×fy pixel tile and is added once at its top-left
    * upsampled position — the grid mean over samples equals the mean
    * over replicated pixels up to cell-boundary rounding (a sample whose
    * tile straddles a grid-cell boundary is attributed wholly to its
    * top-left cell, and edge samples with partially in-bounds tiles get
    * full weight; bounded by one sample row/column per cell edge, inside
    * the tolerance every consumer of this feature carries). */
  private def accumulate(tgt: Multimodal.GridLuma, pix: Array[Double],
      px0: Int, py0: Int, fx: Int, fy: Int, w: Int, h: Int): Unit = {
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
                // samples cover
                val tgt = if (isLuma) grid else if (comp == 1) cbG else crG
                accumulate(tgt, pix,
                  (mx * compH(comp) + bx) * 8, (my * compV(comp) + by) * 8,
                  hmax / compH(comp), vmax / compV(comp), w, h)
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

  // ------------------------------------------------- progressive (SOF2)

  /**
   * Progressive decode state: per-component coefficient planes (zigzag
   * index order, MCU-padded block grid) accumulated across SOS scans —
   * spectral selection fills disjoint coefficient bands, successive
   * approximation raises their precision — then finalized with ONE
   * dequant+IDCT pass per block ([[finish]]). T.81 Annex G, Huffman
   * coding only (arithmetic-coded frames never reach here — the SOF
   * dispatch rejects them). Memory is the valve the caller enforces at
   * SOF2 (Σ bW·bH·64·4 over components ≤ 48 MB — the exact size of the
   * planes allocated below, so 8 MP for 4:2:0 but 4 MP for 4:4:4): a
   * progressive image cannot stream block-by-block the way a baseline
   * scan does, coefficients only become final after the last scan.
   */
  final class ProgState(val w: Int, val h: Int, val nComp: Int,
      val compH: Array[Int], val compV: Array[Int]) {
    val hmax: Int = compH.max
    val vmax: Int = compV.max
    val mcusX: Int = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY: Int = (h + 8 * vmax - 1) / (8 * vmax)
    /** MCU-padded block-grid width/height per component (interleaved DC
      * scans address padding blocks; storage uses this stride). */
    val bW: Array[Int] = Array.tabulate(nComp)(c => mcusX * compH(c))
    val bH: Array[Int] = Array.tabulate(nComp)(c => mcusY * compV(c))
    /** used (non-padding) blocks — NON-interleaved scans traverse only
      * ceil(componentExtent/8) blocks, the classic progressive gotcha. */
    val uW: Array[Int] = Array.tabulate(nComp)(c =>
      (w * compH(c) + 8 * hmax - 1) / (8 * hmax))
    val uH: Array[Int] = Array.tabulate(nComp)(c =>
      (h * compV(c) + 8 * vmax - 1) / (8 * vmax))
    val coef: Array[Array[Int]] =
      Array.tabulate(nComp)(c => new Array[Int](bW(c) * bH(c) * 64))
    var sawDc: Boolean = false
  }

  /**
   * Decode ONE progressive scan's entropy data into `st.coef`, returning
   * the offset of the next marker's 0xFF byte (scans are followed by more
   * table/scan segments until EOI). None on any malformed construct —
   * same contract as [[scan]]. Implements the four scan kinds of T.81
   * G.2: DC first (diff-coded, point-transformed), DC refinement (one raw
   * bit per block), AC first (EOB-run coded band), AC refinement
   * (correction bits + newly-significant insertions).
   */
  def progressiveScan(p: Array[Byte], start: Int, st: ProgState,
      hufCounts: Array[Array[Array[Int]]], hufSymbols: Array[Array[Array[Int]]],
      scanComps: Array[Int], scanDc: Array[Int], scanAc: Array[Int],
      ss: Int, se: Int, ah: Int, al: Int,
      restartInterval: Int): Option[Int] = try {
    val ns = scanComps.length
    if (ss < 0 || se > 63 || ss > se || al < 0 || al > 13 || ah < 0 || ah > 13)
      return None
    if (ss == 0 && se != 0) return None // DC scans carry only coefficient 0
    if (ss > 0 && ns != 1) return None  // AC scans are single-component
    if (ah != 0 && ah != al + 1) return None // successive approx. steps by 1
    if (ss > 0 && !st.sawDc) return None // DC band must come first (G.1.1.1.1)
    val br = new BitReader(p, start)
    var eobrun = 0
    val dcPred = new Array[Int](ns)
    // Huffman tables: DC first needs a DC table; AC scans an AC table;
    // DC refinement reads raw bits only.
    val dcHuff = new Array[Huff](ns)
    var acHuff: Huff = null
    if (ss == 0 && ah == 0) {
      var c = 0
      while (c < ns) {
        if (hufCounts(0)(scanDc(c)) == null) return None
        dcHuff(c) = new Huff(hufCounts(0)(scanDc(c)), hufSymbols(0)(scanDc(c)))
        c += 1
      }
    } else if (ss > 0) {
      if (hufCounts(1)(scanAc(0)) == null) return None
      acHuff = new Huff(hufCounts(1)(scanAc(0)), hufSymbols(1)(scanAc(0)))
    }

    def decodeDc(sc: Int, base: Int): Unit =
      if (ah == 0) {
        val t = dcHuff(sc).decode(br)
        if (t > 15) throw Bad
        dcPred(sc) += extend(br.receive(t), t)
        st.coef(scanComps(sc))(base) = dcPred(sc) << al
      } else if (br.bit() == 1) st.coef(scanComps(sc))(base) |= 1 << al

    val p1 = 1 << al
    val m1 = -1 << al
    def correct(cf: Array[Int], i: Int): Unit =
      if (br.bit() == 1 && (cf(i) & p1) == 0)
        cf(i) += (if (cf(i) >= 0) p1 else m1)

    def decodeAcFirst(cf: Array[Int], base: Int): Unit =
      if (eobrun > 0) eobrun -= 1
      else {
        var k = ss
        while (k <= se) {
          val rs = acHuff.decode(br)
          val r = rs >> 4
          val s = rs & 15
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else { // EOBn: run counts THIS block
              eobrun = (1 << r) - 1 + (if (r > 0) br.receive(r) else 0)
              k = se + 1
            }
          } else {
            k += r
            if (k > se) throw Bad
            cf(base + k) = extend(br.receive(s), s) << al
            k += 1
          }
        }
      }

    def decodeAcRefine(cf: Array[Int], base: Int): Unit = {
      var k = ss
      var tail = false // correction-bits-only pass over k..se at the end
      if (eobrun > 0) {
        eobrun -= 1 // block wholly inside an EOB run: tail from Ss
        tail = true
      } else {
        var atEob = false
        while (k <= se && !atEob) {
          val rs = acHuff.decode(br)
          var r = rs >> 4
          val s = rs & 15
          var newVal = 0
          if (s == 0) {
            if (r < 15) { // EOBn (run counts THIS block — pre-decrement)
              eobrun = (1 << r) - 1 + (if (r > 0) br.receive(r) else 0)
              atEob = true
              tail = true
            }
            // r == 15: ZRL — skip 16 zero-history positions below
          } else {
            if (s != 1) throw Bad // refinement inserts only ±1<<Al
            newVal = if (br.bit() == 1) p1 else m1
          }
          if (!atEob) {
            // advance past r zero-history positions, emitting correction
            // bits for already-significant coefficients on the way, then
            // place the new value (if any) at the next zero-history slot
            var placed = false
            var scan = true
            while (k <= se && scan) {
              val i = base + k
              if (cf(i) != 0) correct(cf, i)
              else if (r == 0) {
                if (newVal != 0) { cf(i) = newVal; placed = true }
                scan = false
              } else r -= 1
              k += 1
            }
            if (newVal != 0 && !placed) throw Bad // ran off the band
          }
        }
      }
      if (tail) while (k <= se) { // remaining positions: correction bits
        val i = base + k
        if (cf(i) != 0) correct(cf, i)
        k += 1
      }
    }

    // --- traversal ---
    var units = 0
    def maybeRestart(total: Int): Unit =
      if (restartInterval > 0 && units % restartInterval == 0 && units < total) {
        br.restart()
        java.util.Arrays.fill(dcPred, 0)
        eobrun = 0
      }
    if (ss == 0 && ns > 1) {
      // interleaved DC scan: MCU order over the padded grid
      val total = st.mcusX * st.mcusY
      var my = 0
      while (my < st.mcusY) {
        var mx = 0
        while (mx < st.mcusX) {
          if (units > 0) maybeRestart(total)
          var sc = 0
          while (sc < ns) {
            val comp = scanComps(sc)
            var by = 0
            while (by < st.compV(comp)) {
              var bx = 0
              while (bx < st.compH(comp)) {
                decodeDc(sc, ((my * st.compV(comp) + by) * st.bW(comp) +
                  mx * st.compH(comp) + bx) * 64)
                bx += 1
              }
              by += 1
            }
            sc += 1
          }
          units += 1
          mx += 1
        }
        my += 1
      }
    } else {
      // non-interleaved (single-component) scan: used-block row-major
      val comp = scanComps(0)
      val cf = st.coef(comp)
      val total = st.uW(comp) * st.uH(comp)
      var by = 0
      while (by < st.uH(comp)) {
        var bx = 0
        while (bx < st.uW(comp)) {
          if (units > 0) maybeRestart(total)
          val base = (by * st.bW(comp) + bx) * 64
          if (ss == 0) decodeDc(0, base)
          else if (ah == 0) decodeAcFirst(cf, base)
          else decodeAcRefine(cf, base)
          units += 1
          bx += 1
        }
        by += 1
      }
    }
    if (ss == 0) st.sawDc = true
    // entropy data ends at the first non-stuffing, non-RST marker
    var q = br.pos
    while (q + 1 < p.length && !((p(q) & 0xFF) == 0xFF && {
      val m = p(q + 1) & 0xFF
      m != 0x00 && (m < 0xD0 || m > 0xD7)
    })) q += 1
    if (q + 1 >= p.length) None else Some(q)
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Dequantize + IDCT every used block of the accumulated coefficient
    * planes and emit the 24-dim feature — the progressive counterpart of
    * [[scan]]'s streaming tail. Same component policy: Y must carry the
    * max sampling factors; chroma transforms only for canonical
    * 3-component integer-subsampled frames. */
  def finish(st: ProgState, compQ: Array[Int],
      qt: Array[Array[Int]]): Option[(Int, Int, Array[Float])] = try {
    if (!st.sawDc) return None
    if (st.compH(0) != st.hmax || st.compV(0) != st.vmax) return None
    def chromaOk(c: Int): Boolean = st.nComp == 3 && (c == 1 || c == 2) &&
      st.hmax % st.compH(c) == 0 && st.vmax % st.compV(c) == 0
    val grid = new Multimodal.GridLuma(st.w, st.h)
    val cbG = Multimodal.chromaGrid(st.w, st.h)
    val crG = Multimodal.chromaGrid(st.w, st.h)
    val (coefNat, pix) = newScratch()
    var c = 0
    while (c < st.nComp) {
      if (c == 0 || chromaOk(c)) {
        if (compQ(c) > 3 || qt(compQ(c)) == null) return None
        val qtab = qt(compQ(c))
        val cf = st.coef(c)
        val tgt = if (c == 0) grid else if (c == 1) cbG else crG
        val fx = st.hmax / st.compH(c)
        val fy = st.vmax / st.compV(c)
        var by = 0
        while (by < st.uH(c)) {
          var bx = 0
          while (bx < st.uW(c)) {
            val base = (by * st.bW(c) + bx) * 64
            var k = 0
            while (k < 64) {
              coefNat(ZigZag(k)) = cf(base + k).toDouble * qtab(k)
              k += 1
            }
            idct(coefNat, pix)
            accumulate(tgt, pix, bx * 8, by * 8, fx, fy, st.w, st.h)
            bx += 1
          }
          by += 1
        }
      }
      c += 1
    }
    Some((st.w, st.h, Multimodal.imageFeature(grid, cbG, crG)))
  } catch { case scala.util.control.NonFatal(_) => None }
}
