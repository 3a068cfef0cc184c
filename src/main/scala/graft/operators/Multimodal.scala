package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Quantize

/**
 * Multimodal (image/audio/video) column handling: payloads are opaque
 * `binary` columns traveling WITH typed metadata; decode / feature-extract /
 * resize / frame-sample run as partition-batched typed transformations.
 *
 * Decode is REAL for the codec-library-free formats: 24-bit uncompressed
 * BMP ([[decodeBmp]]) and 16-bit PCM WAV ([[decodeWav]]) are pure byte
 * layouts, and non-interlaced 8-bit PNG ([[decodePng]]) is zlib
 * (JDK-standard `Inflater`) plus four integer row filters — so images
 * yield genuine 4×4-grid luminance features and audio genuine per-segment
 * RMS envelopes, content-derived embeddings the similarity/dedup operators
 * consume directly — and JPEG ([[decodeJpeg]]), both baseline SOF0 and
 * progressive SOF2 (Huffman only), is Huffman tables + an 8-point IDCT,
 * pure math over bytes, with Y and (for canonical YCbCr layouts) Cb/Cr
 * planes feeding the 24-dim grid feature. Payloads
 * that genuinely need a codec library (video containers, MP3/…, plus
 * arithmetic-coded/lossless/hierarchical JPEG modes) fall back to a
 * clearly-marked deterministic STUB (`fakeDecode`, `decoder = "stub"`):
 * those libraries don't exist in this container, and in production only
 * that branch changes — everything around it, including the contract that
 * decode happens once per partition-batch with bounded memory, stays.
 *
 * Scale notes: payload bytes dominate IO, so (1) metadata-only queries must
 * never touch the binary column — parquet column pruning guarantees that
 * when decode stays out of the projection; (2) decode is mapPartitions, not
 * per-row UDF, so per-batch init cost (real codecs are expensive to open)
 * amortizes; (3) partition sizing by `maxPartitionBytes` keeps a batch's
 * decoded frames in executor memory.
 */
object Multimodal {

  /** Input row: binary payload + typed metadata (fixtures `media` table). */
  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int, doc_ref: String)

  /** Extracted features: one row per media item (images: 24-dim —
    * [[imageFeature]]'s luma+chroma grids; audio: 16-dim envelope,
    * zero-padded). `decoder` records which
    * path produced the feature — "bmp" / "png" / "jpeg" /
    * "jpeg-progressive" / "wav" / "avi-mjpeg" (real
    * content decode) or "stub" (codec-bound payload, deterministic
    * fake). */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, checksum: Long,
      thumb_w: Int, thumb_h: Int, frames_sampled: Int, decoder: String,
      feature: Array[Float])

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  /**
   * The one shared 4×4 grid-luminance accumulator behind every image
   * decoder's 16-dim feature (BMP/PNG/JPEG), so the feature algebra —
   * cell geometry, mean, /255 normalization — has exactly one
   * implementation and cross-decoder feature compatibility is structural.
   * Double sums are exact for the integer lumas BMP/PNG feed (sums stay
   * far below 2^53) and native for JPEG's fractional reconstructed Y.
   */
  private[operators] final class GridLuma(w: Int, h: Int, g: Int = 4,
      neutral: Double = 0.0) {
    private val sums = new Array[Double](g * g)
    private val counts = new Array[Long](g * g)
    def add(x: Int, y: Int, luma: Double): Unit = {
      val cell = math.min(g - 1, y * g / h) * g + math.min(g - 1, x * g / w)
      sums(cell) += luma
      counts(cell) += 1
    }
    def feature(): Array[Float] = Array.tabulate(g * g)(c =>
      if (counts(c) == 0) (neutral / 255.0).toFloat
      else (sums(c) / counts(c) / 255.0).toFloat)
  }

  /** The 24-dim image feature: 4×4 grid mean luminance (dims 0-15) +
    * 2×2 grid mean Cb (16-19) + 2×2 grid mean Cr (20-23), all /255.
    * Chroma grids default to NEUTRAL gray (128/255) when a source has no
    * chroma (grayscale JPEG/PNG) so an achromatic image looks the same
    * whether its container stored color planes or not. */
  private[operators] def chromaGrid(w: Int, h: Int): GridLuma =
    new GridLuma(w, h, g = 2, neutral = 128.0)

  private[operators] def imageFeature(luma: GridLuma, cb: GridLuma,
      cr: GridLuma): Array[Float] = luma.feature() ++ cb.feature() ++ cr.feature()

  /** JFIF floating-point Cb/Cr of an RGB pixel (128-centered). */
  private[operators] def jfifCb(r: Int, g: Int, b: Int): Double =
    128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
  private[operators] def jfifCr(r: Int, g: Int, b: Int): Double =
    128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

  /** Integer BT.601 luma used by the RGB-source decoders (BMP/PNG). */
  private[operators] def bt601(r: Int, g: Int, b: Int): Int =
    (r * 299 + g * 587 + b * 114) / 1000

  /**
   * REAL decode of a 24-bit uncompressed BMP (pure byte layout — 14-byte
   * file header, 40-byte info header, bottom-up BGR rows padded to 4
   * bytes; top-down negative-height variant handled). Returns (width,
   * height, 16-dim feature) — the feature is the mean LUMINANCE of a 4×4
   * spatial grid (integer BT.601 weights, /255), i.e. an actual coarse
   * thumbnail of the image content. None when the payload isn't a
   * plain 24-bit BMP (wrong magic, compressed, other depth).
   */
  def decodeBmp(p: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    if (p.length < 54 || p(0) != 'B' || p(1) != 'M') return None
    val pixOff = leInt(p, 10)
    val w = leInt(p, 18)
    val hRaw = leInt(p, 22)
    val h = math.abs(hRaw)
    val bpp = leShort(p, 28)
    val comp = leInt(p, 30)
    // h <= 0 also rejects hRaw = Int.MinValue, whose math.abs is itself
    // negative and would otherwise skip the pixel loop yet report success.
    if (bpp != 24 || comp != 0 || w <= 0 || h <= 0) return None
    // Header ints are UNTRUSTED: a negative pixOff or a w near 2^31/3 must
    // not slip past the size check via Int overflow (sum/rowSize wrapping
    // negative would pass the `>` and then blow up in the pixel loop), so
    // bound both and keep the row-size arithmetic in Long. w ≤ len/3 also
    // guarantees rowSize fits an Int for the loop below.
    if (pixOff < 54 || w > p.length / 3) return None
    val rowSize = (((w.toLong * 3) + 3) / 4 * 4).toInt
    if (pixOff.toLong + rowSize.toLong * h > p.length) return None
    val grid = new GridLuma(w, h)
    val cbG = chromaGrid(w, h)
    val crG = chromaGrid(w, h)
    var y = 0
    while (y < h) {
      // bottom-up storage unless height was negative (top-down)
      val srcRow = if (hRaw > 0) h - 1 - y else y
      val base = pixOff + srcRow * rowSize
      var x = 0
      while (x < w) {
        val o = base + x * 3
        val b = p(o) & 0xFF; val g = p(o + 1) & 0xFF; val r = p(o + 2) & 0xFF
        grid.add(x, y, bt601(r, g, b))
        cbG.add(x, y, jfifCb(r, g, b))
        crG.add(x, y, jfifCr(r, g, b))
        x += 1
      }
      y += 1
    }
    Some((w, h, imageFeature(grid, cbG, crG)))
  }

  /**
   * REAL decode of a 16-bit PCM WAV (RIFF/WAVE chunk walk to `fmt ` and
   * `data`; mono or interleaved multi-channel). Returns (sampleRate,
   * nSamples, 16-dim feature) — the feature is the RMS amplitude of 16
   * equal temporal segments (/32768), i.e. the actual loudness envelope
   * of the audio. None for anything but uncompressed 16-bit PCM.
   */
  def decodeWav(p: Array[Byte]): Option[(Int, Long, Array[Float])] = {
    if (p.length < 44 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F' ||
      p(8) != 'W' || p(9) != 'A' || p(10) != 'V' || p(11) != 'E') return None
    // Chunk sizes are UNTRUSTED: walk with a Long cursor so a large
    // positive sz (e.g. 0x7FFFFFF0) can't overflow the bounds check or
    // wrap `off` negative — any overshoot just fails the loop guard.
    var off = 12L
    var rate = -1
    var bits = -1
    var fmt = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= p.length && (rate < 0 || dataOff < 0)) {
      val o = off.toInt
      val id = new String(p, o, 4, "US-ASCII")
      val sz = leInt(p, o + 4)
      if (sz < 0 || off + 8 + sz > p.length) return None
      if (id == "fmt " && sz >= 16) {
        fmt = leShort(p, o + 8)
        rate = leInt(p, o + 12)
        bits = leShort(p, o + 22)
      } else if (id == "data") { dataOff = o + 8; dataLen = sz }
      off += 8L + sz + (sz & 1) // chunks are word-aligned
    }
    if (fmt != 1 || bits != 16 || rate <= 0 || dataOff < 0 || dataLen < 2) return None
    val n = dataLen / 2
    val sumSq = new Array[Double](16)
    val cnt = new Array[Long](16)
    var i = 0
    while (i < n) {
      val s = (leShort(p, dataOff + i * 2) << 16) >> 16 // sign-extend
      val seg = math.min(15, (i.toLong * 16 / n).toInt)
      sumSq(seg) += s.toDouble * s
      cnt(seg) += 1
      i += 1
    }
    val feat = Array.tabulate(16)(c =>
      if (cnt(c) == 0) 0f else (math.sqrt(sumSq(c) / cnt(c)) / 32768.0).toFloat)
    Some((rate, n.toLong, feat))
  }

  /**
   * REAL decode of a non-interlaced 8-bit PNG (gray / RGB / RGBA). PNG is
   * the one common image format reachable WITHOUT a codec library: the
   * container is length-typed chunks, the pixel stream is zlib
   * (`java.util.zip.Inflater`, JDK-standard) and four per-row byte filters
   * (Sub/Up/Average/Paeth — pure integer arithmetic). Returns (width,
   * height, 16-dim feature) — the same 4×4 grid mean-luminance thumbnail
   * [[decodeBmp]] produces, so BMP and PNG payloads of the same pixels
   * yield the same feature. None for anything this layout can't express
   * (interlaced, palette, 16-bit, truncated/corrupt stream).
   *
   * All header ints are UNTRUSTED (same contract as the BMP/WAV decoders):
   * the chunk walk uses a Long cursor, dimensions are bounded by a decode-
   * size valve before allocation, and a malformed deflate stream returns
   * None rather than throwing.
   */
  def decodePng(p: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    if (p.length < 45 || (p(0) & 0xFF) != 0x89 || p(1) != 'P' || p(2) != 'N' ||
      p(3) != 'G' || p(4) != 0x0D || p(5) != 0x0A || p(6) != 0x1A || p(7) != 0x0A)
      return None
    def beInt(off: Int): Int =
      ((p(off) & 0xFF) << 24) | ((p(off + 1) & 0xFF) << 16) |
        ((p(off + 2) & 0xFF) << 8) | (p(off + 3) & 0xFF)
    var off = 8L
    var w = -1; var h = -1; var channels = -1
    val idat = new java.io.ByteArrayOutputStream()
    var ended = false
    while (!ended && off + 12 <= p.length) {
      val o = off.toInt
      val len = beInt(o)
      if (len < 0 || off + 12 + len > p.length) return None
      val typ = new String(p, o + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          if (len < 13) return None
          w = beInt(o + 8); h = beInt(o + 12)
          val depth = p(o + 16) & 0xFF
          val color = p(o + 17) & 0xFF
          val interlace = p(o + 20) & 0xFF
          channels = color match { case 0 => 1; case 2 => 3; case 6 => 4; case _ => -1 }
          if (depth != 8 || channels < 0 || interlace != 0 || w <= 0 || h <= 0) return None
          // decode-size valve: never allocate more than 64 MiB of raw
          // scanlines off untrusted dimensions
          if (w.toLong * h * channels + h > (64L << 20)) return None
        case "IDAT" => idat.write(p, o + 8, len)
        case "IEND" => ended = true
        case _ => ()
      }
      off += 12L + len
    }
    if (w <= 0 || channels < 0 || idat.size() == 0) return None
    val stride = w * channels
    val raw = new Array[Byte](h * (1 + stride))
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None // truncated
        got += n
      }
      if (got < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // per-row de-filter + grid-luma accumulate in one pass (prev = the
    // RECONSTRUCTED previous row, per the PNG filter spec)
    val grid = new GridLuma(w, h)
    val cbG = chromaGrid(w, h)
    val crG = chromaGrid(w, h)
    val prev = new Array[Byte](stride)
    val cur = new Array[Byte](stride)
    var y = 0
    while (y < h) {
      val base = y * (1 + stride)
      val ft = raw(base) & 0xFF
      if (ft > 4) return None
      var i = 0
      while (i < stride) {
        val x = raw(base + 1 + i) & 0xFF
        val a = if (i >= channels) cur(i - channels) & 0xFF else 0
        val b = prev(i) & 0xFF
        val r = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + ((a + b) >> 1)
          case _ =>
            val c = if (i >= channels) prev(i - channels) & 0xFF else 0
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        cur(i) = (r & 0xFF).toByte
        i += 1
      }
      var px = 0
      while (px < w) {
        val o = px * channels
        if (channels == 1) grid.add(px, y, cur(o) & 0xFF)
        else {
          val r = cur(o) & 0xFF; val g = cur(o + 1) & 0xFF; val b = cur(o + 2) & 0xFF
          grid.add(px, y, bt601(r, g, b))
          cbG.add(px, y, jfifCb(r, g, b))
          crG.add(px, y, jfifCr(r, g, b))
        }
        px += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    Some((w, h, imageFeature(grid, cbG, crG)))
  }

  /**
   * REAL decode of a baseline JPEG (JFIF/EXIF container, SOF0
   * sequential DCT, 8-bit, Huffman — the overwhelming majority of
   * real-world JPEGs). Y is inverse-transformed into the 4×4 luminance
   * grid, and for canonical 3-component YCbCr frames with integer
   * subsampling (4:4:4/4:2:2/4:2:0) Cb and Cr are inverse-transformed
   * into the 2×2 chroma grids at their upsampled positions — so two
   * images with identical luminance but different color no longer
   * feature identically. Other component layouts (CMYK, fractional
   * sampling) keep entropy-advance-only chroma treatment, and grayscale
   * frames leave the chroma grids neutral. Everything is pure math on
   * bytes — canonical
   * Huffman tables from DHT, dequantization from DQT, a separable 8-point
   * float IDCT, 0xFF00 byte-unstuffing, DRI/RSTn restart handling — so no
   * codec library is involved, meeting the same standard as the
   * BMP/PNG/WAV decoders. Returns (width, height, 24-dim feature):
   * 16 luma grid cells + 4 Cb + 4 Cr ([[imageFeature]]), /255 like the
   * other decoders.
   *
   * PROGRESSIVE (SOF2, Huffman) frames decode too: the marker walk keeps
   * consuming table/scan segments after each SOS, [[JpegDecode
   * .progressiveScan]] accumulates every scan's band into per-component
   * coefficient planes (spectral selection + successive approximation,
   * DC and AC first/refinement passes, EOB runs, restart markers), and
   * EOI triggers the single dequant+IDCT finalization ([[JpegDecode
   * .finish]]). None for anything outside both layouts (arithmetic
   * coding, lossless/hierarchical SOFs, 12-bit, truncated/corrupt
   * streams) — and, per the untrusted-header contract, sizes are valved
   * before allocation (tighter for progressive, whose coefficient
   * planes must live until the last scan).
   */
  def decodeJpeg(p: Array[Byte]): Option[(Int, Int, Array[Float])] =
    decodeJpegImpl(p).map { case (_, w, h, f) => (w, h, f) }

  /** [[decodeJpeg]] plus the decode-path tag ("jpeg" for baseline SOF0,
    * "jpeg-progressive" for SOF2) — the `decoder` column's source. */
  def decodeJpegTagged(p: Array[Byte]): Option[(String, Int, Int, Array[Float])] =
    decodeJpegImpl(p).map { case (prog, w, h, f) =>
      (if (prog) "jpeg-progressive" else "jpeg", w, h, f) }

  private def decodeJpegImpl(p: Array[Byte]): Option[(Boolean, Int, Int, Array[Float])] = {
    if (p.length < 4 || (p(0) & 0xFF) != 0xFF || (p(1) & 0xFF) != 0xD8) return None
    // --- marker walk: collect DQT/DHT/SOF0|SOF2/DRI until SOS ---
    val qt = new Array[Array[Int]](4)
    // huffman tables: (class 0=DC/1=AC)(id) -> (maxcode/valptr decode arrays)
    val hufCounts = Array.ofDim[Array[Int]](2, 4)
    val hufSymbols = Array.ofDim[Array[Int]](2, 4)
    var w = -1; var h = -1
    var nComp = 0
    var compId: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var restartInterval = 0
    var off = 2
    var sosAt = -1
    var scanComps: Array[Int] = null // component index per scan order
    var scanDc: Array[Int] = null
    var scanAc: Array[Int] = null
    var progressive = false
    var prog: JpegDecode.ProgState = null
    while (sosAt < 0) {
      if (off + 2 > p.length) return None
      if ((p(off) & 0xFF) != 0xFF) return None
      val marker = p(off + 1) & 0xFF
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) { off += 2 }
      else if (marker == 0xD9) {
        // EOI: a progressive frame finalizes here (baseline returns at
        // its single SOS; EOI-before-SOS on baseline falls to the case
        // below and returns None via the 0xD9 arm)
        return if (progressive && prog != null)
          JpegDecode.finish(prog, compQ, qt).map { case (w2, h2, f) =>
            (true, w2, h2, f) }
        else None
      }
      else {
        if (off + 4 > p.length) return None
        val len = ((p(off + 2) & 0xFF) << 8) | (p(off + 3) & 0xFF)
        if (len < 2 || off + 2 + len > p.length) return None
        val seg = off + 4
        val segEnd = off + 2 + len
        marker match {
          case 0xC0 | 0xC2 => // SOF0 baseline / SOF2 progressive (Huffman)
            if (w >= 0) return None // second frame header
            progressive = marker == 0xC2
            if (len < 8) return None
            if ((p(seg) & 0xFF) != 8) return None // bit depth
            h = ((p(seg + 1) & 0xFF) << 8) | (p(seg + 2) & 0xFF)
            w = ((p(seg + 3) & 0xFF) << 8) | (p(seg + 4) & 0xFF)
            nComp = p(seg + 5) & 0xFF
            if (w <= 0 || h <= 0 || nComp < 1 || nComp > 4) return None
            // raw decode-size valve (baseline streams block-by-block, so
            // pixel count bounds its memory; progressive gets an exact
            // plane-byte valve below once sampling factors are known)
            if (w.toLong * h > (64L << 20)) return None
            if (seg + 6 + nComp * 3 > segEnd) return None
            compId = new Array[Int](nComp); compH = new Array[Int](nComp)
            compV = new Array[Int](nComp); compQ = new Array[Int](nComp)
            var c = 0
            while (c < nComp) {
              compId(c) = p(seg + 6 + c * 3) & 0xFF
              val hv = p(seg + 7 + c * 3) & 0xFF
              compH(c) = hv >> 4; compV(c) = hv & 0xF
              if (compH(c) < 1 || compH(c) > 4 || compV(c) < 1 || compV(c) > 4) return None
              compQ(c) = p(seg + 8 + c * 3) & 0xFF
              c += 1
            }
            if (progressive) {
              // EXACT coefficient-plane valve: progressive planes live
              // until the last scan, and their size depends on the
              // sampling layout, not just pixel count (4:2:0 → ~6 B/px,
              // 4:4:4 → ~12 B/px). Mirror ProgState's MCU-padded grid
              // (Σ bW·bH·64·4 over components) and cap the sum at 48 MB
              // — 8 MP for 4:2:0 (the prior cap's intent), 4 MP for a
              // non-subsampled frame.
              val hmax = compH.max; val vmax = compV.max
              val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
              val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
              var planeBytes = 0L
              var pc = 0
              while (pc < nComp) {
                planeBytes +=
                  mcusX.toLong * compH(pc) * mcusY * compV(pc) * 64L * 4L
                pc += 1
              }
              if (planeBytes > (48L << 20)) return None
            }
          case 0xC1 => return None // extended sequential: not baseline
          case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
               0xCD | 0xCE | 0xCF => return None // lossless/arithmetic/…
          case 0xDB => // DQT
            var q = seg
            while (q < segEnd) {
              val pq = (p(q) & 0xFF) >> 4
              val tq = p(q) & 0xF
              if (tq > 3) return None
              if (pq == 0) {
                if (q + 65 > segEnd) return None
                qt(tq) = Array.tabulate(64)(i => p(q + 1 + i) & 0xFF)
                q += 65
              } else { // 16-bit table
                if (q + 129 > segEnd) return None
                qt(tq) = Array.tabulate(64)(i =>
                  ((p(q + 1 + i * 2) & 0xFF) << 8) | (p(q + 2 + i * 2) & 0xFF))
                q += 129
              }
            }
          case 0xC4 => // DHT
            var q = seg
            while (q < segEnd) {
              val tc = (p(q) & 0xFF) >> 4
              val th = p(q) & 0xF
              if (tc > 1 || th > 3) return None
              if (q + 17 > segEnd) return None
              val counts = Array.tabulate(16)(i => p(q + 1 + i) & 0xFF)
              val total = counts.sum
              if (total > 256 || q + 17 + total > segEnd) return None
              hufCounts(tc)(th) = counts
              hufSymbols(tc)(th) = Array.tabulate(total)(i => p(q + 17 + i) & 0xFF)
              q += 17 + total
            }
          case 0xDD => // DRI
            if (len < 4) return None
            restartInterval = ((p(seg) & 0xFF) << 8) | (p(seg + 1) & 0xFF)
          case 0xDA => // SOS
            if (w < 0) return None
            // len == 2 makes seg == segEnd (possibly == p.length): the ns
            // read below would be out of bounds, so bound it first.
            if (seg >= segEnd) return None
            val ns = p(seg) & 0xFF
            // baseline: one interleaved scan of every component;
            // progressive: any non-empty subset (AC scans: exactly one)
            if (ns < 1 || ns > nComp || (!progressive && ns != nComp) ||
              seg + 1 + ns * 2 + 3 > segEnd) return None
            scanComps = new Array[Int](ns)
            scanDc = new Array[Int](ns)
            scanAc = new Array[Int](ns)
            var c = 0
            while (c < ns) {
              val cs = p(seg + 1 + c * 2) & 0xFF
              val idx = compId.indexOf(cs)
              if (idx < 0) return None
              scanComps(c) = idx
              val tt = p(seg + 2 + c * 2) & 0xFF
              scanDc(c) = tt >> 4; scanAc(c) = tt & 0xF
              c += 1
            }
            if (progressive) {
              // spectral selection + successive approximation, then the
              // scan's entropy data; the walk resumes at the marker the
              // scan decoder stops on (more tables/scans until EOI)
              val ss = p(seg + 1 + ns * 2) & 0xFF
              val se = p(seg + 2 + ns * 2) & 0xFF
              val aa = p(seg + 3 + ns * 2) & 0xFF
              if (prog == null)
                prog = new JpegDecode.ProgState(w, h, nComp, compH, compV)
              JpegDecode.progressiveScan(p, segEnd, prog, hufCounts,
                hufSymbols, scanComps, scanDc, scanAc, ss, se,
                aa >> 4, aa & 0xF, restartInterval) match {
                case Some(next) => off = next
                case None => return None
              }
            } else sosAt = segEnd
          case _ => () // APPn/COM/…: skip
        }
        // a progressive SOS arm already advanced `off` past its entropy
        // data; every other still-walking marker steps to its segment end
        if (sosAt < 0 && marker != 0xDA) off = segEnd
      }
    }
    JpegDecode.scan(p, sosAt, w, h, nComp, compH, compV, compQ,
      qt, hufCounts, hufSymbols, scanComps, scanDc, scanAc, restartInterval)
      .map { case (w2, h2, f) => (false, w2, h2, f) }
  }

  /**
   * REAL parse of an MPEG-1 Layer III (MP3) stream — headers and side
   * info only, which is pure byte/bit arithmetic: the frame-sync walk
   * (11-bit sync, bitrate/samplerate tables → frame sizes) counts
   * frames and granules, and each granule's `global_gain` — the
   * logarithmic amplitude the decoder would scale that granule by —
   * is read from the side info at its FIXED bit offset (Layer III side
   * info is exactly 59 bits per granule-channel: 12+9+8 before
   * global_gain, then 4+1+22+3 after, both window branches 22 bits).
   *
   * Returns (sampleRate, nFrames, 16-dim feature): the feature is the
   * mean `global_gain/255` over 16 equal temporal segments of the
   * granule sequence — a REAL loudness envelope derived from content
   * (global_gain IS the granule's amplitude, log-domain), comparable in
   * role to the WAV segment-RMS envelope. This is deliberately NOT a
   * PCM reconstruction: Huffman spectral data, IMDCT and the synthesis
   * filterbank stay out of scope (the honest boundary the
   * `decoder = "mp3-sideinfo"` tag records). Skips an ID3v2 tag,
   * resyncs across junk bytes, tolerates a truncated final frame, and
   * requires ≥ 2 clean consecutive frames so random bytes can't
   * masquerade as MP3. CRC-protected frames (protection bit 0) skip the
   * 2 CRC bytes before side info.
   */
  def parseMp3(p: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    // MPEG-1 Layer III tables
    val bitrates = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320, 0) // kbit/s
    val srates = Array(44100, 48000, 32000, 0)
    var off = 0L
    // ID3v2: "ID3" + ver(2) + flags(1) + syncsafe size(4)
    if (p.length >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3') {
      val sz = ((p(6) & 0x7F) << 21) | ((p(7) & 0x7F) << 14) |
        ((p(8) & 0x7F) << 7) | (p(9) & 0x7F)
      off = 10L + sz
    }
    val gains = scala.collection.mutable.ArrayBuffer.empty[Int]
    var nFrames = 0
    var rate = -1
    var run = 0    // consecutive clean frames (anti-false-sync)
    var maxRun = 0
    while (off + 4 <= p.length) {
      val o = off.toInt
      val h1 = p(o) & 0xFF; val h2 = p(o + 1) & 0xFF
      val sync = h1 == 0xFF && (h2 & 0xE0) == 0xE0
      val version = (h2 >> 3) & 3   // 3 = MPEG-1
      val layer = (h2 >> 1) & 3     // 1 = Layer III
      val noCrc = (h2 & 1) == 1
      val h3 = p(o + 2) & 0xFF
      val brIdx = (h3 >> 4) & 0xF
      val srIdx = (h3 >> 2) & 3
      val padding = (h3 >> 1) & 1
      val mode = ((p(o + 3) & 0xFF) >> 6) & 3
      val mono = mode == 3
      if (sync && version == 3 && layer == 1 && bitrates(brIdx) > 0 &&
        srates(srIdx) > 0) {
        val frameLen = 144 * bitrates(brIdx) * 1000 / srates(srIdx) + padding
        val sideLen = if (mono) 17 else 32
        val crcLen = if (noCrc) 0 else 2
        val sideOff = o + 4 + crcLen
        if (frameLen < 4 + crcLen + sideLen || off + frameLen > p.length) {
          // truncated final frame: stop cleanly with what we have
          off = p.length.toLong
        } else {
          if (rate < 0) rate = srates(srIdx)
          // side-info bit reader: fixed offsets (see scaladoc)
          def bits(bitPos: Int, n: Int): Int = {
            var v = 0
            var i = 0
            while (i < n) {
              val bp = bitPos + i
              v = (v << 1) | ((p(sideOff + (bp >> 3)) >> (7 - (bp & 7))) & 1)
              i += 1
            }
            v
          }
          val headBits = if (mono) 9 + 5 + 4 else 9 + 3 + 8
          val nch = if (mono) 1 else 2
          var gr = 0
          while (gr < 2) {
            var acc = 0
            var ch = 0
            while (ch < nch) {
              acc += bits(headBits + (gr * nch + ch) * 59 + 21, 8)
              ch += 1
            }
            gains += acc / nch // channel-mean global_gain per granule
            gr += 1
          }
          nFrames += 1
          run += 1
          if (run > maxRun) maxRun = run
          off += frameLen
        }
      } else {
        run = 0
        off += 1 // resync: scan forward
      }
    }
    if (nFrames == 0 || maxRun < 2 || rate <= 0) return None
    val n = gains.length
    val sum = new Array[Double](16)
    val cnt = new Array[Long](16)
    var i = 0
    while (i < n) {
      val seg = math.min(15, (i.toLong * 16 / n).toInt)
      sum(seg) += gains(i) / 255.0
      cnt(seg) += 1
      i += 1
    }
    Some((rate, nFrames, Array.tabulate(16)(c =>
      if (cnt(c) == 0) 0f else (sum(c) / cnt(c)).toFloat)))
  }

  /**
   * REAL decode of an MJPEG AVI — the one common VIDEO container
   * reachable without a codec library: the container is RIFF (the same
   * chunk grammar [[decodeWav]] walks), and each `##dc`/`##db` chunk in
   * the `movi` LIST is a complete baseline JPEG frame [[decodeJpeg]]
   * already handles. Returns (width, height, framesTotal, framesSampled,
   * 16-dim feature).
   *
   * Frame SAMPLING is the scale posture: the chunk walk counts every
   * frame (cheap — size arithmetic only), but at most `maxSample`
   * frames, evenly spaced across the stream, are actually
   * entropy-decoded; the feature is the elementwise MEAN of the sampled
   * frames' 4×4 grid-luminance features — a temporal average of actual
   * pixel content, so two MJPEG files of the same footage pair in
   * near-dup regardless of byte-level differences. MJPEG frames are
   * independently-coded stills, so sampling needs no inter-frame state.
   *
   * None when the payload isn't a RIFF AVI or no sampled frame decodes
   * as baseline JPEG (frames a corrupt stream loses are skipped as long
   * as at least one sampled frame decodes). Untrusted-size contract as
   * the other decoders: Long cursors, bounds before every read, and the
   * decode-size valve lives in [[decodeJpeg]] per frame.
   */
  def decodeAvi(p: Array[Byte], maxSample: Int = 8): Option[(Int, Int, Int, Int, Array[Float])] = {
    if (maxSample <= 0) return None
    if (p.length < 24 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F' ||
      p(8) != 'A' || p(9) != 'V' || p(10) != 'I' || p(11) != ' ') return None
    var avihW = -1
    var avihH = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (off, len)
    // `movi` may group frames into nested `LIST rec ` chunks; one level of
    // descent covers the format (rec lists are not themselves nested)
    def walkFrames(start: Long, end: Long, depth: Int): Boolean = {
      var off = start
      while (off + 8 <= end) {
        val o = off.toInt
        val sz = leInt(p, o + 4)
        if (sz < 0 || off + 8 + sz > end) return false
        if (p(o) == 'L' && p(o + 1) == 'I' && p(o + 2) == 'S' && p(o + 3) == 'T') {
          if (sz >= 4 && depth < 1 && !walkFrames(off + 12, off + 8 + sz, depth + 1))
            return false
        } else if (p(o + 2) == 'd' && (p(o + 3) == 'c' || p(o + 3) == 'b') && sz > 0) {
          frames += ((o + 8, sz))
        }
        off += 8L + sz + (sz & 1)
      }
      true
    }
    var off = 12L
    while (off + 8 <= p.length) {
      val o = off.toInt
      val id = new String(p, o, 4, "US-ASCII")
      val sz = leInt(p, o + 4)
      if (sz < 0 || off + 8 + sz > p.length) return None
      if (id == "LIST" && sz >= 4) {
        val listType = new String(p, o + 8, 4, "US-ASCII")
        if (listType == "hdrl") {
          // find avih inside hdrl for the declared dimensions
          var ho = off + 12
          val hEnd = off + 8 + sz
          while (ho + 8 <= hEnd && avihW < 0) {
            val hoI = ho.toInt
            val hsz = leInt(p, hoI + 4)
            if (hsz < 0 || ho + 8 + hsz > hEnd) return None
            if (p(hoI) == 'a' && p(hoI + 1) == 'v' && p(hoI + 2) == 'i' &&
              p(hoI + 3) == 'h' && hsz >= 40) {
              avihW = leInt(p, hoI + 8 + 32)
              avihH = leInt(p, hoI + 8 + 36)
            }
            ho += 8L + hsz + (hsz & 1)
          }
        } else if (listType == "movi") {
          if (!walkFrames(off + 12, off + 8 + sz, 0)) return None
        }
      }
      off += 8L + sz + (sz & 1)
    }
    val n = frames.length
    if (n == 0) return None
    // evenly-spaced sample indices (first and last always included)
    val take = math.min(maxSample, n)
    val idxs = if (take == n) (0 until n).toArray
      else if (take == 1) Array(0) // 2+ frames, sample just the first
      else Array.tabulate(take)(k => (k.toLong * (n - 1) / (take - 1)).toInt)
    val acc = new Array[Double](24)
    var sampled = 0
    var w = avihW
    var h = avihH
    idxs.foreach { i =>
      val (fo, fl) = frames(i)
      decodeJpeg(java.util.Arrays.copyOfRange(p, fo, fo + fl)).foreach {
        case (fw, fh, feat) =>
          if (sampled == 0 && (w <= 0 || h <= 0)) { w = fw; h = fh }
          var c = 0
          while (c < feat.length && c < 24) { acc(c) += feat(c); c += 1 }
          sampled += 1
      }
    }
    if (sampled == 0 || w <= 0 || h <= 0) return None
    Some((w, h, n, sampled, Array.tabulate(24)(c => (acc(c) / sampled).toFloat)))
  }

  /** Deterministic payload checksum (FNV-ish fold) — computed for every
    * item regardless of decode path. */
  private def fnv(payload: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    h
  }

  /**
   * REAL parse of an ISO BMFF (MP4/MOV/M4V) container — box walk only,
   * pure byte layout, no codec: `ftyp` + `moov` → `mvhd`, per-`trak`
   * `tkhd` (16.16-fixed width/height) and `mdia/hdlr` (`vide` handler)
   * → `minf/stbl` → `stsd` (codec fourcc of the first sample entry,
   * dims at the video-sample-entry fixed offsets) + `stts` (REAL frame
   * count = Σ sample counts) + `stsz` (per-frame encoded sizes). The
   * 16-dim feature is the per-segment mean ENCODED FRAME SIZE,
   * normalized by the largest segment — the frame-size envelope is
   * content-derived without any codec (encoded size tracks
   * motion/complexity exactly the way MP3 `global_gain` tracks
   * loudness, [[parseMp3]]'s precedent): identical encodes share it,
   * different footage does not. Returns (width, height, nFrames,
   * feature). None unless a valid `ftyp` + a `moov` with a video track
   * carrying positive dimensions parse. All header ints are UNTRUSTED
   * (the BMP/WAV contract): Long cursors, bounds before every read,
   * depth/count valves — a corrupt box tree costs one stub row, never a
   * task. ENTRY CAPS (explicit, per the no-silent-caps convention):
   * each box walk reads at most 4096 children per container, the `stts`
   * walk sums at most the first 65536 (count, delta) entries, and the
   * `stsz` envelope samples the first 65536 per-frame sizes — so for a
   * very long or heavily-edited video, `nFrames` is a LOWER BOUND
   * (≥ 65536 means "at least") and the size envelope describes the
   * first ~65k frames. The caps bound a hostile header's cost at ~1 MB
   * of reads; raising them is safe but unneeded for feature-extraction
   * use.
   */
  def parseMp4(p: Array[Byte]): Option[(Int, Int, Int, Array[Float])] = try {
    def be32(o: Long): Long =
      if (o < 0 || o + 4 > p.length) -1L
      else {
        val i = o.toInt
        ((p(i) & 0xFFL) << 24) | ((p(i + 1) & 0xFFL) << 16) |
          ((p(i + 2) & 0xFFL) << 8) | (p(i + 3) & 0xFFL)
      }
    def be16(o: Long): Int =
      if (o < 0 || o + 2 > p.length) -1
      else ((p(o.toInt) & 0xFF) << 8) | (p(o.toInt + 1) & 0xFF)
    def fourcc(o: Long): String =
      if (o < 0 || o + 4 > p.length) ""
      else new String(p, o.toInt, 4, "US-ASCII")
    // children of [start, end): (type, payloadStart, payloadEnd)
    def children(start: Long, end: Long): Seq[(String, Long, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      var o = start
      var n = 0
      while (o + 8 <= end && n < 4096) {
        var size = be32(o)
        var hdr = 8L
        if (size == 1) { // 64-bit largesize
          val hi = be32(o + 8); val lo = be32(o + 12)
          if (hi < 0 || lo < 0) return out.toSeq
          size = (hi << 32) | lo
          hdr = 16L
        } else if (size == 0) size = end - o // box extends to container end
        if (size < hdr || o + size > end) return out.toSeq
        out += ((fourcc(o + 4), o + hdr, o + size))
        o += size
        n += 1
      }
      out.toSeq
    }
    def child(bs: Seq[(String, Long, Long)], t: String): Option[(Long, Long)] =
      bs.collectFirst { case (`t`, s, e) => (s, e) }
    val top = children(0, p.length)
    if (!top.exists(_._1 == "ftyp")) return None
    val (moovS, moovE) = child(top, "moov").getOrElse(return None)
    val moov = children(moovS, moovE)
    var w = -1
    var h = -1
    var nFrames = 0L
    var sizes: Array[Long] = null
    var uniform = -1L
    for ((t, ts, te) <- moov if t == "trak" && w < 0) {
      val trak = children(ts, te)
      val mdia = child(trak, "mdia").map { case (s, e) => children(s, e) }
        .getOrElse(Seq.empty)
      val isVideo = child(mdia, "hdlr").exists { case (s, _) =>
        fourcc(s + 8) == "vide" }
      if (isVideo) {
        // tkhd v0: width/height as 16.16 fixed at payload offsets 76/80
        // (v1 shifts the three 32-bit times to 64-bit: +12)
        child(trak, "tkhd").foreach { case (s, e) =>
          val off = if (be32(s) >>> 24 == 1) 88L else 76L
          val fw = be32(s + off); val fh = be32(s + off + 4)
          if (fw > 0 && fh > 0 && s + off + 8 <= e) {
            w = (fw >> 16).toInt; h = (fh >> 16).toInt
          }
        }
        val stbl = child(mdia, "minf").map { case (s, e) => children(s, e) }
          .flatMap(m => child(m, "stbl")).map { case (s, e) => children(s, e) }
          .getOrElse(Seq.empty)
        // sample-entry dims take precedence (the codec's own numbers);
        // video sample entry: width/height u16 at entry payload +24/+26
        child(stbl, "stsd").foreach { case (s, e) =>
          if (be32(s + 4) >= 1 && s + 8 + 36 <= e) {
            val ew = be16(s + 16 + 24); val eh = be16(s + 16 + 26)
            if (ew > 0 && eh > 0) { w = ew; h = eh }
          }
        }
        child(stbl, "stts").foreach { case (s, e) =>
          val cnt = be32(s + 4)
          var i = 0L
          while (i < cnt && s + 8 + i * 8 + 8 <= e && i < 65536) {
            val sc = be32(s + 8 + i * 8)
            if (sc > 0) nFrames += sc
            i += 1
          }
        }
        child(stbl, "stsz").foreach { case (s, e) =>
          uniform = be32(s + 4)
          val cnt = be32(s + 8)
          if (uniform == 0 && cnt > 0) {
            val take = math.min(cnt, 65536L).toInt
            if (s + 12 + take.toLong * 4 <= e)
              sizes = Array.tabulate(take)(i => be32(s + 12 + i.toLong * 4))
          }
        }
      }
    }
    if (w <= 0 || h <= 0 || w > 32768 || h > 32768) return None
    // frame-size envelope over 16 segments (uniform sizes → flat 1.0)
    val feat = new Array[Float](16)
    if (sizes != null && sizes.nonEmpty) {
      val sum = new Array[Double](16)
      val cnt = new Array[Long](16)
      for (i <- sizes.indices) {
        val seg = math.min(15, (i.toLong * 16 / sizes.length).toInt)
        sum(seg) += math.max(0L, sizes(i)).toDouble
        cnt(seg) += 1
      }
      val means = Array.tabulate(16)(c => if (cnt(c) == 0) 0.0 else sum(c) / cnt(c))
      val mx = means.max
      if (mx > 0) for (c <- 0 until 16) feat(c) = (means(c) / mx).toFloat
    } else if (uniform > 0 && nFrames > 0) java.util.Arrays.fill(feat, 1.0f)
    Some((w, h, math.min(nFrames, Int.MaxValue).toInt, feat))
  } catch { case scala.util.control.NonFatal(_) => None }

  /**
   * REAL parse of a Matroska/WebM (EBML) container — the [[parseMp4]]
   * treatment for the other dominant web video layout, again pure byte
   * arithmetic: EBML varint walk through `Segment` → `Tracks` →
   * `TrackEntry` (first TrackType=1 video track: `PixelWidth`/
   * `PixelHeight`, `TrackNumber`) and `Cluster` → `SimpleBlock` /
   * `BlockGroup/Block` (blocks belonging to the video track: REAL frame
   * count + encoded-size envelope, same normalization as [[parseMp4]]).
   * Returns (width, height, nFrames, feature); None unless the EBML
   * magic, a Segment, and a video track with positive dims AND a
   * TrackNumber parse (TrackNumber is mandatory in Matroska — without
   * it blocks can't be attributed to the video track, so its absence is
   * a parse failure rather than an inflated count). Untrusted-header
   * contract throughout (Long cursors, bounds, count valves). ENTRY
   * CAPS (explicit): ≤ 65536 children per element walk (a Cluster's
   * children ARE its blocks, so this cap must clear a cluster's frame
   * count — wider than parseMp4's 4096 box walk) and the first 65536
   * video blocks feed nFrames/envelope — nFrames is a LOWER BOUND at
   * 65536, same convention as [[parseMp4]].
   */
  def parseMkv(p: Array[Byte]): Option[(Int, Int, Int, Array[Float])] = try {
    // EBML varint: leading-zero count of the first byte gives the width;
    // IDs keep the marker bit, sizes clear it. Returns (value, width) or
    // null on malformed/EOF.
    def vint(o: Long, keepMarker: Boolean): (Long, Int) = {
      if (o < 0 || o >= p.length) return null
      val b = p(o.toInt) & 0xFF
      if (b == 0) return null
      val len = java.lang.Integer.numberOfLeadingZeros(b) - 23 // 1..8
      if (o + len > p.length) return null
      var v = (if (keepMarker) b else b & ((1 << (8 - len)) - 1)).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (p((o + i).toInt) & 0xFF); i += 1 }
      (v, len)
    }
    // children of [start, end): (id, payloadStart, payloadEnd)
    def children(start: Long, end: Long): Seq[(Long, Long, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var o = start
      var n = 0
      while (o < end && n < 65536) {
        val id = vint(o, keepMarker = true)
        if (id == null) return out.toSeq
        val sz = vint(o + id._2, keepMarker = false)
        if (sz == null) return out.toSeq
        val ps = o + id._2 + sz._2
        // all-ones size = unknown extent (streaming): last element only
        val allOnes = sz._1 == (1L << (7 * sz._2)) - 1
        val pe = if (allOnes) end else ps + sz._1
        if (ps > end || pe > end || pe < ps) return out.toSeq
        out += ((id._1, ps, pe))
        o = pe
        n += 1
      }
      out.toSeq
    }
    def uintAt(s: Long, e: Long): Long = {
      var v = 0L
      var o = s
      if (e - s > 8) return -1
      while (o < e) { v = (v << 8) | (p(o.toInt) & 0xFF); o += 1 }
      v
    }
    val top = children(0, p.length)
    if (!top.headOption.exists(_._1 == 0x1A45DFA3L)) return None // EBML magic
    val (segS, segE) = top.collectFirst {
      case (0x18538067L, s, e) => (s, e) }.getOrElse(return None)
    val seg = children(segS, segE)
    var w = -1
    var h = -1
    var trackNum = -1L
    for ((id, s, e) <- seg if id == 0x1654AE6BL && w < 0) // Tracks
      for ((tid, ts, te) <- children(s, e) if tid == 0xAEL && w < 0) { // TrackEntry
        val entry = children(ts, te)
        val isVideo = entry.exists { case (i, vs, ve) =>
          i == 0x83L && uintAt(vs, ve) == 1L } // TrackType = video
        if (isVideo) {
          entry.collectFirst { case (0xE0L, vs, ve) => (vs, ve) }.foreach {
            case (vs, ve) => // Video element
              val vids = children(vs, ve)
              vids.collectFirst { case (0xB0L, a, b) => uintAt(a, b) }
                .foreach(x => w = x.toInt)
              vids.collectFirst { case (0xBAL, a, b) => uintAt(a, b) }
                .foreach(x => h = x.toInt)
          }
          trackNum = entry.collectFirst { case (0xD7L, a, b) => uintAt(a, b) }
            .getOrElse(-1L)
        }
      }
    if (w <= 0 || h <= 0 || w > 32768 || h > 32768) return None
    // TrackNumber is MANDATORY in Matroska; without it a block can't be
    // attributed to the video track, and counting every track's blocks
    // would inflate nFrames/envelope on multiplexed files — treat its
    // absence as a parse failure, the untrusted-header contract.
    if (trackNum <= 0) return None
    // frame count + size envelope from the video track's blocks
    val blockSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    def takeBlock(s: Long, e: Long): Unit = {
      val tn = vint(s, keepMarker = false)
      if (tn != null && tn._1 == trackNum && blockSizes.length < 65536)
        blockSizes += math.max(0L, e - s - tn._2 - 3) // ts(2) + flags(1)
    }
    for ((id, s, e) <- seg if id == 0x1F43B675L) // Cluster
      for ((bid, bs, be) <- children(s, e)) bid match {
        case 0xA3L => takeBlock(bs, be) // SimpleBlock
        case 0xA0L => children(bs, be).foreach { // BlockGroup → Block
          case (0xA1L, gs, ge) => takeBlock(gs, ge)
          case _ => ()
        }
        case _ => ()
      }
    val feat = new Array[Float](16)
    if (blockSizes.nonEmpty) {
      val sum = new Array[Double](16)
      val cnt = new Array[Long](16)
      for (i <- blockSizes.indices) {
        val segI = math.min(15, (i.toLong * 16 / blockSizes.length).toInt)
        sum(segI) += blockSizes(i).toDouble
        cnt(segI) += 1
      }
      val means = Array.tabulate(16)(c => if (cnt(c) == 0) 0.0 else sum(c) / cnt(c))
      val mx = means.max
      if (mx > 0) for (c <- 0 until 16) feat(c) = (means(c) / mx).toFloat
    }
    Some((w, h, blockSizes.length, feat))
  } catch { case scala.util.control.NonFatal(_) => None }

  /**
   * STUB decode — deterministic fake standing in for a real codec on
   * payloads whose formats need one (non-MJPEG video CONTENT, MP3 PCM, …
   * none of which have libraries in this container). Derives a
   * fixed-length "feature vector" from the checksum so downstream
   * operators (similarity, dedup) are exercised with realistic shapes
   * and reproducible values.
   */
  private def fakeDecode(h: Long, featureDim: Int): Array[Float] =
    Array.tabulate(featureDim) { d =>
      val x = h ^ (d.toLong * 0x9E3779B97F4A7C15L)
      ((x % 1000L).toFloat) / 1000.0f
    }

  /** Thumbnail dims preserving aspect, bounded at `maxSide` (resize step). */
  private def thumbDims(w: Int, h: Int, maxSide: Int): (Int, Int) =
    if (w <= 0 || h <= 0) (0, 0)
    else if (w >= h) (maxSide, math.max(1, h * maxSide / w))
    else (math.max(1, w * maxSide / h), maxSide)

  /**
   * Decode + feature-extract + resize + frame-sample in one partition-
   * batched pass. Images parse as BMP, PNG or JPEG (baseline +
   * progressive), audio as
   * WAV, and video as MJPEG AVI when the bytes really are those layouts
   * ([[decodeBmp]]/[[decodePng]]/[[decodeJpeg]]/[[decodeWav]]/
   * [[decodeAvi]] — real, library-free decoders whose features derive
   * from pixel/sample content); decoded dimensions override the metadata
   * columns (the payload is the truth). Everything else — codec-bound
   * audio (MP3/AAC) and non-MJPEG video — takes the deterministic stub
   * path, flagged `decoder = "stub"`. `frames_sampled` applies to video
   * only: the REAL count of frames [[decodeAvi]] entropy-decoded on the
   * avi-mjpeg path, or the stub's synthetic 1-per-~4 KiB shape.
   */
  def extractFeatures(media: DataFrame, featureDim: Int = 24, thumbMax: Int = 64)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init happens HERE (real codec handle / model load)
      rows.map { r =>
        // the binary column is nullable: a NULL payload degrades like a
        // zero-byte one (checksum of nothing, stub features) instead of
        // NPE-ing the task before the decode try/catch is even reached
        val payload = if (r.payload == null) Array.emptyByteArray else r.payload
        val checksum = fnv(payload)
        // A corrupt payload must degrade to the stub row, never kill the
        // task: the decoders defend their own bounds, and this catch is
        // the last-resort valve for anything they miss.
        val decoded: Option[(String, Int, Int, Int, Array[Float])] =
          try r.kind match {
            case "image" =>
              decodeBmp(payload).map { case (w, h, f) => ("bmp", w, h, 0, f) }
                .orElse(decodePng(payload).map { case (w, h, f) => ("png", w, h, 0, f) })
                .orElse(decodeJpegTagged(payload).map { case (tag, w, h, f) => (tag, w, h, 0, f) })
            case "audio" =>
              decodeWav(payload).map { case (_, _, f) =>
                ("wav", r.width, r.height, 0, f) }
                .orElse(parseMp3(payload).map { case (_, _, f) =>
                  ("mp3-sideinfo", r.width, r.height, 0, f) })
            case "video" => decodeAvi(payload).map { case (w, h, _, sampled, f) =>
              ("avi-mjpeg", w, h, sampled, f) }
              .orElse(parseMp4(payload).map { case (w, h, _, f) =>
                ("mp4-meta", w, h, 0, f) })
              .orElse(parseMkv(payload).map { case (w, h, _, f) =>
                ("mkv-meta", w, h, 0, f) })
            case _ => None
          } catch { case scala.util.control.NonFatal(_) => None }
        decoded match {
          case Some((dec, w, h, frames, feat)) =>
            val (tw, th) = thumbDims(w, h, thumbMax)
            val f = if (feat.length == featureDim) feat
              else java.util.Arrays.copyOf(feat, featureDim)
            MediaFeatures(r.media_id, r.kind, payload.length.toLong, checksum,
              tw, th, frames, dec, f)
          case None =>
            val feat = fakeDecode(checksum, featureDim)
            val (tw, th) = thumbDims(r.width, r.height, thumbMax)
            val frames = if (r.kind == "video")
              math.min(32, math.max(1, payload.length / 4096)) else 0
            MediaFeatures(r.media_id, r.kind, payload.length.toLong, checksum,
              tw, th, frames, "stub", feat)
        }
      }
    }
  }

  /**
   * Stamp byte-size metadata at media-WRITE time: `n_bytes` rides next to
   * the payload so every later metadata query (stats, size filters, skew
   * planning) aggregates a long column instead of scanning the binary one.
   * At 100 TB the payload column IS the table — paying `length()` once on
   * ingest is the difference between a KB-scale and a TB-scale stats query.
   */
  def withByteStats(media: DataFrame): DataFrame =
    media.withColumn("n_bytes", length(col("payload")).cast("long"))

  /**
   * Metadata-only stats: aggregates the PERSISTED `n_bytes` column (stamped
   * by `withByteStats` on ingest) — the payload column is never read, and
   * the parquet scan's ReadSchema excludes it (plan-asserted in
   * TrainingDataOpsSpec). A frame lacking `n_bytes` fails resolution loudly
   * rather than silently falling back to a payload scan.
   */
  def stats(media: DataFrame): DataFrame = {
    require(media.columns.contains("n_bytes"),
      "Multimodal.stats needs the persisted n_bytes column — stamp it at " +
        "write time with Multimodal.withByteStats (metadata queries must " +
        "never scan payload bytes)")
    media.groupBy(col("kind")).agg(
      count(lit(1)).as("n"),
      sum(col("n_bytes")).as("total_bytes"),
      Quantize.quantize(avg(col("width")), 4).as("avg_w"),
      Quantize.quantize(avg(col("height")), 4).as("avg_h"))
  }
}
