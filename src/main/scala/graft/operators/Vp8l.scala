package graft.operators

/** Pure-JVM decoder for VP8L — the WebP LOSSLESS bitstream (public "WebP
  * Lossless Bitstream Specification" / RFC 9649; container per the WebP
  * container spec). Closes the residual the earlier rounds documented:
  * [[Multimodal.webpMeta]] could read lossless dimensions but not pixels
  * because no JDK codec exists for WebP; this decodes the actual ARGB
  * pixels with zero native dependencies, so `decodeImages` / `resize` get
  * real pixel facts for `webp-lossless` assets. (Lossy VP8 remains
  * metadata-only — a DCT codec is out of scope.)
  *
  * Implements the full lossless feature set: LSB-first bit reading, simple
  * and normal (code-length-coded) canonical Huffman codes, meta-Huffman
  * entropy images, color cache, LZ77 backward references with the 120-entry
  * 2D near-distance mapping, and all four transforms (predictor with its 14
  * modes, cross-color, subtract-green, color indexing with sub-byte pixel
  * bundling), inverse-applied in reverse stream order.
  *
  * Scale note: decoding is per-asset inside `mapPartitions` (same shape as
  * the JDK codecs in [[Multimodal]]) — embarrassingly parallel across a
  * binary column, no shuffle, no driver involvement.
  */
object Vp8l {

  final case class Image(width: Int, height: Int, argb: Array[Int])

  /** Decode a WebP byte payload IF it is a lossless (VP8L) file; None for
    * non-WebP, lossy/extended variants, or malformed streams. */
  def decode(bytes: Array[Byte]): Option[Image] = {
    try decodeOpt(bytes)
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Decode-size guard: a hostile 5-byte header can declare up to
    * 16384x16384 (the 14-bit max — a 1 GiB pixel buffer). Corpus ingestion
    * decodes untrusted bytes inside executors, so anything above this cap
    * (64M pixels, ~256 MB) is refused rather than allocated. */
  private val MaxPixels = 1 << 26

  private def decodeOpt(bytes: Array[Byte]): Option[Image] = {
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 21 || fourcc(0) != "RIFF" || fourcc(8) != "WEBP") return None
    // walk container chunks to the VP8L payload
    var off = 12
    var payload: Option[(Int, Int)] = None
    while (payload.isEmpty && off + 8 <= bytes.length) {
      val id = fourcc(off)
      val sz = (bytes(off + 4) & 0xff) | ((bytes(off + 5) & 0xff) << 8) |
        ((bytes(off + 6) & 0xff) << 16) | ((bytes(off + 7) & 0xff) << 24)
      if (id == "VP8L") payload = Some((off + 8, sz))
      else off += 8 + sz + (sz & 1) // chunks are 2-byte aligned
    }
    payload.flatMap { case (start, sz) => decodePayload(bytes, start, start + sz) }
  }

  /** Decode a bare VP8L bitstream (`bytes[start, end)` — a `VP8L` chunk
    * BODY, signature byte included): the standalone-file path above and
    * the animated-WebP ANMF sub-frame path both land here. */
  def decodePayload(bytes: Array[Byte], start: Int, end: Int): Option[Image] =
    try {
      if (end > bytes.length || end - start < 5 || (bytes(start) & 0xff) != 0x2f) None
      else {
        val br = new BitReader(bytes, start + 1, end)
        val w = br.read(14) + 1
        val h = br.read(14) + 1
        br.read(1) // alpha hint (informational)
        if (br.read(3) != 0) None // version must be 0
        else if (w.toLong * h > MaxPixels) None // see MaxPixels
        else Some(new Decoder(br).decodeMain(w, h))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------------------------------ bit reader

  /** LSB-first bit reader (VP8L packs values little-endian within bytes). */
  private final class BitReader(buf: Array[Byte], from: Int, until: Int) {
    private var pos = from
    private var bit = 0
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= until) throw new IllegalStateException("VP8L: truncated stream")
        v |= ((buf(pos) >> bit) & 1) << i
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    def readBit(): Int = read(1)
  }

  // ------------------------------------------------------------ huffman

  /** Canonical Huffman decoder as a flat binary tree (node pairs; leaves
    * are `~symbol`). Codes are walked MSB-first, one stream bit per level —
    * exactly how VP8L serializes them. A single-symbol code uses ZERO bits
    * (the spec's degenerate case), flagged by `only >= 0`. */
  private final class Huffman(lengths: Array[Int]) {
    private var nodes = new Array[Int](2) // grows; index*2 = children slots
    private var nNodes = 1
    java.util.Arrays.fill(nodes, 0)
    val only: Int = {
      var cnt = 0; var last = -1
      var i = 0
      while (i < lengths.length) {
        if (lengths(i) > 0) { cnt += 1; last = i }
        i += 1
      }
      if (cnt == 0) throw new IllegalStateException("VP8L: empty huffman code")
      if (cnt == 1) last else -1
    }
    if (only < 0) {
      // canonical code assignment: increasing length, ties by symbol index
      val maxLen = lengths.max
      require(maxLen <= 15, "VP8L: code length > 15")
      val blCount = new Array[Int](maxLen + 1)
      lengths.foreach(l => if (l > 0) blCount(l) += 1)
      val nextCode = new Array[Int](maxLen + 1)
      var code = 0
      var l = 1
      while (l <= maxLen) {
        code = (code + blCount(l - 1)) << 1
        nextCode(l) = code
        l += 1
      }
      var sym = 0
      while (sym < lengths.length) {
        val len = lengths(sym)
        if (len > 0) {
          insert(nextCode(len), len, sym)
          nextCode(len) += 1
        }
        sym += 1
      }
    }
    private def insert(code: Int, len: Int, sym: Int): Unit = {
      var node = 0
      var i = len - 1
      while (i >= 0) {
        val b = (code >> i) & 1
        val slot = node * 2 + b
        if (slot + 1 >= nodes.length) nodes = java.util.Arrays.copyOf(nodes, nodes.length * 2 + 2)
        if (i == 0) {
          require(nodes(slot) == 0, "VP8L: over-subscribed huffman code")
          nodes(slot) = ~sym
        } else {
          if (nodes(slot) == 0) { nodes(slot) = nNodes; nNodes += 1 }
          require(nodes(slot) > 0, "VP8L: over-subscribed huffman code")
          node = nodes(slot)
        }
        i -= 1
      }
    }
    def next(br: BitReader): Int = {
      if (only >= 0) return only
      var node = 0
      while (true) {
        val slot = node * 2 + br.readBit()
        val v = if (slot < nodes.length) nodes(slot) else 0
        if (v < 0) return ~v
        if (v == 0) throw new IllegalStateException("VP8L: invalid huffman code")
        node = v
      }
      -1 // unreachable
    }
  }

  /** The order code-length-code lengths arrive in (spec constant). */
  private val CodeLengthOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** 2D near-distance map: LZ77 distance codes 1..120 address the 8x8
    * pixel neighborhood above/left (spec's code-to-plane table); codes
    * beyond 120 are literal distances minus 120. Entry format: high nibble
    * y-offset, low nibble 8 - x-offset. */
  private val CodeToPlane: Array[Int] = Array(
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1a,
    0x26, 0x2a, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1b, 0x36, 0x3a,
    0x25, 0x2b, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1c, 0x35, 0x3b,
    0x46, 0x4a, 0x24, 0x2c, 0x58, 0x45, 0x4b, 0x34, 0x3c, 0x03,
    0x57, 0x59, 0x13, 0x1d, 0x56, 0x5a, 0x23, 0x2d, 0x44, 0x4c,
    0x55, 0x5b, 0x33, 0x3d, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1e,
    0x66, 0x6a, 0x22, 0x2e, 0x54, 0x5c, 0x43, 0x4d, 0x65, 0x6b,
    0x32, 0x3e, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5d, 0x11, 0x1f,
    0x64, 0x6c, 0x42, 0x4e, 0x76, 0x7a, 0x21, 0x2f, 0x75, 0x7b,
    0x31, 0x3f, 0x88, 0x00, 0x87, 0x89, 0x52, 0x5e, 0x74, 0x7c,
    0x86, 0x8a, 0x63, 0x6d, 0x10, 0x85, 0x8b, 0x41, 0x4f, 0x20,
    0x62, 0x6e, 0x30, 0x73, 0x7d, 0x84, 0x8c, 0x61, 0x6f, 0x51,
    0x5f, 0x72, 0x7e, 0x83, 0x8d, 0x71, 0x7f, 0x82, 0x8e, 0x81,
    0x8f, 0x80)

  private[graft] def planeCodeToDistance(xsize: Int, planeCode: Int): Int =
    if (planeCode > CodeToPlane.length) planeCode - CodeToPlane.length
    else {
      val v = CodeToPlane(planeCode - 1)
      val yoff = v >> 4
      val xoff = 8 - (v & 0xf)
      math.max(1, yoff * xsize + xoff)
    }

  /** Inverse of [[planeCodeToDistance]] for (xoff, yoff) inside the near
    * map — used by the test codec to exercise near codes. -1 if unmapped. */
  private[graft] def planeCodeOf(xoff: Int, yoff: Int): Int = {
    val packed = (yoff << 4) | ((8 - xoff) & 0xf)
    CodeToPlane.indexOf(packed) + 1 match {
      case 0 => -1
      case c => c
    }
  }

  // ------------------------------------------------------------ decoder

  private val TransPredictor = 0
  private val TransColor = 1
  private val TransSubGreen = 2
  private val TransPalette = 3

  private final case class Transform(kind: Int, bits: Int,
      data: Array[Int], paletteSize: Int)

  private final class Decoder(br: BitReader) {

    def decodeMain(w: Int, h: Int): Image = {
      // transforms (top level only), read order preserved for inverse
      var xsize = w
      val transforms = scala.collection.mutable.ArrayBuffer.empty[Transform]
      var seen = 0
      while (br.readBit() == 1) {
        val kind = br.read(2)
        require((seen & (1 << kind)) == 0, "VP8L: duplicate transform")
        seen |= 1 << kind
        kind match {
          case TransSubGreen =>
            transforms += Transform(kind, 0, null, 0)
          case TransPredictor | TransColor =>
            val bits = br.read(3) + 2
            val tw = subSampleSize(xsize, bits)
            val th = subSampleSize(h, bits)
            transforms += Transform(kind, bits, decodeImage(tw, th, isMain = false), 0)
          case TransPalette =>
            val n = br.read(8) + 1
            val deltas = decodeImage(n, 1, isMain = false)
            // palette entries are component-wise deltas off the previous
            var i = 1
            while (i < n) {
              deltas(i) = addPixels(deltas(i), deltas(i - 1))
              i += 1
            }
            transforms += Transform(kind, bundleBits(n), deltas, n)
            xsize = subSampleSize(xsize, bundleBits(n))
        }
      }
      var argb = decodeImage(xsize, h, isMain = true)
      var width = xsize
      // inverse transforms in REVERSE stream order
      transforms.reverseIterator.foreach { t =>
        t.kind match {
          case TransSubGreen => inverseSubtractGreen(argb)
          case TransPredictor => inversePredictor(argb, width, h, t)
          case TransColor => inverseColorTransform(argb, width, h, t)
          case TransPalette =>
            argb = inversePalette(argb, width, h, w, t)
            width = w
        }
      }
      require(width == w, "VP8L: width mismatch after inverse transforms")
      Image(w, h, argb)
    }

    /** One entropy-coded image (spatially-coded): optional color cache at
      * every level, meta-Huffman only for the main image, then the
      * LZ77 + literal + cache-coded ARGB pixels. */
    private def decodeImage(xsize: Int, ysize: Int, isMain: Boolean): Array[Int] = {
      val cacheBits = if (br.readBit() == 1) br.read(4) else 0
      require(cacheBits <= 11, "VP8L: color cache too large")
      val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
      val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null

      // meta-Huffman: an entropy image names the Huffman group per tile
      var metaBits = 0
      var metaImage: Array[Int] = null
      var nGroups = 1
      if (isMain && br.readBit() == 1) {
        metaBits = br.read(3) + 2
        val mw = subSampleSize(xsize, metaBits)
        val mh = subSampleSize(ysize, metaBits)
        metaImage = decodeImage(mw, mh, isMain = false)
        var mx = 0
        while (mx < metaImage.length) {
          // group index lives in (red << 8) | green
          metaImage(mx) = (metaImage(mx) >> 8) & 0xffff
          nGroups = math.max(nGroups, metaImage(mx) + 1)
          mx += 1
        }
      }

      val greenAlphabet = 256 + 24 + cacheSize
      val groups = Array.fill(nGroups)(new Array[Huffman](5))
      var g = 0
      while (g < nGroups) {
        groups(g)(0) = readHuffmanCode(greenAlphabet)
        groups(g)(1) = readHuffmanCode(256) // red
        groups(g)(2) = readHuffmanCode(256) // blue
        groups(g)(3) = readHuffmanCode(256) // alpha
        groups(g)(4) = readHuffmanCode(40)  // distance
        g += 1
      }

      val out = new Array[Int](xsize * ysize)
      val mwidth = if (metaImage != null) subSampleSize(xsize, metaBits) else 0
      var pos = 0
      var x = 0
      var y = 0
      def groupAt(px: Int, py: Int): Array[Huffman] =
        if (metaImage == null) groups(0)
        else groups(metaImage((py >> metaBits) * mwidth + (px >> metaBits)))
      while (pos < out.length) {
        val trees = groupAt(x, y)
        val s = trees(0).next(br)
        if (s < 256) {
          val red = trees(1).next(br)
          val blue = trees(2).next(br)
          val alpha = trees(3).next(br)
          val px = (alpha << 24) | (red << 16) | (s << 8) | blue
          out(pos) = px
          if (cache != null) cache(cacheHash(px, cacheBits)) = px
          pos += 1; x += 1; if (x == xsize) { x = 0; y += 1 }
        } else if (s < 256 + 24) {
          val length = lz77Value(s - 256)
          val distCode = lz77Value(trees(4).next(br))
          val dist = planeCodeToDistance(xsize, distCode)
          require(dist <= pos && pos + length <= out.length, "VP8L: bad backref")
          var i = 0
          while (i < length) {
            val px = out(pos - dist)
            out(pos) = px
            if (cache != null) cache(cacheHash(px, cacheBits)) = px
            pos += 1; x += 1; if (x == xsize) { x = 0; y += 1 }
            i += 1
          }
        } else {
          val px = cache(s - 256 - 24)
          out(pos) = px
          pos += 1; x += 1; if (x == xsize) { x = 0; y += 1 }
        }
      }
      out
    }

    /** Length/distance prefix decoding (spec "LZ77 prefix coding"). */
    private def lz77Value(prefix: Int): Int =
      if (prefix < 4) prefix + 1
      else {
        val extra = (prefix - 2) >> 1
        val offset = (2 + (prefix & 1)) << extra
        offset + br.read(extra) + 1
      }

    /** One Huffman code: simple (1-2 symbols) or normal (code lengths
      * themselves Huffman-coded over the 19-symbol length alphabet with
      * run-length codes 16/17/18). */
    private def readHuffmanCode(alphabet: Int): Huffman = {
      val lengths = new Array[Int](alphabet)
      if (br.readBit() == 1) { // simple
        val nSym = br.readBit() + 1
        val first8 = br.readBit()
        val s0 = br.read(if (first8 == 1) 8 else 1)
        require(s0 < alphabet, "VP8L: simple symbol out of range")
        lengths(s0) = 1
        if (nSym == 2) {
          val s1 = br.read(8)
          require(s1 < alphabet && s1 != s0, "VP8L: simple symbol out of range")
          lengths(s1) = 1
        }
        new Huffman(lengths)
      } else {
        val nCodes = br.read(4) + 4
        require(nCodes <= CodeLengthOrder.length, "VP8L: bad code-length count")
        val clLengths = new Array[Int](19)
        var i = 0
        while (i < nCodes) { clLengths(CodeLengthOrder(i)) = br.read(3); i += 1 }
        val clTree = new Huffman(clLengths)
        var maxSymbol =
          if (br.readBit() == 1) {
            val nbits = 2 + 2 * br.read(3)
            2 + br.read(nbits)
          } else alphabet
        var sym = 0
        var prevLen = 8
        while (sym < alphabet && maxSymbol > 0) {
          maxSymbol -= 1
          val code = clTree.next(br)
          if (code < 16) {
            lengths(sym) = code; sym += 1
            if (code != 0) prevLen = code
          } else {
            val (extra, offset, usePrev) = code match {
              case 16 => (2, 3, true)
              case 17 => (3, 3, false)
              case _  => (7, 11, false)
            }
            var repeat = br.read(extra) + offset
            require(sym + repeat <= alphabet, "VP8L: code-length repeat overflow")
            val fill = if (usePrev) prevLen else 0
            while (repeat > 0) { lengths(sym) = fill; sym += 1; repeat -= 1 }
          }
        }
        new Huffman(lengths)
      }
    }
  }

  // ------------------------------------------------------------ transforms

  private[graft] def subSampleSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  /** Sub-byte bundling width for a palette of n colors (spec: <=2 colors
    * pack 8 pixels/byte, <=4 pack 4, <=16 pack 2). */
  private[graft] def bundleBits(paletteSize: Int): Int =
    if (paletteSize <= 2) 3 else if (paletteSize <= 4) 2
    else if (paletteSize <= 16) 1 else 0

  private[graft] def cacheHash(argb: Int, bits: Int): Int =
    (0x1e35a7bd * argb) >>> (32 - bits)

  private def addPixels(a: Int, b: Int): Int = {
    val alpha = ((a >>> 24) + (b >>> 24)) & 0xff
    val red = (((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff
    val green = (((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff
    val blue = ((a & 0xff) + (b & 0xff)) & 0xff
    (alpha << 24) | (red << 16) | (green << 8) | blue
  }

  private def inverseSubtractGreen(argb: Array[Int]): Unit = {
    var i = 0
    while (i < argb.length) {
      val px = argb(i)
      val green = (px >> 8) & 0xff
      val red = (((px >> 16) & 0xff) + green) & 0xff
      val blue = ((px & 0xff) + green) & 0xff
      argb(i) = (px & 0xff00ff00) | (red << 16) | blue
      i += 1
    }
  }

  private def avg2(a: Int, b: Int): Int = {
    // per-channel floor average (SWAR form from the spec)
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)
  }

  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(a: Int, b: Int, c: Int): Int = {
    def ch(sh: Int): Int =
      clip255(((a >>> sh) & 0xff) + ((b >>> sh) & 0xff) - ((c >>> sh) & 0xff))
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def clampAddSubtractHalf(l: Int, t: Int, tl: Int): Int = {
    val ave = avg2(l, t)
    def ch(sh: Int): Int = {
      val a = (ave >>> sh) & 0xff
      val b = (tl >>> sh) & 0xff
      clip255(a + (a - b) / 2)
    }
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def select(t: Int, l: Int, tl: Int): Int = {
    def diff(sh: Int): Int = {
      val pl = math.abs(((l >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
      val pt = math.abs(((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
      pl - pt
    }
    if (diff(24) + diff(16) + diff(8) + diff(0) <= 0) t else l
  }

  private def inversePredictor(argb: Array[Int], w: Int, h: Int, t: Transform): Unit = {
    val tileW = subSampleSize(w, t.bits)
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred: Int =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) argb(i - 1) // first row: left
          else if (x == 0) argb(i - w) // first column: top
          else {
            val mode = (t.data((y >> t.bits) * tileW + (x >> t.bits)) >> 8) & 0xff
            val l = argb(i - 1)
            val top = argb(i - w)
            val tl = argb(i - w - 1)
            // top-right of the last column wraps to this row's first pixel
            // (flat-array adjacency, the spec's defined behavior)
            val tr = argb(i - w + 1)
            mode match {
              case 0  => 0xff000000
              case 1  => l
              case 2  => top
              case 3  => tr
              case 4  => tl
              case 5  => avg2(avg2(l, tr), top)
              case 6  => avg2(l, tl)
              case 7  => avg2(l, top)
              case 8  => avg2(tl, top)
              case 9  => avg2(top, tr)
              case 10 => avg2(avg2(l, tl), avg2(top, tr))
              case 11 => select(top, l, tl)
              case 12 => clampAddSubtractFull(l, top, tl)
              case 13 => clampAddSubtractHalf(l, top, tl)
              case m  => throw new IllegalStateException(s"VP8L: predictor mode $m")
            }
          }
        argb(i) = addPixels(argb(i), pred)
        i += 1
        x += 1
      }
      y += 1
    }
  }

  /** Cross-color inverse. Transform element channels per the spec:
    * green_to_red in blue, green_to_blue in green, red_to_blue in red;
    * deltas are signed-byte products >> 5. */
  private def inverseColorTransform(argb: Array[Int], w: Int, h: Int, t: Transform): Unit = {
    val tileW = subSampleSize(w, t.bits)
    def delta(pred: Int, c: Int): Int = (pred.toByte * c.toByte) >> 5
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cte = t.data((y >> t.bits) * tileW + (x >> t.bits))
        val g2r = cte & 0xff
        val g2b = (cte >> 8) & 0xff
        val r2b = (cte >> 16) & 0xff
        val px = argb(i)
        val green = (px >> 8) & 0xff
        var red = (px >> 16) & 0xff
        var blue = px & 0xff
        red = (red + delta(g2r, green)) & 0xff
        blue = (blue + delta(g2b, green)) & 0xff
        blue = (blue + delta(r2b, red)) & 0xff
        argb(i) = (px & 0xff00ff00) | (red << 16) | blue
        i += 1
        x += 1
      }
      y += 1
    }
  }

  /** Color-indexing inverse: indices live in the GREEN channel, sub-byte
    * bundled when the palette is small; out-of-range indices decode as
    * transparent black (spec behavior). */
  private def inversePalette(packed: Array[Int], packedW: Int, h: Int,
      w: Int, t: Transform): Array[Int] = {
    val bits = t.bits
    val mask = (1 << (8 >> bits)) - 1
    val perPacked = 1 << bits
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val src = packed(y * packedW + (x >> bits))
        val sub = x & (perPacked - 1)
        val idx = ((src >> 8) >> (sub * (8 >> bits))) & mask
        out(y * w + x) = if (idx < t.paletteSize) t.data(idx) else 0
        x += 1
      }
      y += 1
    }
    out
  }
}
