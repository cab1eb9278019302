package graft

import scala.collection.mutable.ArrayBuffer
import graft.operators.Vp8l

/** Minimal VP8L ENCODER (test-side reference implementation written from
  * the same public spec, sharing no code with the decoder under test) +
  * roundtrip tests: random images encoded through every bitstream feature
  * the decoder implements — simple and normal Huffman codes (with 16/17/18
  * run-length codes), color cache, LZ77 near/far distances, subtract-green,
  * uniform predictor, cross-color, and bundled color-indexing — must decode
  * back to the exact ARGB pixels. */
object Vp8lTestCodec {

  final class BitWriter {
    private val out = ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nbits = 0
    def write(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << nbits
        nbits += 1
        if (nbits == 8) { out += cur.toByte; cur = 0; nbits = 0 }
        i += 1
      }
    }
    /** Huffman code bits go MSB-first (one tree level per bit). */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { write((code >> i) & 1, 1); i -= 1 }
    }
    def result(): Array[Byte] =
      (if (nbits > 0) out :+ cur.toByte else out).toArray
  }

  /** Canonical code assignment (increasing length, ties by symbol). */
  def canonical(lengths: Array[Int]): Map[Int, (Int, Int)] = {
    val maxLen = lengths.max
    val blCount = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) blCount(l) += 1)
    val nextCode = new Array[Int](maxLen + 1)
    var code = 0
    for (l <- 1 to maxLen) { code = (code + blCount(l - 1)) << 1; nextCode(l) = code }
    lengths.zipWithIndex.collect { case (l, s) if l > 0 =>
      val c = nextCode(l); nextCode(l) += 1; s -> (c, l)
    }.toMap
  }

  /** Huffman code lengths by pairwise merge; falls back to uniform
    * frequencies if the depth would exceed the spec's 15-bit cap. */
  def huffLengths(freq: Map[Int, Long], alphabet: Int): Array[Int] = {
    def build(f: Map[Int, Long]): Array[Int] = {
      val lengths = new Array[Int](alphabet)
      case class Node(w: Long, syms: List[Int])
      var q = f.toList.map { case (s, w) => Node(w, List(s)) }
        .sortBy(n => (n.w, n.syms.head))
      if (q.size == 1) { lengths(q.head.syms.head) = 1; return lengths }
      while (q.size > 1) {
        val a :: b :: rest = q: @unchecked
        (a.syms ++ b.syms).foreach(s => lengths(s) += 1)
        q = (Node(a.w + b.w, a.syms ++ b.syms) :: rest).sortBy(n => (n.w, n.syms.head))
      }
      lengths
    }
    val first = build(freq)
    if (first.max <= 15) first else build(freq.map { case (s, _) => s -> 1L })
  }

  private val CodeLengthOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Write one Huffman code header: simple when possible, else the
    * code-length-coded normal form with zero-run (17/18) and repeat (16)
    * codes so the decoder's every branch gets exercised. */
  def writeHuffmanCode(bw: BitWriter, lengths: Array[Int]): Map[Int, (Int, Int)] = {
    val used = lengths.zipWithIndex.filter(_._1 > 0).map(_._2)
    require(used.nonEmpty, "empty code")
    if (used.length <= 2 && used.forall(_ < 256)) {
      bw.write(1, 1) // simple
      bw.write(used.length - 1, 1)
      val first8 = if (used(0) > 1) 1 else 0
      bw.write(first8, 1)
      bw.write(used(0), if (first8 == 1) 8 else 1)
      if (used.length == 2) bw.write(used(1), 8)
      return if (used.length == 1) Map(used(0) -> (0, 0))
      else Map(used(0) -> (0, 1), used(1) -> (1, 1))
    }
    bw.write(0, 1) // normal
    // tokenize the length array: (clSymbol, extraBits, extraValue)
    val toks = ArrayBuffer.empty[(Int, Int, Int)]
    var i = 0
    while (i < lengths.length) {
      val v = lengths(i)
      var run = 1
      while (i + run < lengths.length && lengths(i + run) == v) run += 1
      if (v == 0) {
        var left = run
        while (left >= 11) { val take = math.min(left, 138); toks += ((18, 7, take - 11)); left -= take }
        while (left >= 3) { val take = math.min(left, 6); toks += ((17, 3, take - 3)); left -= take }
        while (left > 0) { toks += ((0, 0, 0)); left -= 1 }
      } else {
        toks += ((v, 0, 0)) // literal (sets prev_code_len)
        var left = run - 1
        while (left >= 3) { val take = math.min(left, 6); toks += ((16, 2, take - 3)); left -= take }
        while (left > 0) { toks += ((v, 0, 0)); left -= 1 }
      }
      i += run
    }
    // code-length tree: uniform freqs keep its depth <= 5 (< the 7 cap)
    val clLens = huffLengths(toks.map(_._1).distinct.map(_ -> 1L).toMap, 19)
    require(clLens.max <= 7)
    val nCodes = math.max(4,
      CodeLengthOrder.lastIndexWhere(s => clLens(s) > 0) + 1)
    bw.write(nCodes - 4, 4)
    (0 until nCodes).foreach(j => bw.write(clLens(CodeLengthOrder(j)), 3))
    bw.write(0, 1) // no explicit max-symbol
    val clCodes = canonical(clLens)
    toks.foreach { case (s, eb, ev) =>
      val (c, l) = clCodes(s)
      bw.writeCode(c, l)
      if (eb > 0) bw.write(ev, eb)
    }
    canonical(lengths)
  }

  /** Inverse of the spec's LZ77 prefix coding: value -> (prefix, extraBits,
    * extraValue). */
  def prefixEncode(value: Int): (Int, Int, Int) = {
    require(value >= 1)
    if (value <= 4) return (value - 1, 0, 0)
    var p = 4
    while (p < 40) {
      val extra = (p - 2) >> 1
      val offset = (2 + (p & 1)) << extra
      if (value >= offset + 1 && value <= offset + (1 << extra))
        return (p, extra, value - offset - 1)
      p += 1
    }
    throw new IllegalArgumentException(s"value $value out of prefix range")
  }

  private sealed trait Tok
  private case class Lit(px: Int) extends Tok
  private case class CacheRef(idx: Int) extends Tok
  private case class Copy(len: Int, dist: Int) extends Tok

  /** Encode one entropy-coded image (the recursive unit of the format).
    * `lzDistances` are the pixel distances the greedy matcher may use.
    * `metaBits > 0` (main image only) exercises meta-Huffman: tiles are
    * assigned to 2 groups checkerboard-wise via an entropy image, each
    * group carrying its own 5 codes. */
  def encodeImageStream(bw: BitWriter, pixels: Array[Int], xsize: Int,
      isMain: Boolean, cacheBits: Int, lzDistances: Seq[Int],
      metaBits: Int = 0): Unit = {
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = new Array[Int](math.max(cacheSize, 1))
    java.util.Arrays.fill(cache, 0x00ffffff) // unlikely sentinel
    val toks = ArrayBuffer.empty[(Tok, Int)] // token + start position
    var i = 0
    def push(px: Int): Unit = if (cacheBits > 0)
      cache((0x1e35a7bd * px) >>> (32 - cacheBits)) = px
    while (i < pixels.length) {
      val copied = lzDistances.iterator.filter(_ <= i).map { d =>
        var run = 0
        while (i + run < pixels.length && run < 4000 &&
          pixels(i + run) == pixels(i - d + run)) run += 1
        (d, run)
      }.find(_._2 >= 3)
      copied match {
        case Some((d, run)) =>
          toks += ((Copy(run, d), i))
          (0 until run).foreach(k => push(pixels(i + k)))
          i += run
        case None =>
          val px = pixels(i)
          val hash = if (cacheBits > 0) (0x1e35a7bd * px) >>> (32 - cacheBits) else 0
          if (cacheBits > 0 && cache(hash) == px) toks += ((CacheRef(hash), i))
          else { toks += ((Lit(px), i)); push(px) }
          i += 1
      }
    }
    // distance pixel-count -> spec distance code (near plane or +120)
    def distCode(d: Int): Int = {
      val asPlane = (for {
        y <- 0 to 8; x <- -8 to 8
        if y * xsize + x == d
        c = Vp8l.planeCodeOf(x, y) if c > 0
      } yield c).headOption
      asPlane.getOrElse(d + 120)
    }
    val useMeta = isMain && metaBits > 0
    val nGroups = if (useMeta) 2 else 1
    def groupOf(pos: Int): Int =
      if (!useMeta) 0
      else (((pos % xsize) >> metaBits) + ((pos / xsize) >> metaBits)) % 2
    // frequencies, one set of 5 trees per group
    def newFreq() = Array.fill(nGroups)(
      collection.mutable.Map.empty[Int, Long].withDefaultValue(0L))
    val gf = newFreq(); val rf = newFreq(); val bf = newFreq()
    val af = newFreq(); val df = newFreq()
    toks.foreach {
      case (Lit(px), pos) =>
        val g = groupOf(pos)
        gf(g)((px >> 8) & 0xff) += 1; rf(g)((px >> 16) & 0xff) += 1
        bf(g)(px & 0xff) += 1; af(g)((px >>> 24) & 0xff) += 1
      case (CacheRef(idx), pos) => gf(groupOf(pos))(256 + 24 + idx) += 1
      case (Copy(len, d), pos) =>
        val g = groupOf(pos)
        gf(g)(256 + prefixEncode(len)._1) += 1
        df(g)(prefixEncode(distCode(d))._1) += 1
    }
    def orZero(m: collection.mutable.Map[Int, Long]): Map[Int, Long] =
      if (m.isEmpty) Map(0 -> 1L) else m.toMap
    bw.write(if (cacheBits > 0) 1 else 0, 1)
    if (cacheBits > 0) bw.write(cacheBits, 4)
    if (isMain) {
      bw.write(if (useMeta) 1 else 0, 1)
      if (useMeta) {
        bw.write(metaBits - 2, 3)
        val mw = (xsize + (1 << metaBits) - 1) >> metaBits
        val ysize = pixels.length / xsize
        val mh = (ysize + (1 << metaBits) - 1) >> metaBits
        // entropy image: group index in (red << 8) | green -> green here
        val meta = Array.tabulate(mw * mh)(j =>
          0xff000000 | ((((j % mw) + (j / mw)) % 2) << 8))
        encodeImageStream(bw, meta, mw, isMain = false, cacheBits = 0, Nil)
      }
    }
    val groups = (0 until nGroups).map { g =>
      (writeHuffmanCode(bw, huffLengths(orZero(gf(g)), 256 + 24 + cacheSize)),
        writeHuffmanCode(bw, huffLengths(orZero(rf(g)), 256)),
        writeHuffmanCode(bw, huffLengths(orZero(bf(g)), 256)),
        writeHuffmanCode(bw, huffLengths(orZero(af(g)), 256)),
        writeHuffmanCode(bw, huffLengths(orZero(df(g)), 40)))
    }
    def emit(codes: Map[Int, (Int, Int)], sym: Int): Unit = {
      val (c, l) = codes(sym); bw.writeCode(c, l)
    }
    toks.foreach {
      case (Lit(px), pos) =>
        val (gc, rc, bc, ac, _) = groups(groupOf(pos))
        emit(gc, (px >> 8) & 0xff); emit(rc, (px >> 16) & 0xff)
        emit(bc, px & 0xff); emit(ac, (px >>> 24) & 0xff)
      case (CacheRef(idx), pos) =>
        emit(groups(groupOf(pos))._1, 256 + 24 + idx)
      case (Copy(len, d), pos) =>
        val (gc, _, _, _, dc) = groups(groupOf(pos))
        val (lp, leb, lev) = prefixEncode(len)
        emit(gc, 256 + lp); if (leb > 0) bw.write(lev, leb)
        val (dp, deb, dev) = prefixEncode(distCode(d))
        emit(dc, dp); if (deb > 0) bw.write(dev, deb)
    }
  }

  sealed trait Transform
  case object SubtractGreen extends Transform
  /** All tiles use the same predictor `mode`. */
  case class Predictor(mode: Int, bits: Int) extends Transform
  /** All tiles share one cross-color element (g2r, g2b, r2b as bytes). */
  case class CrossColor(g2r: Int, g2b: Int, r2b: Int, bits: Int) extends Transform
  case object Palette extends Transform

  private def avg2(a: Int, b: Int): Int = (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)
  private def subPixels(a: Int, b: Int): Int = {
    def ch(sh: Int) = (((a >>> sh) & 0xff) - ((b >>> sh) & 0xff)) & 0xff
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  /** Forward-apply the uniform predictor (residuals), matching the spec's
    * fixed edge rules. Only modes with closed forward forms are supported
    * here (the tests use 0/1/2/7). */
  private def forwardPredict(px: Array[Int], w: Int, h: Int, mode: Int): Array[Int] = {
    val out = new Array[Int](px.length)
    for (y <- 0 until h; x <- 0 until w) {
      val i = y * w + x
      val pred =
        if (x == 0 && y == 0) 0xff000000
        else if (y == 0) px(i - 1)
        else if (x == 0) px(i - w)
        else mode match {
          case 0 => 0xff000000
          case 1 => px(i - 1)
          case 2 => px(i - w)
          case 7 => avg2(px(i - 1), px(i - w))
          case m => throw new IllegalArgumentException(s"mode $m")
        }
      out(i) = subPixels(px(i), pred)
    }
    out
  }

  /** Encode ARGB pixels as a lossless WebP file. */
  def encode(argb: Array[Int], w: Int, h: Int, transforms: Seq[Transform] = Nil,
      cacheBits: Int = 0, lzDistances: Seq[Int] = Nil,
      metaBits: Int = 0): Array[Byte] = {
    val bw = new BitWriter
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1) // alpha hint
    bw.write(0, 3) // version
    var pixels = argb
    var xsize = w
    transforms.foreach {
      case SubtractGreen =>
        bw.write(1, 1); bw.write(2, 2)
        pixels = pixels.map { p =>
          val g = (p >> 8) & 0xff
          val r = (((p >> 16) & 0xff) - g) & 0xff
          val b = ((p & 0xff) - g) & 0xff
          (p & 0xff00ff00) | (r << 16) | b
        }
      case Predictor(mode, bits) =>
        bw.write(1, 1); bw.write(0, 2); bw.write(bits - 2, 3)
        val tw = (xsize + (1 << bits) - 1) >> bits
        val th = (h + (1 << bits) - 1) >> bits
        encodeImageStream(bw, Array.fill(tw * th)(0xff000000 | (mode << 8)), tw,
          isMain = false, cacheBits = 0, lzDistances = Nil)
        pixels = forwardPredict(pixels, xsize, h, mode)
      case CrossColor(g2r, g2b, r2b, bits) =>
        bw.write(1, 1); bw.write(1, 2); bw.write(bits - 2, 3)
        val tw = (xsize + (1 << bits) - 1) >> bits
        val th = (h + (1 << bits) - 1) >> bits
        val cte = 0xff000000 | (r2b << 16) | (g2b << 8) | g2r
        encodeImageStream(bw, Array.fill(tw * th)(cte), tw,
          isMain = false, cacheBits = 0, lzDistances = Nil)
        def delta(pred: Int, c: Int): Int = (pred.toByte * c.toByte) >> 5
        pixels = pixels.map { p =>
          val g = (p >> 8) & 0xff
          var r = (p >> 16) & 0xff
          var b = p & 0xff
          // forward = subtract the deltas the decoder will add back
          b = (b - delta(r2b, r)) & 0xff
          r = (r - delta(g2r, g)) & 0xff
          b = (b - delta(g2b, g)) & 0xff
          (p & 0xff00ff00) | (r << 16) | b
        }
      case Palette =>
        val colors = pixels.distinct
        require(colors.length <= 256)
        bw.write(1, 1); bw.write(3, 2)
        bw.write(colors.length - 1, 8)
        val deltas = colors.zipWithIndex.map { case (c, i) =>
          if (i == 0) c else subPixels(c, colors(i - 1))
        }
        encodeImageStream(bw, deltas, colors.length,
          isMain = false, cacheBits = 0, lzDistances = Nil)
        val index = colors.zipWithIndex.toMap
        val bits = if (colors.length <= 2) 3 else if (colors.length <= 4) 2
          else if (colors.length <= 16) 1 else 0
        val per = 1 << bits
        val pw = (xsize + per - 1) >> bits
        val packed = new Array[Int](pw * h)
        for (y <- 0 until h; x <- 0 until xsize) {
          val idx = index(pixels(y * xsize + x))
          val slot = y * pw + (x >> bits)
          packed(slot) |= (idx << ((x & (per - 1)) * (8 >> bits))) << 8
        }
        // green holds the bundle; alpha opaque like real encoders emit
        pixels = packed.map(_ | 0xff000000)
        xsize = pw
    }
    bw.write(0, 1) // end of transforms
    encodeImageStream(bw, pixels, xsize, isMain = true, cacheBits, lzDistances, metaBits)
    val payload = 0x2f.toByte +: bw.result()
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val chunk = "VP8L".getBytes("US-ASCII") ++ le32(payload.length) ++ payload ++
      (if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    "RIFF".getBytes("US-ASCII") ++ le32(4 + chunk.length) ++
      "WEBP".getBytes("US-ASCII") ++ chunk
  }
}

class Vp8lSpec extends org.scalatest.funsuite.AnyFunSuite {
  import Vp8lTestCodec._

  private def randImage(w: Int, h: Int, seed: Long, colors: Int = 0): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    val palette = if (colors > 0) Array.fill(colors)(rnd.nextInt() | 0xff000000) else null
    Array.fill(w * h)(
      if (palette != null) palette(rnd.nextInt(palette.length))
      else rnd.nextInt()) // random alpha too
  }

  private def roundtrip(argb: Array[Int], w: Int, h: Int,
      transforms: Seq[Transform] = Nil, cacheBits: Int = 0,
      lz: Seq[Int] = Nil): Unit = {
    val bytes = encode(argb, w, h, transforms, cacheBits, lz)
    val decoded = Vp8l.decode(bytes).getOrElse(fail("decode returned None"))
    assert(decoded.width == w && decoded.height == h)
    assert(decoded.argb.toSeq == argb.toSeq, "pixel mismatch")
  }

  test("literals-only roundtrip (normal Huffman codes, full random ARGB)") {
    roundtrip(randImage(37, 23, seed = 1), 37, 23)
  }

  test("tiny and degenerate shapes: 1x1, 1xN, Nx1, two-color simple codes") {
    roundtrip(Array(0x80112233), 1, 1)
    roundtrip(randImage(1, 17, 2), 1, 17)
    roundtrip(randImage(19, 1, 3), 19, 1)
    // exactly two colors per channel -> simple-code path for the literal trees
    val two = Array.tabulate(16 * 8)(i => if (i % 3 == 0) 0xff010203 else 0xff040506)
    roundtrip(two, 16, 8)
  }

  test("color cache + LZ77 near and far distances") {
    val w = 40; val h = 30
    val base = randImage(w, 3, 8, colors = 5)
    // 3-row periodic image: distance w (near plane (0,1)), w*3 (near map
    // edge), and w*17 = 680 (far literal code > 120) all find real matches;
    // the 5-color alphabet makes the cache hit constantly
    val img = Array.tabulate(w * h)(i => base(i % (w * 3)))
    roundtrip(img, w, h, cacheBits = 6, lz = Seq(1, w, w * 3, w * 17))
    roundtrip(img, w, h, cacheBits = 0, lz = Seq(1, w * 3)) // no cache
    roundtrip(img, w, h, cacheBits = 4, lz = Nil) // cache only
  }

  test("subtract-green transform roundtrip") {
    roundtrip(randImage(21, 13, 11), 21, 13, transforms = Seq(SubtractGreen))
  }

  test("predictor transform roundtrip (modes 0, 1, 2, 7)") {
    for (mode <- Seq(0, 1, 2, 7))
      roundtrip(randImage(33, 17, 100 + mode, colors = 9), 33, 17,
        transforms = Seq(Predictor(mode, bits = 4)))
    // smooth gradient + predictor + subtract-green stacked (reverse-order
    // inverse application in the decoder)
    val grad = Array.tabulate(24 * 24) { i =>
      val x = i % 24; val y = i / 24
      0xff000000 | ((x * 10 & 0xff) << 16) | ((y * 9 & 0xff) << 8) | ((x + y) * 5 & 0xff)
    }
    roundtrip(grad, 24, 24, transforms = Seq(SubtractGreen, Predictor(7, bits = 3)))
  }

  test("cross-color transform roundtrip") {
    roundtrip(randImage(18, 11, 21), 18, 11,
      transforms = Seq(CrossColor(g2r = 0x40, g2b = 0xc0, r2b = 0x15, bits = 3)))
  }

  test("color-indexing roundtrip: bundled 2/4/16-color and wide palettes") {
    roundtrip(randImage(13, 5, 31, colors = 2), 13, 5, transforms = Seq(Palette))
    roundtrip(randImage(13, 5, 32, colors = 4), 13, 5, transforms = Seq(Palette))
    roundtrip(randImage(29, 7, 33, colors = 13), 29, 7, transforms = Seq(Palette))
    roundtrip(randImage(23, 9, 34, colors = 90), 23, 9, transforms = Seq(Palette))
  }

  test("meta-Huffman roundtrip: two tile groups with distinct codes") {
    // left and right halves use disjoint color alphabets, assigned to two
    // Huffman groups checkerboard-wise by the entropy image — symbols from
    // the wrong group's tree would decode to garbage, so an exact pixel
    // match proves per-tile group selection works
    val w = 40; val h = 24
    val rnd = new scala.util.Random(55)
    val warm = Array.fill(6)(0xff000000 | (rnd.nextInt(0x100) << 16))
    val cool = Array.fill(6)(0xff000000 | rnd.nextInt(0x100))
    val img = Array.tabulate(w * h) { i =>
      if (i % w < w / 2) warm(rnd.nextInt(warm.length)) else cool(rnd.nextInt(cool.length))
    }
    val bytes = encode(img, w, h, metaBits = 3)
    val decoded = Vp8l.decode(bytes).getOrElse(fail("decode returned None"))
    assert(decoded.argb.toSeq == img.toSeq)
    // and combined with cache + lz77 to cross the group boundaries
    val bytes2 = encode(img, w, h, cacheBits = 5, lzDistances = Seq(1, w), metaBits = 4)
    assert(Vp8l.decode(bytes2).get.argb.toSeq == img.toSeq)
  }

  test("malformed payloads return None, never throw") {
    assert(Vp8l.decode(Array.empty[Byte]).isEmpty)
    assert(Vp8l.decode("RIFFxxxxWEBP".getBytes("US-ASCII")).isEmpty)
    val good = encode(randImage(9, 9, 41), 9, 9)
    assert(Vp8l.decode(good.dropRight(6)).isEmpty) // truncated stream
    val badSig = good.clone(); badSig(20) = 0x11 // corrupt inside payload
    Vp8l.decode(badSig) // must not throw (may be None or garbage pixels)
    // lossy VP8 payload: metadata-readable elsewhere, but decode -> None
    val lossy = graft.operators.Multimodal.encodeMinimalWebp(64, 48, "lossy")
    assert(Vp8l.decode(lossy).isEmpty)
  }

  test("fuzz: single-byte corruptions of a valid stream never throw or hang") {
    // corpus ingestion decodes UNTRUSTED bytes inside executors — every
    // malformed variant must come back as None (or garbage pixels), never
    // an escaped exception, infinite loop, or giant allocation. Bytes
    // before offset 26 are left alone so the declared dimensions stay
    // sane; the dimension guard itself is asserted separately below.
    val good = encode(randImage(24, 16, 77, colors = 8), 24, 16,
      cacheBits = 4, lzDistances = Seq(1, 24))
    val rnd = new scala.util.Random(99)
    (1 to 300).foreach { _ =>
      val b = good.clone()
      b(26 + rnd.nextInt(b.length - 26)) = rnd.nextInt(256).toByte
      Vp8l.decode(b) // must return, whatever the Option holds
    }
    (1 to 100).foreach { _ =>
      val n = 30 + rnd.nextInt(200)
      val junk = Array.fill(n)(rnd.nextInt(256).toByte)
      System.arraycopy("RIFF".getBytes, 0, junk, 0, 4)
      System.arraycopy("WEBPVP8L".getBytes, 0, junk, 8, 8)
      Vp8l.decode(junk)
    }
    // a hostile header declaring the 14-bit maximum (16384x16384 = 1 GiB
    // of pixels) is refused by the size guard, not allocated
    val huge = good.clone()
    huge(21) = 0xff.toByte; huge(22) = 0xff.toByte
    huge(23) = 0xff.toByte; huge(24) = 0xff.toByte
    assert(Vp8l.decode(huge).isEmpty)
  }
}
