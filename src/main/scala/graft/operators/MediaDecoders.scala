package graft.operators

/** Hand-rolled hot-format media decoders — the "ship a tight decoder for
  * your hot format" optimization every production media pipeline makes
  * once the generic codec shows up in a profile (reference scope: the
  * decode stage of the multimodal feature pass, `Multimodal.scala`; the
  * JDK ImageIO readers stay as the fallback/compatibility path).
  *
  * Both decoders implement the FULL public container spec (GIF89a LZW
  * with dictionary growth + deferred clear + interlace; PNG gray-8 with
  * all five scanline filters), not just the subset our own encoders
  * emit: `FastCodecSpec` proves byte-equality against JDK ImageIO on
  * JDK-*written* compressed payloads, so these are real codecs, not
  * fixture-shaped shortcuts. Anything outside a decoder's supported
  * profile returns None and the caller falls back to ImageIO.
  *
  * Why they are fast where ImageIO is not (measured in the q60split
  * probe): no BufferedImage/Raster/ColorModel allocation per frame, no
  * SPI plumbing, no per-frame metadata parse, one linear pass over the
  * bitstream into a primitive array.
  */
object MediaDecoders {

  /** Raster-size ceiling for the fast paths (2^28 samples ≈ 268 MB/
    * frame). A LYING header must not drive the allocation: a malformed
    * 65535×65535 GIF descriptor would attempt ~4.3 GB (and its Int
    * product wraps NEGATIVE — NegativeArraySizeException was not in any
    * catch list pre-round-13). Checked in LONG arithmetic BEFORE any
    * allocation; oversized-but-honest payloads simply fall back to
    * ImageIO (no divergence — just no fast path), and the accounted
    * decode path (`Multimodal.decodeScreened`) pre-screens the same
    * bound so a lying header never reaches ImageIO's allocator either. */
  val MaxRasterSamples: Long = 1L << 28

  // ------------------------------------------------------------------
  // GIF
  // ------------------------------------------------------------------

  /** One decoded GIF frame: the frame's OWN raster (descriptor-sized,
    * matching `ImageReader.read(n)`, which does not composite onto the
    * logical screen) mapped to gray through the active palette's red
    * channel — the same LUT `Multimodal.VideoCodec.toGray` builds from
    * the JDK's IndexColorModel. */
  final case class GifFrame(width: Int, height: Int, gray: Array[Byte])

  /** Decode every frame of a GIF87a/GIF89a payload, or None if the
    * payload is not a GIF / is structurally truncated (caller falls
    * back to ImageIO, which will produce the authoritative error). */
  def decodeGif(p: Array[Byte]): Option[Array[GifFrame]] = {
    if (p.length < 13 || p(0) != 'G' || p(1) != 'I' || p(2) != 'F') return None
    try {
      var pos = 6
      def u8: Int = { val v = p(pos) & 0xff; pos += 1; v }
      def u16: Int = { val v = (p(pos) & 0xff) | ((p(pos + 1) & 0xff) << 8); pos += 2; v }
      u16; u16 // logical screen w/h (frames carry their own dims)
      val packed = u8
      pos += 2 // background index + aspect
      var gct: Array[Byte] = null
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        gct = grayLut(p, pos, n); pos += 3 * n
      }
      val frames = Array.newBuilder[GifFrame]
      var done = false
      while (!done) {
        (u8: @annotation.switch) match {
          case 0x3b => done = true // trailer
          case 0x21 =>             // extension: label + sub-blocks
            u8
            var len = u8
            while (len != 0) { pos += len; len = u8 }
          case 0x2c =>
            u16; u16 // frame left/top (raster returned frame-local)
            val fw = u16
            val fh = u16
            val fp = u8
            var lut = gct
            if ((fp & 0x80) != 0) {
              val n = 2 << (fp & 7)
              lut = grayLut(p, pos, n); pos += 3 * n
            }
            if (lut == null) return None // no palette in scope: not decodable
            // LONG-arithmetic dim guard BEFORE the raster allocation: the
            // u16 descriptor is untrusted; 65535*65535 wraps negative as
            // Int and anything near Int.MaxValue is an OOM attempt.
            if (fw <= 0 || fh <= 0 ||
              fw.toLong * fh > MaxRasterSamples) return None
            val interlaced = (fp & 0x40) != 0
            val idx = new Array[Byte](fw * fh)
            pos = lzw(p, pos, idx)
            // negative pos = the code stream ended (or hit EOI) before
            // filling the descriptor's raster — structural truncation;
            // a zero-padded partial frame must NOT be returned as Some
            // (ImageIO errors on the same payload — fall through so the
            // fallback produces the authoritative error).
            if (pos < 0) return None
            var gray = idx
            var i = 0
            while (i < idx.length) { gray(i) = lut(idx(i) & 0xff); i += 1 }
            if (interlaced) gray = deinterlace(gray, fw, fh)
            frames += GifFrame(fw, fh, gray)
          case _ => return None // unknown block type: bail to ImageIO
        }
      }
      val out = frames.result()
      if (out.isEmpty) None else Some(out)
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  /** Palette → gray LUT = the red channel, exactly what
    * `IndexColorModel.getRed` yields for the JDK-decoded frame. */
  private def grayLut(p: Array[Byte], off: Int, n: Int): Array[Byte] = {
    val lut = new Array[Byte](256)
    var i = 0
    while (i < n) { lut(i) = p(off + 3 * i); i += 1 }
    lut
  }

  /** GIF-variant LZW over the sub-block stream starting at `pos`
    * (minimum-code-size byte first). Decodes until EOI / output full /
    * stream end, then skips to the end of the sub-block chain; returns
    * the position after its terminator — NEGATED (as `-pos`) when the
    * code stream ended before filling `out` (truncated/corrupt payload:
    * the caller must treat the frame as undecodable rather than return
    * a zero-padded raster that diverges from ImageIO's error). Standard
    * table decoder: prefix chain + last-byte arrays, codes LSB-first,
    * code width grows at table-fill boundaries up to 12 bits, CLEAR
    * resets, full-table "deferred clear" keeps emitting 12-bit codes
    * until CLEAR. */
  private def lzw(p: Array[Byte], start: Int, out: Array[Byte]): Int = {
    var pos = start
    val minCode = p(pos) & 0xff; pos += 1
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Short](4096)
    val suffix = new Array[Byte](4096)
    val first = new Array[Byte](4096) // first byte of each entry's expansion
    val stack = new Array[Byte](4097)
    var i = 0
    while (i < clear) { suffix(i) = i.toByte; first(i) = i.toByte; i += 1 }
    var next = eoi + 1
    var width = minCode + 1
    var prev = -1
    var bitBuf = 0L
    var nBits = 0
    var outPos = 0
    // sub-block walk state
    var blockLeft = 0
    var ended = false // saw the 0-length terminator
    var finished = false
    while (!finished) {
      // refill
      while (nBits < width && !ended) {
        if (blockLeft == 0) {
          blockLeft = p(pos) & 0xff; pos += 1
          if (blockLeft == 0) ended = true
        }
        if (!ended) {
          bitBuf |= (p(pos) & 0xffL) << nBits
          pos += 1; nBits += 8; blockLeft -= 1
        }
      }
      if (nBits < width) finished = true // truncated stream: stop
      else {
        val code = (bitBuf & ((1 << width) - 1)).toInt
        bitBuf >>>= width; nBits -= width
        if (code == clear) {
          next = eoi + 1; width = minCode + 1; prev = -1
        } else if (code == eoi) {
          finished = true
        } else {
          var sp = 0
          var cur = code
          if (cur >= next) { // the K-of-wKw case: emit prev's first byte last
            if (prev < 0 || cur > next) throw new ArrayIndexOutOfBoundsException
            stack(sp) = first(prev); sp += 1
            cur = prev
          }
          while (cur >= clear) { // eoi+1.. entries chain; literals terminate
            stack(sp) = suffix(cur); sp += 1
            cur = prefix(cur) & 0xffff
          }
          stack(sp) = suffix(cur); sp += 1
          val head = suffix(cur)
          // emit reversed
          while (sp > 0 && outPos < out.length) {
            sp -= 1; out(outPos) = stack(sp); outPos += 1
          }
          if (prev >= 0 && next < 4096) {
            prefix(next) = prev.toShort
            suffix(next) = head
            first(next) = first(prev)
            next += 1
            if (next == (1 << width) && width < 12) width += 1
          }
          prev = code
          if (outPos == out.length) finished = true
        }
      }
    }
    // skip any remaining sub-block bytes to the terminator
    pos += blockLeft
    while (!ended) {
      val len = p(pos) & 0xff; pos += 1
      if (len == 0) ended = true else pos += len
    }
    if (outPos < out.length) -pos else pos // negative = truncated stream
  }

  /** GIF 4-pass interlace → sequential row order. */
  private def deinterlace(g: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](g.length)
    var src = 0
    var pass = 0
    val starts = Array(0, 4, 2, 1)
    val steps = Array(8, 8, 4, 2)
    while (pass < 4) {
      var y = starts(pass)
      while (y < h) {
        System.arraycopy(g, src * w, out, y * w, w)
        src += 1; y += steps(pass)
      }
      pass += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // PNG (gray, 8-bit, non-interlaced — the hot profile; everything else
  // falls back to ImageIO)
  // ------------------------------------------------------------------

  final case class GrayImage(width: Int, height: Int, gray: Array[Byte])

  def decodeGrayPng(p: Array[Byte]): Option[GrayImage] = {
    if (p.length < 33 || (p(0) & 0xff) != 0x89 || p(1) != 'P' ||
      p(2) != 'N' || p(3) != 'G') return None
    try {
      def be32(off: Int): Int =
        ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
          ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
      // IHDR is mandated first
      if (be32(8) != 13 || p(12) != 'I' || p(13) != 'H' || p(14) != 'D' ||
        p(15) != 'R') return None
      val w = be32(16)
      val h = be32(20)
      val bitDepth = p(24) & 0xff
      val colorType = p(25) & 0xff
      val interlace = p(28) & 0xff
      // LONG-arithmetic guard on the FILTERED buffer size (w+1)*h — the
      // array actually allocated below. The former w*h check let w=1,
      // h≈Int.MaxValue through and (w+1)*h wrapped negative (ADVICE r12
      // #1); MaxRasterSamples additionally rejects honest-but-absurd
      // headers before a multi-GB allocation.
      if (bitDepth != 8 || colorType != 0 || interlace != 0 ||
        w <= 0 || h <= 0 || (w.toLong + 1) * h > Int.MaxValue - 16 ||
        w.toLong * h > MaxRasterSamples) return None
      // CRC the IHDR we just trusted (tag+body = bytes [12, 29), CRC at
      // [29, 33)) — the JDK reader rejects a corrupted critical chunk,
      // so the fast path must too, not decode from a lying header.
      val crc = new java.util.zip.CRC32()
      crc.update(p, 12, 17)
      if (crc.getValue.toInt != be32(29)) return None
      // gather IDAT spans
      val inf = new java.util.zip.Inflater()
      val raw = new Array[Byte]((w + 1) * h)
      var rawLen = 0
      var off = 33
      var sawEnd = false
      while (!sawEnd && off + 8 <= p.length) {
        val len = be32(off)
        // untrusted chunk length: negative, or running past the payload
        // end (truncated file / lying length; LONG sum — off+12+len can
        // wrap as Int for a 2^31-ish lie) → not decodable here
        if (len < 0 || off + 12L + len > p.length) return None
        val tag = be32(off + 4)
        if (tag == 0x49444154) { // IDAT
          crc.reset()
          crc.update(p, off + 4, len + 4)
          if (crc.getValue.toInt != be32(off + 8 + len)) return None
          inf.setInput(p, off + 8, len)
          while (!inf.needsInput() && !inf.finished() && rawLen < raw.length)
            rawLen += inf.inflate(raw, rawLen, raw.length - rawLen)
        } else if (tag == 0x49454e44) sawEnd = true // IEND
        off += 12 + len
      }
      inf.end()
      if (rawLen != raw.length) return None
      // unfilter (bpp = 1)
      val gray = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        val rOff = y * (w + 1)
        val gOff = y * w
        val ft = raw(rOff) & 0xff
        (ft: @annotation.switch) match {
          case 0 => System.arraycopy(raw, rOff + 1, gray, gOff, w)
          case 1 =>
            var x = 0; var a = 0
            while (x < w) {
              a = (raw(rOff + 1 + x) + a) & 0xff; gray(gOff + x) = a.toByte
              x += 1
            }
          case 2 =>
            var x = 0
            while (x < w) {
              val b = if (y == 0) 0 else gray(gOff - w + x) & 0xff
              gray(gOff + x) = ((raw(rOff + 1 + x) & 0xff) + b).toByte
              x += 1
            }
          case 3 =>
            var x = 0; var a = 0
            while (x < w) {
              val b = if (y == 0) 0 else gray(gOff - w + x) & 0xff
              a = ((raw(rOff + 1 + x) & 0xff) + ((a + b) >> 1)) & 0xff
              gray(gOff + x) = a.toByte
              x += 1
            }
          case 4 =>
            var x = 0; var a = 0
            while (x < w) {
              val b = if (y == 0) 0 else gray(gOff - w + x) & 0xff
              val c = if (y == 0 || x == 0) 0 else gray(gOff - w + x - 1) & 0xff
              val pa = math.abs(b - c)
              val pb = math.abs(a - c)
              val pc = math.abs(a + b - 2 * c)
              val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
              a = ((raw(rOff + 1 + x) & 0xff) + pred) & 0xff
              gray(gOff + x) = a.toByte
              x += 1
            }
          case _ => return None
        }
        y += 1
      }
      Some(GrayImage(w, h, gray))
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
      case _: java.util.zip.DataFormatException => None
    }
  }
}
