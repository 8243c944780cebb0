package graft.sources

/** PDF stream filter decoders beyond raw FlateDecode — the public-spec
  * algorithms (PDF 32000-1 §7.4) the reference gets for free from
  * PyPDF2/pdfminer (reference: pdf_parser.py:7-10 delegates all stream
  * decoding to the library):
  *
  *  - FlateDecode / LZWDecode post-prediction (PNG predictors 10-15 and
  *    TIFF predictor 2) — PNG-Up (12) is what every xref stream uses,
  *    so this is the gateway to PDF 1.5 cross-reference parsing;
  *  - LZWDecode (9-12 bit MSB-first codes, EarlyChange);
  *  - ASCII85Decode / ASCIIHexDecode / RunLengthDecode.
  *
  * Pure byte-array functions, executor-side, no codec jars. Image-only
  * codecs (DCT/JPX/CCITT/JBIG2) pass through opaque — they are never
  * text-bearing and the codec never interprets them.
  */
object PdfStreamFilters {

  /** Decode one named filter application. `parms` is the raw text of the
    * matching /DecodeParms dictionary ("" when absent). Unknown filters
    * throw — the caller's parse() turns that into a fallback/DLQ, which
    * must not silently read compressed bytes as text.
    */
  def decode(name: String, data: Array[Byte], parms: String): Array[Byte] =
    name match {
      case "FlateDecode" | "Fl"    => unpredict(PdfTextCodec.inflate(data), parms)
      case "LZWDecode" | "LZW"     =>
        val early = PdfTextCodec.int(parms, "/EarlyChange").getOrElse(1)
        unpredict(lzw(data, early), parms)
      case "ASCII85Decode" | "A85" => ascii85(data)
      case "ASCIIHexDecode" | "AHx" => asciiHex(data)
      case "RunLengthDecode" | "RL" => runLength(data)
      // image codecs: opaque payloads; decoded pixels are never needed
      case "DCTDecode" | "JPXDecode" | "CCITTFaxDecode" | "JBIG2Decode" => data
      // stream-level /Crypt is applied by the encryption layer before
      // filters run; identity here
      case "Crypt" => data
      case other =>
        throw new java.io.IOException(s"unsupported stream filter /$other")
    }

  // ------------------------------------------------------------- predictors

  /** Reverse the /Predictor transform declared in `parms`: 1/absent =
    * identity, 2 = TIFF horizontal differencing, >=10 = PNG row filters
    * (the tag byte per row selects None/Sub/Up/Average/Paeth
    * independently of the declared predictor value, per spec).
    */
  def unpredict(data: Array[Byte], parms: String): Array[Byte] = {
    val pred = PdfTextCodec.int(parms, "/Predictor").getOrElse(1)
    if (pred <= 1) return data
    val colors = PdfTextCodec.int(parms, "/Colors").getOrElse(1)
    val bpc = PdfTextCodec.int(parms, "/BitsPerComponent").getOrElse(8)
    val columns = PdfTextCodec.int(parms, "/Columns").getOrElse(1)
    if (pred == 2) tiffUnpredict(data, colors, bpc, columns)
    else pngUnpredict(data, colors, bpc, columns)
  }

  private def tiffUnpredict(data: Array[Byte], colors: Int, bpc: Int,
                            columns: Int): Array[Byte] = {
    // 8-bit components: in-place left-neighbor accumulation per row.
    // Sub-byte TIFF prediction is vanishingly rare; identity keeps the
    // bytes inspectable rather than corrupting them with a wrong guess.
    if (bpc != 8) return data
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = colors * columns
    val out = data.clone()
    var row = 0
    while (row * rowLen < out.length) {
      val base = row * rowLen
      var i = bpp
      while (i < rowLen && base + i < out.length) {
        out(base + i) = ((out(base + i) + out(base + i - bpp)) & 0xFF).toByte
        i += 1
      }
      row += 1
    }
    out
  }

  private def pngUnpredict(data: Array[Byte], colors: Int, bpc: Int,
                           columns: Int): Array[Byte] = {
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = (colors.toLong * bpc * columns + 7).toInt / 8
    val out = new java.io.ByteArrayOutputStream(data.length)
    val prev = new Array[Byte](rowLen)
    var pos = 0
    while (pos + 1 <= data.length) {
      val tag = data(pos) & 0xFF
      pos += 1
      val n = math.min(rowLen, data.length - pos)
      if (n <= 0) return out.toByteArray
      val row = java.util.Arrays.copyOfRange(data, pos, pos + n)
      pos += n
      var i = 0
      while (i < n) {
        val a = if (i >= bpp) row(i - bpp) & 0xFF else 0          // left
        val b = prev(i) & 0xFF                                    // up
        val c = if (i >= bpp) prev(i - bpp) & 0xFF else 0         // up-left
        val x = row(i) & 0xFF
        val v = tag match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => x
        }
        row(i) = (v & 0xFF).toByte
        i += 1
      }
      out.write(row, 0, n)
      System.arraycopy(row, 0, prev, 0, n)
    }
    out.toByteArray
  }

  // -------------------------------------------------------------------- LZW

  /** LZWDecode: variable 9-12 bit codes packed MSB-first; 256 = clear
    * table, 257 = end of data. `earlyChange` (default 1) widens the code
    * one entry before the table would overflow the current width.
    */
  def lzw(data: Array[Byte], earlyChange: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 3)
    var table = collection.mutable.ArrayBuffer.tabulate(258)(i =>
      if (i < 256) Array(i.toByte) else Array.empty[Byte])
    var codeLen = 9
    var prev: Array[Byte] = null
    var acc = 0L; var accBits = 0; var pos = 0
    def nextCode(): Int = {
      while (accBits < codeLen && pos < data.length) {
        acc = (acc << 8) | (data(pos) & 0xFF); accBits += 8; pos += 1
      }
      if (accBits < codeLen) -1
      else {
        val c = ((acc >> (accBits - codeLen)) & ((1 << codeLen) - 1)).toInt
        accBits -= codeLen
        c
      }
    }
    var code = nextCode()
    while (code >= 0 && code != 257) {
      if (code == 256) {
        table = collection.mutable.ArrayBuffer.tabulate(258)(i =>
          if (i < 256) Array(i.toByte) else Array.empty[Byte])
        codeLen = 9
        prev = null
      } else {
        val entry =
          if (code < table.length) table(code)
          // KwKwK: ONLY the next-to-be-assigned code is legal; anything
          // further out is corruption and must throw so the caller
          // dead-letters instead of extracting fabricated text
          else if (code == table.length && prev != null) prev :+ prev(0)
          else throw new java.io.IOException(
            s"LZW: invalid code $code with table size ${table.length}")
        out.write(entry, 0, entry.length)
        if (prev != null) table += (prev :+ entry(0))
        prev = entry
        // widen when the NEXT code to assign (= table.length) would not
        // fit, `earlyChange` entries early (default 1 — the encoder
        // switches one code before overflow, per spec Table 8)
        if (table.length + earlyChange >= (1 << codeLen) && codeLen < 12)
          codeLen += 1
      }
      code = nextCode()
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------- ASCII85

  /** ASCII85Decode: 5 chars ('!'..'u', offset 33) -> 4 bytes base 85;
    * 'z' = four zero bytes (whole-group shorthand); `~>` terminates; a
    * trailing group of n in 2..4 chars yields n-1 bytes (pad with 'u').
    */
  def ascii85(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5 + 4)
    val group = new Array[Int](5)
    var g = 0
    var i = 0
    def flush(n: Int): Unit = {
      var v = 0L
      var k = 0
      while (k < 5) { v = v * 85 + (if (k < n) group(k) else 84); k += 1 }
      val bytes = Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      out.write(bytes, 0, n - 1)
    }
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xFF
      if (c == '~') done = true
      else if (c == 'z' && g == 0) { out.write(Array[Byte](0, 0, 0, 0), 0, 4) }
      else if (c >= '!' && c <= 'u') {
        group(g) = c - '!'
        g += 1
        if (g == 5) { flush(5); g = 0 }
      } // whitespace and stray bytes skipped
      i += 1
    }
    if (g >= 2) flush(g)
    out.toByteArray
  }

  /** ASCIIHexDecode: hex pairs, whitespace-transparent, `>` terminates;
    * an odd final digit is padded with 0.
    */
  def asciiHex(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 1)
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xFF
      val d = Character.digit(c, 16)
      if (c == '>') done = true
      else if (d >= 0) {
        if (hi < 0) hi = d
        else { out.write((hi << 4) | d); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  // -------------------------------------------------------------- RunLength

  /** RunLengthDecode: tag 0-127 copies tag+1 literal bytes; 129-255
    * repeats the next byte 257-tag times; 128 = end of data.
    */
  def runLength(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 2)
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val tag = data(i) & 0xFF
      if (tag == 128) done = true
      else if (tag < 128) {
        val n = math.min(tag + 1, data.length - i - 1)
        out.write(data, i + 1, n)
        i += 1 + n
      } else {
        if (i + 1 < data.length) {
          val b = data(i + 1)
          var k = 0
          while (k < 257 - tag) { out.write(b); k += 1 }
        }
        i += 2
      }
    }
    out.toByteArray
  }
}
