package graft.sources

import java.util.zip.Inflater

import graft.sources.AdaptiveTable.Word

/** Genuine-PDF text extraction with zero codec jars: classic-layout PDF
  * object parsing, FlateDecode via JDK [[java.util.zip.Inflater]], a
  * content-stream tokenizer/interpreter for the text operators
  * (BT/ET, Td/TD/Tm/T*, Tf/TL/Tc/Tw/Tz, Tj/TJ/'/"), ToUnicode CMap
  * decoding, and page-rotation-normalized positioned words — exactly the
  * `(text, x0, top)` boxes [[AdaptiveTable]] consumes, so the reference's
  * adaptive column discovery (pdf_parser.py:52-96, which runs pdfplumber's
  * extract_words + explicit-vertical-lines table extraction) runs on real
  * bytes end to end.
  *
  * Scope (documented): object DISCOVERY is a whole-byte-stream scan
  * (resilient to broken xref offsets, like pdfplumber's repair path),
  * extended with PDF 1.5 support — /Type /ObjStm compressed object
  * streams are unpacked, with /Type /XRef cross-reference-stream
  * directives (type-2 entries) deciding which member generation wins.
  * Stream filters: FlateDecode/LZWDecode with PNG/TIFF predictors,
  * ASCII85/ASCIIHex, RunLength ([[PdfStreamFilters]]). Encrypted
  * documents with an EMPTY user password decrypt transparently
  * (RC4 40-128 and AES-128, [[PdfCrypto]]); password-protected files
  * fail parse and take the caller's corrupt/DLQ path. Fonts: simple
  * fonts with /Widths (+ ToUnicode when present; Type0 fonts get
  * 2-byte code splitting and ToUnicode but default advance widths).
  * Everything here is a pure function of the bytes and runs
  * executor-side.
  */
object PdfTextCodec {

  // ---------------------------------------------------------------- objects

  /** One indirect object: its dictionary text (latin-1, byte-transparent)
    * and, when present, the RAW stream bytes (still compressed).
    */
  final case class PdfObj(num: Int, dict: String, streamRaw: Option[Array[Byte]])

  private val ObjStart = """(\d+)\s+0\s+obj""".r

  /** Scan every `N 0 obj … endobj` in the file. Latin-1 decoding is
    * byte-transparent, so string indexes are byte offsets and stream
    * payloads can be recovered exactly.
    */
  def objects(bytes: Array[Byte]): Map[Int, PdfObj] = {
    val s = new String(bytes, "ISO-8859-1")
    // `cursor` tracks the end of the last object's span: an `N 0 obj`
    // byte pattern INSIDE a (compressed) stream payload must not spawn
    // a phantom object that shadows the real one. Later matches outside
    // any span still win (classic incremental-update appends).
    var cursor = 0
    val out = Map.newBuilder[Int, PdfObj]
    ObjStart.findAllMatchIn(s).foreach { m => if (m.start >= cursor) {
      val num = m.group(1).toInt
      val bodyStart = m.end
      val streamKw = s.indexOf("stream", bodyStart)
      val endobj = s.indexOf("endobj", bodyStart) match {
        case -1 => s.length
        case i  => i
      }
      if (streamKw >= 0 && streamKw < endobj) {
        val dict = s.substring(bodyStart, streamKw)
        // EOL after the `stream` keyword: CRLF or LF (spec 7.3.8.1)
        var dataStart = streamKw + "stream".length
        if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
        // Slice by a literal /Length when it lands on (within EOL slack
        // of) an endstream keyword — stream DATA may itself contain the
        // bytes "endstream", and cutting at the first occurrence would
        // silently truncate it. Indirect /Length (rare for content
        // streams) falls back to the first-keyword heuristic.
        val end = int(dict, "/Length") match {
          case Some(n) if n >= 0 && dataStart + n <= s.length && {
              val kw = s.indexOf("endstream", dataStart + n)
              kw >= 0 && kw - (dataStart + n) <= 2 // at most CRLF between
            } => dataStart + n
          case _ => s.indexOf("endstream", dataStart) match {
            case -1 => endobj
            case i  => i
          }
        }
        out += num -> PdfObj(num, dict,
          Some(s.substring(dataStart, end).getBytes("ISO-8859-1")))
        cursor = end
      } else {
        out += num -> PdfObj(num, s.substring(bodyStart, endobj), None)
        cursor = endobj
      }
    }}
    out.result()
  }

  // ------------------------------------------------------------ dict values

  // key must end at a delimiter ("/Font" must not match "/FontDescriptor")
  private def quoted(key: String) = java.util.regex.Pattern.quote(key) + """(?![A-Za-z0-9])"""

  /** `/Key 7 0 R` -> Some(7). */
  def ref(dict: String, key: String): Option[Int] =
    (quoted(key) + """\s*(\d+)\s+0\s+R""").r
      .findFirstMatchIn(dict).map(_.group(1).toInt)

  /** `/Key 42` (direct integer, NOT a reference — the `(?!\d)` stops the
    * digit match from backtracking `/Length 16 0 R` into a literal 1).
    */
  def int(dict: String, key: String): Option[Int] =
    (quoted(key) + """\s*(-?\d+)(?!\d)(?!\s+0\s+R)""").r
      .findFirstMatchIn(dict).map(_.group(1).toInt)

  /** `/Key [n n n n]` -> numbers. */
  def numArray(dict: String, key: String): Option[Seq[Double]] =
    (quoted(key) + """\s*\[([^\]]*)\]""").r.findFirstMatchIn(dict)
      .map(_.group(1).trim.split("""[\s]+""").toSeq.filter(_.nonEmpty)
        .flatMap(_.toDoubleOption))

  /** The balanced `<<…>>` span starting at `start` (which must point at
    * `<<`), handling nested dictionaries — needed because values like
    * /Resources<</ProcSet[…]/Font<<…>>>> defeat plain regexes.
    */
  def dictSpan(s: String, start: Int): String = {
    var depth = 0; var i = start
    while (i < s.length - 1) {
      if (s.charAt(i) == '<' && s.charAt(i + 1) == '<') { depth += 1; i += 2 }
      else if (s.charAt(i) == '>' && s.charAt(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return s.substring(start, i)
      } else i += 1
    }
    s.substring(start)
  }

  /** `/Key <<…>>` inline dict or `/Key N 0 R` indirect dict. */
  def subDict(objs: Map[Int, PdfObj], dict: String, key: String): Option[String] = {
    val m = (quoted(key) + """\s*""").r.findFirstMatchIn(dict)
    m.flatMap { mm =>
      val rest = dict.substring(mm.end)
      if (rest.startsWith("<<")) Some(dictSpan(dict, mm.end))
      else ref(dict, key).flatMap(objs.get).map(_.dict)
    }
  }

  /** Stream /Length: literal int or indirect reference to an int object. */
  private def streamLength(objs: Map[Int, PdfObj], dict: String): Option[Int] =
    int(dict, "/Length").orElse(
      ref(dict, "/Length").flatMap(objs.get)
        .flatMap(o => """(\d+)""".r.findFirstMatchIn(o.dict).map(_.group(1).toInt)))

  // ---------------------------------------------------------------- inflate

  /** zlib-inflate (FlateDecode). Tolerates trailing whitespace the
    * endstream fallback may have included; throws on corrupt data (the
    * caller's parse() turns that into a fallback).
    */
  def inflate(raw: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(raw)
    val out = new java.io.ByteArrayOutputStream(raw.length * 4)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0) {
          if (inf.finished()) ()
          else throw new java.util.zip.DataFormatException("truncated deflate stream")
        } else out.write(buf, 0, n)
      }
    } finally inf.end()
    out.toByteArray
  }

  /** /Filter chain of a stream dict, in application order, each with
    * the raw text of its matching /DecodeParms (or /DP) dict ("" when
    * absent/null). Array-form parms align by position; indirect parm
    * dicts resolve through `objs`.
    */
  private[sources] def filterChain(objs: Map[Int, PdfObj],
                                   dict: String): Seq[(String, String)] = {
    val names: Seq[String] =
      (quoted("/Filter") + """\s*\[([^\]]*)\]""").r.findFirstMatchIn(dict)
        .map(m => """/(\w+)""".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)
        .orElse((quoted("/Filter") + """\s*/(\w+)""").r
          .findFirstMatchIn(dict).map(m => Seq(m.group(1))))
        // indirect /Filter (legal for any dict value): resolve the
        // referenced object's body as name-or-array — yielding Nil here
        // would hand still-compressed bytes onward as "decoded"
        .orElse(ref(dict, "/Filter").flatMap(objs.get).map { o =>
          val body = o.dict
          """\[([^\]]*)\]""".r.findFirstMatchIn(body)
            .map(m => """/(\w+)""".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)
            .getOrElse("""/(\w+)""".r.findAllMatchIn(body).map(_.group(1)).toSeq)
        })
        .getOrElse(Nil)
    if (names.isEmpty) return Nil
    def parmsAt(key: String): Seq[String] =
      (quoted(key) + """\s*""").r.findFirstMatchIn(dict).map { m =>
        val i = m.end
        if (dict.startsWith("<<", i)) Seq(dictSpan(dict, i))
        else if (dict.startsWith("[", i)) {
          // walk the array: dicts, nulls, indirect refs — one slot per filter
          val out = Seq.newBuilder[String]
          var p = i + 1
          var stop = false
          while (p < dict.length && !stop) {
            val c = dict.charAt(p)
            if (c.isWhitespace) p += 1
            else if (c == ']') stop = true
            else if (dict.startsWith("<<", p)) {
              val span = dictSpan(dict, p); out += span; p += span.length
            } else if (dict.startsWith("null", p)) { out += ""; p += 4 }
            else {
              """^(\d+)\s+0\s+R""".r.findFirstMatchIn(dict.substring(p)) match {
                case Some(r) =>
                  out += objs.get(r.group(1).toInt).map(_.dict).getOrElse("")
                  p += r.end
                case None => stop = true // malformed — stop aligning
              }
            }
          }
          out.result()
        } else ref(dict, key).flatMap(objs.get).map(o => Seq(o.dict)).getOrElse(Nil)
      }.getOrElse(Nil)
    val parms = {
      val p = parmsAt("/DecodeParms")
      if (p.nonEmpty) p else parmsAt("/DP")
    }
    names.zipWithIndex.map { case (n, i) => n -> parms.lift(i).getOrElse("") }
  }

  /** Decoded stream bytes of one object: trimmed to /Length when it is
    * resolvable (the endstream scan can overshoot by the EOL before the
    * keyword), decrypted when the document is encrypted, then run
    * through the declared /Filter chain (Flate/LZW with predictors,
    * ASCII85/Hex, RunLength — [[PdfStreamFilters]]).
    */
  def streamData(objs: Map[Int, PdfObj], o: PdfObj): Option[Array[Byte]] =
    streamData(objs, o, None)

  def streamData(objs: Map[Int, PdfObj], o: PdfObj,
                 dec: Option[PdfCrypto.Decryptor]): Option[Array[Byte]] =
    o.streamRaw.map { raw0 =>
      val raw = streamLength(objs, o.dict).filter(_ <= raw0.length)
        .map(raw0.take).getOrElse {
          // strip the EOL the endstream keyword follows
          var n = raw0.length
          while (n > 0 && (raw0(n - 1) == '\n' || raw0(n - 1) == '\r')) n -= 1
          raw0.take(n)
        }
      val clear = dec.map(_.decrypt(o.num, raw)).getOrElse(raw)
      filterChain(objs, o.dict).foldLeft(clear) { case (d, (name, parms)) =>
        PdfStreamFilters.decode(name, d, parms)
      }
    }

  // ------------------------------------------- PDF 1.5 object/xref streams

  /** `obj num -> container ObjStm num` directives from the NEWEST
    * cross-reference stream chain (`startxref` -> /Type /XRef object ->
    * /Prev …): type-2 entries say which compressed object stream holds
    * the current generation of an object. W-field triplets are
    * big-endian; the stream itself is typically FlateDecode with PNG-Up
    * (/Predictor 12), which [[PdfStreamFilters.unpredict]] reverses.
    * Empty when the file ends in a classic xref table (the byte scan
    * already covers those) or the chain is unparseable — directives
    * refine precedence, they are not required for object discovery.
    */
  private def xrefStmDirectives(s: String, objs: Map[Int, PdfObj]): Map[Int, Int] = {
    val out = collection.mutable.Map.empty[Int, Int]
    // every object number DECIDED by a newer section — any entry type.
    // A newer type-1 (top-level rewrite) must shadow an older type-2
    // directive, not just newer type-2s shadowing older ones.
    val decided = collection.mutable.Set.empty[Int]
    try {
      val sx = s.lastIndexOf("startxref")
      if (sx < 0) return Map.empty
      var offset = """\d+""".r
        .findFirstIn(s.substring(sx + 9, math.min(s.length, sx + 40)))
        .flatMap(_.toIntOption).getOrElse(-1)
      val seen = collection.mutable.Set.empty[Int]
      while (offset >= 0 && offset < s.length && seen.add(offset)) {
        val head = s.substring(offset, math.min(s.length, offset + 64))
        """^\s*(\d+)\s+\d+\s+obj""".r.findFirstMatchIn(head)
          .flatMap(m => objs.get(m.group(1).toInt))
          .filter(o => """/Type\s*/XRef""".r.findFirstIn(o.dict).isDefined) match {
          case Some(o) =>
            val data = streamData(objs, o, None).getOrElse(Array.emptyByteArray)
            val w = numArray(o.dict, "/W").getOrElse(Nil).map(_.toInt)
            if (w.length >= 3 && w.sum > 0) {
              val size = int(o.dict, "/Size").getOrElse(0)
              val index = numArray(o.dict, "/Index").map(_.map(_.toInt))
                .getOrElse(Seq(0, size))
              val entryLen = w.sum
              var pos = 0
              index.grouped(2).foreach {
                case Seq(start, count) =>
                  var k = 0
                  while (k < count && pos + entryLen <= data.length) {
                    def field(off: Int, len: Int): Long = {
                      var v = 0L; var j = 0
                      while (j < len) { v = (v << 8) | (data(pos + off + j) & 0xFF); j += 1 }
                      v
                    }
                    // omitted type field defaults to 1 (uncompressed)
                    val t = if (w(0) == 0) 1L else field(0, w(0))
                    val num = start + k
                    // first writer wins ACROSS types: the chain walks
                    // newest-first, and whichever section mentions the
                    // object first decides whether it is compressed
                    if (decided.add(num) && t == 2L)
                      out(num) = field(w(0), w(1)).toInt
                    pos += entryLen
                    k += 1
                  }
                case _ =>
              }
            }
            offset = int(o.dict, "/Prev").getOrElse(-1)
          case None => offset = -1 // classic table or unparseable: stop
        }
      }
    } catch { case scala.util.control.NonFatal(_) => }
    out.toMap
  }

  /** Unpack one /Type /ObjStm: header is /N (num, offset) integer pairs;
    * member i's body spans [/First+off_i, /First+off_{i+1}). Members are
    * direct objects (dict/array/number bodies, never streams).
    */
  private def objStmMembers(objs: Map[Int, PdfObj], o: PdfObj,
                            dec: Option[PdfCrypto.Decryptor]): Seq[(Int, String)] =
    (for {
      data <- streamData(objs, o, dec)
      n <- int(o.dict, "/N")
      first <- int(o.dict, "/First")
    } yield {
      val s = new String(data, "ISO-8859-1")
      val header = s.substring(0, math.min(math.max(first, 0), s.length))
      val nums = """\d+""".r.findAllIn(header).flatMap(_.toIntOption).toSeq
      val pairs = nums.grouped(2).collect { case Seq(a, b) => (a, b) }.toSeq.take(n)
      pairs.zipWithIndex.map { case ((num, off), i) =>
        val start = math.min(first + off, s.length)
        val end = pairs.lift(i + 1)
          .map(p => math.min(first + p._2, s.length)).getOrElse(s.length)
        num -> s.substring(start, math.max(start, end))
      }
    }).getOrElse(Nil)

  /** The COMPLETE object map of a document plus its decryptor: classic
    * byte scan, encryption probe (throws on a non-empty user password),
    * per-object string decryption of top-level dicts, and /Type /ObjStm
    * member expansion. Precedence: xref-stream directives (newest
    * chain) > top-level scanned objects > remaining ObjStm members
    * (later containers win) — so an incremental update is honored
    * whichever side of the compression boundary it lands on.
    */
  private[sources] def load(bytes: Array[Byte]): (Map[Int, PdfObj], Option[PdfCrypto.Decryptor]) = {
    val s = new String(bytes, "ISO-8859-1")
    val base = objects(bytes)
    val dec = PdfCrypto.forDocument(s, base)
    // the /Encrypt dictionary's own strings (O, U) are stored clear
    val encNum = PdfCrypto.encryptRef(s)
    val top = dec match {
      case Some(d) => base.map { case (n, o) =>
        if (encNum.contains(n)) n -> o
        else n -> o.copy(dict = PdfCrypto.decryptDictStrings(o.dict, n, d))
      }
      case None => base
    }
    val containers = top.values
      .filter(o => """/Type\s*/ObjStm""".r.findFirstIn(o.dict).isDefined)
      .toSeq.sortBy(_.num)
    val members: Seq[(Int, Int, String)] = containers.flatMap(o =>
      objStmMembers(top, o, dec).map { case (num, body) => (num, o.num, body) })
    val directed = {
      val directives = xrefStmDirectives(s, base)
      members.collect {
        case (n, c, b) if directives.get(n).contains(c) => n -> PdfObj(n, b, None)
      }.toMap
    }
    val fill = members.collect {
      case (n, _, b) if !top.contains(n) && !directed.contains(n) =>
        n -> PdfObj(n, b, None)
    }.toMap
    (fill ++ top ++ directed, dec)
  }

  // ------------------------------------------------------------------ fonts

  /** What the interpreter needs from one font resource. `code` is a font
    * byte (or 2-byte code for Type0); widths in glyph space (1/1000 em).
    * `encoding` is the simple-font code->unicode table derived from
    * /Encoding (base encoding + /Differences) — consulted when the font
    * carries no ToUnicode CMap entry for the code.
    */
  final case class Font(firstChar: Int, widths: Array[Int],
                        toUnicode: Map[Int, String], twoByte: Boolean,
                        encoding: Map[Int, String] = Map.empty) {
    def width(code: Int): Int = {
      val i = code - firstChar
      if (i >= 0 && i < widths.length) widths(i) else 500
    }
    def uni(code: Int): String =
      toUnicode.getOrElse(code,
        encoding.getOrElse(code,
          // last resort: printable-ASCII identity (the overlap of every
          // standard simple-font encoding)
          if (code >= 32 && code <= 126 && !twoByte) code.toChar.toString else ""))
  }

  // ------------------------------------------------- simple-font encodings

  /** Adobe Glyph List subset covering the glyph names the standard base
    * encodings and real-world /Differences arrays use: ASCII symbol
    * names, Latin-1 letters, and the CP1252 typographic extras. Names
    * outside the table resolve algorithmically (uniXXXX / uXXXX[XX]).
    */
  private val GlyphNames: Map[String, String] = {
    val ascii = Map(
      "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"", "numbersign" -> "#",
      "dollar" -> "$", "percent" -> "%", "ampersand" -> "&", "quotesingle" -> "'",
      "parenleft" -> "(", "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
      "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
      "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3", "four" -> "4",
      "five" -> "5", "six" -> "6", "seven" -> "7", "eight" -> "8", "nine" -> "9",
      "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
      "greater" -> ">", "question" -> "?", "at" -> "@", "bracketleft" -> "[",
      "backslash" -> "\\", "bracketright" -> "]", "asciicircum" -> "^",
      "underscore" -> "_", "grave" -> "`", "braceleft" -> "{", "bar" -> "|",
      "braceright" -> "}", "asciitilde" -> "~")
    val letters = (('A' to 'Z') ++ ('a' to 'z')).map(c => c.toString -> c.toString)
    // Latin-1 supplement by AGL name, in code order 0xA1..0xFF
    val latin1 = Seq(
      "exclamdown", "cent", "sterling", "currency", "yen", "brokenbar",
      "section", "dieresis", "copyright", "ordfeminine", "guillemotleft",
      "logicalnot", "softhyphen", "registered", "macron", "degree",
      "plusminus", "twosuperior", "threesuperior", "acute", "mu",
      "paragraph", "periodcentered", "cedilla", "onesuperior",
      "ordmasculine", "guillemotright", "onequarter", "onehalf",
      "threequarters", "questiondown", "Agrave", "Aacute", "Acircumflex",
      "Atilde", "Adieresis", "Aring", "AE", "Ccedilla", "Egrave", "Eacute",
      "Ecircumflex", "Edieresis", "Igrave", "Iacute", "Icircumflex",
      "Idieresis", "Eth", "Ntilde", "Ograve", "Oacute", "Ocircumflex",
      "Otilde", "Odieresis", "multiply", "Oslash", "Ugrave", "Uacute",
      "Ucircumflex", "Udieresis", "Yacute", "Thorn", "germandbls",
      "agrave", "aacute", "acircumflex", "atilde", "adieresis", "aring",
      "ae", "ccedilla", "egrave", "eacute", "ecircumflex", "edieresis",
      "igrave", "iacute", "icircumflex", "idieresis", "eth", "ntilde",
      "ograve", "oacute", "ocircumflex", "otilde", "odieresis", "divide",
      "oslash", "ugrave", "uacute", "ucircumflex", "udieresis", "yacute",
      "thorn", "ydieresis")
      .zipWithIndex.map { case (nm, i) => nm -> (0xA1 + i).toChar.toString }
    val extras = Map(
      "Euro" -> "€", "quotesinglbase" -> "‚", "florin" -> "ƒ",
      "quotedblbase" -> "„", "ellipsis" -> "…", "dagger" -> "†",
      "daggerdbl" -> "‡", "circumflex" -> "ˆ",
      "perthousand" -> "‰", "Scaron" -> "Š",
      "guilsinglleft" -> "‹", "OE" -> "Œ", "Zcaron" -> "Ž",
      "quoteleft" -> "‘", "quoteright" -> "’",
      "quotedblleft" -> "“", "quotedblright" -> "”",
      "bullet" -> "•", "endash" -> "–", "emdash" -> "—",
      "tilde" -> "˜", "trademark" -> "™", "scaron" -> "š",
      "guilsinglright" -> "›", "oe" -> "œ", "zcaron" -> "ž",
      "Ydieresis" -> "Ÿ", "nbspace" -> " ", "minus" -> "−",
      "fi" -> "ﬁ", "fl" -> "ﬂ", "dotlessi" -> "ı",
      "fraction" -> "⁄", "currency1" -> "¤")
    ascii ++ letters ++ latin1.toMap ++ extras
  }

  /** Glyph name -> unicode: table first, then the algorithmic AGL forms
    * (uniXXXX[XXXX…], uXXXX..XXXXXX); unknown names contribute nothing.
    */
  def glyphToUni(name: String): String =
    GlyphNames.getOrElse(name, {
      if (name.startsWith("uni") && name.length >= 7 &&
        (name.length - 3) % 4 == 0)
        scala.util.Try(name.drop(3).grouped(4)
          .map(h => Integer.parseInt(h, 16).toChar).mkString).getOrElse("")
      else if (name.startsWith("u") && name.length >= 5 && name.length <= 7)
        scala.util.Try(
          new String(Character.toChars(Integer.parseInt(name.drop(1), 16))))
          .getOrElse("")
      else ""
    })

  /** Code->unicode for one of the named base encodings, derived from the
    * JDK charsets (WinAnsiEncoding IS windows-1252; MacRomanEncoding is
    * x-MacRoman). Codes the encoding leaves undefined map to nothing.
    * Only the high range is tabulated — 32..126 is ASCII identity in
    * every standard simple-font encoding and handled by the fallback.
    */
  private def charsetTable(charsetName: String): Map[Int, String] =
    scala.util.Try(java.nio.charset.Charset.forName(charsetName)).toOption
      .map { cs =>
        (128 to 255).flatMap { code =>
          val s = new String(Array(code.toByte), cs)
          val c = if (s.length == 1) s.charAt(0) else '�'
          if (c == '�' || Character.isISOControl(c)) None
          else Some(code -> c.toString)
        }.toMap
      }.getOrElse(Map.empty)

  private lazy val WinAnsiTable = charsetTable("windows-1252")
  private lazy val MacRomanTable = charsetTable("x-MacRoman")

  private def baseEncodingTable(nm: String): Map[Int, String] = nm match {
    case "WinAnsiEncoding"  => WinAnsiTable
    case "MacRomanEncoding" => MacRomanTable
    // StandardEncoding (and PDFDocEncoding) high ranges are rare in the
    // wild for text fonts; ASCII identity covers their shared low range
    case _ => Map.empty
  }

  private val DifferencesRe = """/Differences\s*\[([^\]]*)\]""".r
  private val DiffItemRe = """/([^\s/\[\]<>()]+)|(-?\d+)""".r

  /** /Differences [ c1 /name /name c2 /name … ]: each number resets the
    * current code, each name maps the current code then increments it.
    */
  private[sources] def parseDifferences(encDict: String): Map[Int, String] = {
    DifferencesRe.findFirstMatchIn(encDict).map { m =>
      val out = Map.newBuilder[Int, String]
      var code = 0
      DiffItemRe.findAllMatchIn(m.group(1)).foreach { it =>
        if (it.group(2) != null) code = it.group(2).toInt
        else {
          val u = glyphToUni(it.group(1))
          if (u.nonEmpty) out += code -> u
          code += 1
        }
      }
      out.result()
    }.getOrElse(Map.empty)
  }

  /** The /Encoding-derived code map of a simple font: a bare encoding
    * name, or a dict (inline or referenced) with optional /BaseEncoding
    * and /Differences overriding it (PDF 32000 §9.6.6). This is what
    * recovers "Peñafrancia"-class accented text from fonts that carry
    * no ToUnicode CMap (the pdfplumber behavior on the reference corpus,
    * `pdf_parser.py:52-96`).
    */
  private def encodingMap(objs: Map[Int, PdfObj], fontDict: String): Map[Int, String] = {
    val nameRe = (quoted("/Encoding") + """\s*/([A-Za-z0-9.-]+)""").r
    nameRe.findFirstMatchIn(fontDict).map(_.group(1)) match {
      case Some(nm) => baseEncodingTable(nm)
      case None =>
        subDict(objs, fontDict, "/Encoding").map { ed =>
          val base = """/BaseEncoding\s*/([A-Za-z0-9.-]+)""".r
            .findFirstMatchIn(ed).map(m => baseEncodingTable(m.group(1)))
            .getOrElse(Map.empty)
          base ++ parseDifferences(ed)
        }.getOrElse(Map.empty)
    }
  }

  private val BfChar = """<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>""".r
  private val BfRangeList = """<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>\s*\[([^\]]*)\]""".r
  private val BfRange = """<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>\s*<([0-9a-fA-F]+)>""".r
  private val HexItem = """<([0-9a-fA-F]+)>""".r

  private def utf16(hex: String): String = {
    val padded = if (hex.length % 4 == 0) hex else ("0" * (4 - hex.length % 4)) + hex
    padded.grouped(4).map(h => Integer.parseInt(h, 16).toChar).mkString
  }

  /** Parse a ToUnicode CMap (bfchar + bfrange, incl. the array form). */
  def parseCMap(cmap: String): Map[Int, String] = {
    val out = Map.newBuilder[Int, String]
    """beginbfchar([\s\S]*?)endbfchar""".r.findAllMatchIn(cmap).foreach { sec =>
      BfChar.findAllMatchIn(sec.group(1)).foreach { m =>
        out += Integer.parseInt(m.group(1), 16) -> utf16(m.group(2))
      }
    }
    """beginbfrange([\s\S]*?)endbfrange""".r.findAllMatchIn(cmap).foreach { sec =>
      // array form first: the triple-hex regex would half-match it
      val body = sec.group(1)
      BfRangeList.findAllMatchIn(body).foreach { m =>
        val lo = Integer.parseInt(m.group(1), 16)
        HexItem.findAllMatchIn(m.group(3)).zipWithIndex.foreach { case (h, i) =>
          out += (lo + i) -> utf16(h.group(1))
        }
      }
      // strip the array-form entries BEFORE the triple-hex scan: three
      // consecutive items of a [<..> <..> <..>] body would otherwise
      // match as a bogus contiguous range and override real mappings
      val scalarBody = BfRangeList.replaceAllIn(body, " ")
      BfRange.findAllMatchIn(scalarBody).foreach { m =>
        val lo = Integer.parseInt(m.group(1), 16)
        val hi = Integer.parseInt(m.group(2), 16)
        val dst = Integer.parseInt(m.group(3), 16)
        // per spec only the LAST byte increments, but contiguous single-
        // range maps (the common emitter output) are covered either way
        (lo to hi).foreach(c => out += c -> new String(Character.toChars(dst + c - lo)))
      }
    }
    out.result()
  }

  private def loadFont(objs: Map[Int, PdfObj], fontDict: String,
                       dec: Option[PdfCrypto.Decryptor]): Font = {
    val twoByte = fontDict.contains("/Type0")
    val firstChar = int(fontDict, "/FirstChar").getOrElse(0)
    // indirect /Widths: the referenced object's BODY is the array
    // (possibly bracketed) — parse its numbers directly; re-wrapping in
    // brackets would glue '[' onto the first width and drop it
    val widths = numArray(fontDict, "/Widths")
      .orElse(ref(fontDict, "/Widths").flatMap(objs.get).flatMap { o =>
        val body = o.dict
        val inner =
          if (body.contains("[") && body.lastIndexOf("]") > body.indexOf("["))
            body.substring(body.indexOf("[") + 1, body.lastIndexOf("]"))
          else body
        val nums = inner.trim.split("""\s+""").toSeq
          .filter(_.nonEmpty).flatMap(_.toDoubleOption)
        if (nums.nonEmpty) Some(nums) else None
      })
      .getOrElse(Seq.empty).map(_.toInt).toArray
    val toUni = ref(fontDict, "/ToUnicode").flatMap(objs.get)
      .flatMap(o => streamData(objs, o, dec))
      .map(b => parseCMap(new String(b, "ISO-8859-1")))
      .getOrElse(Map.empty)
    // /Encoding only applies to simple fonts; a Type0 code is a CID,
    // decodable only through its ToUnicode CMap
    val enc = if (twoByte) Map.empty[Int, String] else encodingMap(objs, fontDict)
    Font(firstChar, widths, toUni, twoByte, enc)
  }

  // ------------------------------------------------- content-stream tokens

  sealed trait Tok
  final case class TNum(v: Double) extends Tok
  final case class TStr(codes: Array[Int]) extends Tok
  final case class TName(v: String) extends Tok
  final case class TArr(items: Seq[Tok]) extends Tok
  final case class TOp(v: String) extends Tok

  /** Tokenize a decoded content stream (latin-1 text). Handles literal
    * strings with escapes and balanced parens, hex strings, arrays,
    * names, numbers, inline dicts (skipped) and inline images (BI…EI
    * skipped) — enough for any text-bearing stream.
    */
  def tokenize(s: String): Seq[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    var arrays = List.empty[collection.mutable.ArrayBuffer[Tok]]
    def emit(t: Tok): Unit = arrays match {
      case buf :: _ => buf += t
      case Nil      => out += t
    }
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == 0) i += 1
      else if (c == '%') { while (i < n && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1 }
      else if (c == '(') {
        // ONE literal-string grammar for the whole codec: the crypto
        // layer's parseStringAt (escapes, octal, balanced parens) is
        // the single implementation — a divergent copy here would let
        // an escape-handling fix silently miss one of the two
        PdfCrypto.parseStringAt(s, i) match {
          case Some((bytes, end)) =>
            emit(TStr(bytes.map(_ & 0xFF)))
            i = end
          case None => i += 1
        }
      }
      else if (c == '<' && i + 1 < n && s.charAt(i + 1) == '<') {
        // inline dict (BDC properties etc.) — skip balanced
        val span = dictSpan(s, i); i += span.length
      }
      else if (c == '<') {
        val close = s.indexOf('>', i + 1)
        val hex = s.substring(i + 1, if (close < 0) n else close)
          .filterNot(_.isWhitespace)
        val padded = if (hex.length % 2 == 0) hex else hex + "0"
        emit(TStr(padded.grouped(2).map(Integer.parseInt(_, 16)).toArray))
        i = (if (close < 0) n else close + 1)
      }
      else if (c == '[') { arrays = collection.mutable.ArrayBuffer.empty[Tok] :: arrays; i += 1 }
      else if (c == ']') {
        arrays match {
          case buf :: rest => arrays = rest; emit(TArr(buf.toSeq))
          case Nil         => // stray — ignore
        }
        i += 1
      }
      else if (c == '/') {
        val start = i + 1; i += 1
        while (i < n && !" \t\r\n\f()<>[]{}/%".contains(s.charAt(i))) i += 1
        emit(TName(s.substring(start, i)))
      }
      else if (c == '+' || c == '-' || c == '.' || c.isDigit) {
        val start = i; i += 1
        while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.' ||
          s.charAt(i) == 'e' || s.charAt(i) == 'E' || s.charAt(i) == '-')) i += 1
        s.substring(start, i).toDoubleOption.foreach(v => emit(TNum(v)))
      }
      else {
        val start = i; i += 1
        while (i < n && (s.charAt(i).isLetter || s.charAt(i) == '*' ||
          s.charAt(i) == '\'' || s.charAt(i) == '"')) i += 1
        val op = s.substring(start, i)
        if (op == "BI") {
          // inline image: skip to the EI operator
          val ei = s.indexOf("EI", i)
          i = if (ei < 0) n else ei + 2
        } else if (op.nonEmpty) emit(TOp(op))
      }
    }
    // tolerate an unterminated array
    arrays.reverse.foreach(buf => out += TArr(buf.toSeq))
    out.result()
  }

  // --------------------------------------------------------- interpretation

  /** Affine matrix (a b c d e f): maps (x,y) -> (a·x+c·y+e, b·x+d·y+f). */
  final case class Mat(a: Double, b: Double, c: Double, d: Double, e: Double, f: Double) {
    def *(o: Mat): Mat = Mat(
      a * o.a + b * o.c, a * o.b + b * o.d,
      c * o.a + d * o.c, c * o.b + d * o.d,
      e * o.a + f * o.c + o.e, e * o.b + f * o.d + o.f)
    def apply(x: Double, y: Double): (Double, Double) =
      (a * x + c * y + e, b * x + d * y + f)
  }
  object Mat { val id: Mat = Mat(1, 0, 0, 1, 0, 0) }

  /** One positioned glyph in DEVICE space: origin, expected next-glyph
    * origin (origin + advance image), and the text run it belongs to
    * (word grouping never crosses runs — each BT/Td/Tm/T* starts one).
    */
  final case class Glyph(uni: String, x: Double, y: Double,
                         nx: Double, ny: Double, run: Int)

  /** Execute the text operators of one content stream. Non-text painting
    * operators only consume their operands.
    */
  def interpret(toks: Seq[Tok], fonts: Map[String, Font]): Seq[Glyph] = {
    val glyphs = Vector.newBuilder[Glyph]
    var ctm = Mat.id
    var tm = Mat.id;  var tlm = Mat.id
    var font: Font = Font(0, Array.empty, Map.empty, twoByte = false)
    var fs = 1.0; var tc = 0.0; var tw = 0.0; var th = 1.0; var tl = 0.0; var rise = 0.0
    // q/Q scope the WHOLE graphics state (spec 8.4.2): text-state
    // parameters set inside q..Q must revert at Q, not leak out
    val gsStack =
      collection.mutable.Stack.empty[(Mat, Font, Double, Double, Double, Double, Double, Double)]
    var tx = 0.0 // accumulated advance along the text line, text space
    var run = 0
    val operands = collection.mutable.ArrayBuffer.empty[Tok]
    def num(i: Int): Double = operands.lift(operands.length - i) match {
      case Some(TNum(v)) => v
      case _             => 0.0
    }
    def newRun(): Unit = { run += 1; tx = 0.0 }
    def show(codes: Array[Int]): Unit = {
      val trm = tm * ctm
      val cs = if (font.twoByte) codes.grouped(2)
        .map(p => if (p.length == 2) p(0) * 256 + p(1) else p(0)).toArray
      else codes
      cs.foreach { code =>
        // word spacing applies to single-byte code 32 only — never to
        // a Type0 combined 2-byte code that happens to equal 32
        // (PDF 32000 §9.3.3)
        val adv = (font.width(code) / 1000.0 * fs + tc +
          (if (code == 32 && !font.twoByte) tw else 0.0)) * th
        val (x0, y0) = trm(tx, rise)
        val (x1, y1) = trm(tx + adv, rise)
        val u = font.uni(code)
        if (u.nonEmpty) glyphs += Glyph(u, x0, y0, x1, y1, run)
        tx += adv
      }
    }
    def td(dx: Double, dy: Double): Unit = {
      tlm = Mat(1, 0, 0, 1, dx, dy) * tlm
      tm = tlm
      newRun()
    }
    toks.foreach {
      case t @ (TNum(_) | TStr(_) | TName(_) | TArr(_)) => operands += t
      case TOp(op) =>
        op match {
          case "q"  => gsStack.push((ctm, font, fs, tc, tw, th, tl, rise))
          case "Q"  => if (gsStack.nonEmpty) {
            val (c, f, s2, c2, w2, h2, l2, r2) = gsStack.pop()
            ctm = c; font = f; fs = s2; tc = c2; tw = w2; th = h2; tl = l2; rise = r2
          }
          case "cm" => ctm = Mat(num(6), num(5), num(4), num(3), num(2), num(1)) * ctm
          case "BT" => tm = Mat.id; tlm = Mat.id; newRun()
          case "ET" =>
          case "Tf" =>
            fs = num(1)
            operands.lift(operands.length - 2) match {
              case Some(TName(nm)) => fonts.get(nm).foreach(font = _)
              case _               =>
            }
          case "TL" => tl = num(1)
          case "Tc" => tc = num(1)
          case "Tw" => tw = num(1)
          case "Tz" => th = num(1) / 100.0
          case "Ts" => rise = num(1)
          case "Td" => td(num(2), num(1))
          case "TD" => tl = -num(1); td(num(2), num(1))
          case "Tm" =>
            tlm = Mat(num(6), num(5), num(4), num(3), num(2), num(1))
            tm = tlm; newRun()
          case "T*" => td(0, -tl)
          case "Tj" => operands.lastOption match {
            case Some(TStr(cs)) => show(cs)
            case _              =>
          }
          case "'" =>
            td(0, -tl)
            operands.lastOption match {
              case Some(TStr(cs)) => show(cs)
              case _              =>
            }
          case "\"" =>
            tw = num(3); tc = num(2)
            td(0, -tl)
            operands.lastOption match {
              case Some(TStr(cs)) => show(cs)
              case _              =>
            }
          case "TJ" => operands.lastOption match {
            case Some(TArr(items)) =>
              items.foreach {
                case TStr(cs) => show(cs)
                case TNum(v)  => tx -= v / 1000.0 * fs * th
                case _        =>
              }
            case _ =>
          }
          case _ => // painting/state op: operands just drop
        }
        operands.clear()
    }
    glyphs.result()
  }

  // ---------------------------------------------------------------- pages

  /** One normalized glyph: text, left x, top, expected next-glyph x, and
    * its text run. Kept alongside the words because table cell slicing is
    * CHAR-accurate in the reference (pdfplumber assigns chars, not words,
    * to cells): a right-aligned amount ending 0.3pt before the next
    * column's text must split at the column boundary even though word
    * grouping would merge them.
    */
  final case class CharBox(uni: String, x0: Double, top: Double, nx: Double, run: Int)

  final case class PdfPage(words: Seq[Word], chars: Seq[CharBox],
                           width: Double, height: Double)
  final case class PdfDoc(pages: IndexedSeq[PdfPage]) {
    /** Rotation-normalized width of page 1 — what detectBoundaries needs. */
    def pageWidth: Double = pages.headOption.map(_.width).getOrElse(0.0)
  }

  /** pdfplumber's default word-split x tolerance (extract_words
    * x_tolerance=3): a larger-than-this gap between the expected and
    * actual next-glyph origin starts a new word.
    */
  val XTolerance = 3.0
  private val YTolerance = 1.0

  /** Group glyphs into words: never across runs, split on whitespace
    * glyphs, vertical jumps, or a FORWARD x gap beyond [[XTolerance]].
    * Backward motion does NOT split: sub-point kerning overlaps inside a
    * word are routine (pdfplumber's rule likewise only checks forward
    * gaps). `splitAt` (sorted column boundaries, when cell-accurate
    * assignment is needed) additionally breaks any word that crosses one.
    */
  private[sources] def toWords(glyphs: Seq[CharBox],
                               splitAt: Seq[Double] = Nil): Seq[Word] = {
    val words = Vector.newBuilder[Word]
    val sb = new StringBuilder
    var wx = 0.0; var wt = 0.0
    var prevX = Double.NaN; var prevEnd = Double.NaN
    var prevTop = Double.NaN; var prevRun = -1
    def flush(): Unit = {
      if (sb.nonEmpty) { words += Word(sb.toString, wx, wt); sb.clear() }
    }
    glyphs.foreach { case CharBox(u, x, top, nx, run) =>
      val crossesBoundary =
        !prevX.isNaN && splitAt.exists(b => prevX < b && x >= b)
      val break = prevEnd.isNaN || run != prevRun ||
        math.abs(top - prevTop) > YTolerance ||
        x > prevEnd + XTolerance || crossesBoundary
      if (u.isBlank) { flush(); prevEnd = Double.NaN; prevX = Double.NaN }
      else {
        if (break) flush()
        if (sb.isEmpty) { wx = x; wt = top }
        sb ++= u
        prevX = x; prevEnd = nx; prevTop = top; prevRun = run
      }
    }
    flush()
    words.result()
  }

  /** /Rotate-aware device→display normalization, pdfplumber-style:
    * x grows right, top grows DOWN from the displayed top-left, and the
    * displayed page width/height swap for 90/270.
    */
  private def normalize(g: Glyph, w: Double, h: Double, rot: Int): CharBox = {
    def pt(x: Double, y: Double): (Double, Double) = rot match {
      case 90  => (y, x)
      case 180 => (w - x, y)
      case 270 => (h - y, w - x)
      case _   => (x, h - y)
    }
    val (x0, top) = pt(g.x, g.y)
    val (nx, _) = pt(g.nx, g.ny)
    // quantize to 0.01pt: producers emit scale chains like 8.33333 × 0.12
    // = 0.9999996, so a header glyph and a data glyph meant to share a
    // column x differ by ~2e-4 — which would flip strict boundary
    // comparisons. 0.01pt is far below any layout distance.
    def q(v: Double): Double = math.rint(v * 100) / 100
    CharBox(g.uni, q(x0), q(top), q(nx), g.run)
  }

  /** Parse a whole document into rotation-normalized positioned words per
    * page. None when the bytes are not a parseable classic-layout PDF —
    * callers fall back to their stub codec.
    */
  def parse(bytes: Array[Byte]): Option[PdfDoc] =
    try {
      if (!RealPdfMeta.isPdf(bytes)) return None
      val (objs, dec) = load(bytes)
      if (objs.isEmpty) return None
      // page tree walk: catalog -> /Pages -> /Kids (ordering!), falling
      // back to document-order /Type /Page objects when the tree is odd
      val catalog = objs.values.find(_.dict.contains("/Catalog"))
      def kids(o: PdfObj, depth: Int): Seq[PdfObj] =
        if (depth > 16) Nil
        else if (o.dict.contains("/Kids"))
          """(\d+)\s+0\s+R""".r.findAllMatchIn(
            (quoted("/Kids") + """\s*\[([^\]]*)\]""").r
              .findFirstMatchIn(o.dict).map(_.group(1)).getOrElse(""))
            .flatMap(m => objs.get(m.group(1).toInt)).toSeq
            .flatMap(kids(_, depth + 1))
        else Seq(o)
      val fromTree = for {
        cat <- catalog
        rootRef <- ref(cat.dict, "/Pages")
        root <- objs.get(rootRef)
      } yield kids(root, 0).filter(o =>
        """/Type\s*/Page(?!s)""".r.findFirstIn(o.dict).isDefined)
      val pages = fromTree.filter(_.nonEmpty).getOrElse {
        objs.values.toSeq.sortBy(_.num).filter(o =>
          """/Type\s*/Page(?!s)""".r.findFirstIn(o.dict).isDefined)
      }
      if (pages.isEmpty) return None

      def inherited[A](o: PdfObj, get: String => Option[A], depth: Int = 0): Option[A] =
        get(o.dict).orElse {
          if (depth > 16) None
          else ref(o.dict, "/Parent").flatMap(objs.get)
            .flatMap(p => inherited(p, get, depth + 1))
        }

      val parsed = pages.map { pg =>
        val mb = inherited(pg, d => numArray(d, "/MediaBox"))
          .getOrElse(Seq(0.0, 0.0, 612.0, 792.0))
        val rot0 = inherited(pg, d => int(d, "/Rotate")).getOrElse(0)
        val rot = ((rot0 % 360) + 360) % 360
        val w = mb(2) - mb(0); val h = mb(3) - mb(1)
        // /Contents: single ref or array of refs, concatenated in order
        val contentRefs: Seq[Int] =
          (quoted("/Contents") + """\s*\[([^\]]*)\]""").r
            .findFirstMatchIn(pg.dict).map(m =>
              """(\d+)\s+0\s+R""".r.findAllMatchIn(m.group(1))
                .map(_.group(1).toInt).toSeq)
            .orElse(ref(pg.dict, "/Contents").map(Seq(_)))
            .getOrElse(Nil)
        val content = contentRefs.flatMap(objs.get)
          .flatMap(o => streamData(objs, o, dec))
          .map(b => new String(b, "ISO-8859-1")).mkString("\n")
        // fonts from /Resources /Font
        val fonts: Map[String, Font] = (for {
          res <- inherited(pg, d => subDict(objs, d, "/Resources"))
          fd <- subDict(objs, res, "/Font")
        } yield {
          """/(\w+)\s+(\d+)\s+0\s+R""".r.findAllMatchIn(fd).flatMap { m =>
            objs.get(m.group(2).toInt).map(fo =>
              m.group(1) -> loadFont(objs, fo.dict, dec))
          }.toMap
        }).getOrElse(Map.empty)
        val glyphs = interpret(tokenize(content), fonts)
          .map(g => Glyph(g.uni, g.x - mb(0), g.y - mb(1), g.nx - mb(0), g.ny - mb(1), g.run))
        val normalized = glyphs.map(normalize(_, w, h, rot))
        val (dw, dh) = if (rot == 90 || rot == 270) (h, w) else (w, h)
        PdfPage(toWords(normalized), normalized, dw, dh)
      }
      Some(PdfDoc(parsed.toIndexedSeq))
    } catch { case scala.util.control.NonFatal(_) => None }
}

/** The production codec: full adaptive table extraction (OP-06/07) from
  * GENUINE PDF bytes via [[PdfTextCodec]], metadata/page count via
  * [[RealPdfMeta]]'s scanner, falling back to `inner` (the stub codec)
  * for non-PDF documents — one pipeline handles a mixed corpus.
  * (Replaced the earlier metadata-only composite, which delegated
  * extraction to the stub even for real PDF bytes.)
  */
final case class RealPdfCodec(inner: PdfTableSource.TableExtractor)
    extends PdfTableSource.TableExtractor {
  import PdfTableSource.{GridRow, PageStride, PdfMeta}

  /** Bytes that CLAIM to be a PDF must parse as one: falling back to the
    * stub on an unparseable %PDF document would decode its raw bytes as
    * grid text and silently load garbage (or nothing), where the
    * reference's parser raises and the message takes the DLQ path
    * (worker.py per-record try/except). The stub fallback is only for
    * documents that never claimed the format. The format sniff is
    * RealPdfMeta.isPdf — ONE definition, shared with the byte scanner.
    */
  private def corrupt(doc: String): Nothing =
    throw new java.io.IOException(
      s"unparseable PDF (corrupt or unsupported layout): $doc")

  override def extract(doc: String, bytes: Array[Byte],
                       startPage: Int, endPage: Int): Iterator[GridRow] =
    PdfTextCodec.parse(bytes) match {
      case Some(d) if d.pages.nonEmpty =>
        // boundary DISCOVERY is word-level on page 1 (the reference scans
        // extract_words for header phrases, pdf_parser.py:79-96) …
        val boundaries =
          AdaptiveTable.detectBoundaries(d.pages.head.words, d.pageWidth)
        val sorted = boundaries.distinct.sorted
        // … but cell ASSIGNMENT is char-accurate (pdfplumber slices cells
        // by char): re-group each page's glyphs with word breaks forced at
        // the discovered column boundaries, then slice as usual.
        (math.max(startPage, 1) to math.min(endPage, d.pages.length))
          .iterator.flatMap { p =>
            val words = PdfTextCodec.toWords(d.pages(p - 1).chars, sorted)
            AdaptiveTable.extractRows(words, boundaries)
              .iterator.zipWithIndex.map { case (cells, r) =>
                GridRow(doc, p, p * PageStride + r, cells)
              }
          }
      case _ if RealPdfMeta.isPdf(bytes) => corrupt(doc)
      case _ => inner.extract(doc, bytes, startPage, endPage)
    }

  override def pageCount(bytes: Array[Byte]): Int =
    RealPdfMeta.pageCount(bytes)
      .orElse(PdfTextCodec.parse(bytes).map(_.pages.length))
      .getOrElse(
        if (RealPdfMeta.isPdf(bytes)) corrupt("<pageCount>")
        else inner.pageCount(bytes))

  override def metadata(doc: String, bytes: Array[Byte]): PdfMeta =
    RealPdfMeta.metadata(doc, bytes)
      // a PARSEABLE document without a scannable /CreationDate is valid:
      // real page count, absent dates (PyPDF2 meta.get semantics) — only
      // an unparseable self-declared PDF is an error
      .orElse(PdfTextCodec.parse(bytes).filter(_.pages.nonEmpty).map(d =>
        PdfMeta(doc, created_at = "", modified_at = "",
          page_count = d.pages.length)))
      .getOrElse(
        if (RealPdfMeta.isPdf(bytes)) corrupt(doc) else inner.metadata(doc, bytes))
}
