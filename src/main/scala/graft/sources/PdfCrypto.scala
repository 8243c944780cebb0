package graft.sources

import java.security.MessageDigest

import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** Standard-security-handler decryption for EMPTY-user-password PDFs —
  * the transparent decrypt the reference inherits from PyPDF2
  * (pdf_parser.py:23-36; common for published government documents,
  * which encrypt for edit-protection with a blank open password).
  * Public-spec algorithms only (PDF 32000-1 §7.6.3): RC4 40-128 bit
  * (V1/V2, R2/R3) and AES-128-CBC (/AESV2, V4/R4), via JDK
  * MessageDigest/javax.crypto — no codec jars.
  *
  * A document whose empty-password check fails (a REAL open password)
  * throws from [[forDocument]]; parse() maps that to None and the
  * caller's corrupt-document path dead-letters it — never silently
  * extracting ciphertext as text.
  */
object PdfCrypto {

  /** The spec's 32-byte password pad (Algorithm 2 step a). */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  /** Raw AES-CBC (no IV prefix, no padding handling) — the V5 key-wrap
    * primitive (/UE decrypts with a ZERO IV) and the 2.B hash rounds.
    */
  def aesCbcRaw(key: Array[Byte], iv: Array[Byte], data: Array[Byte],
                encrypt: Boolean): Array[Byte] = {
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(if (encrypt) Cipher.ENCRYPT_MODE else Cipher.DECRYPT_MODE,
      new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** ISO 32000-2 Algorithm 2.B hardened hash (R6): iterated
    * SHA-256/384/512 selected by an AES-128-CBC round over 64
    * repetitions of (password ++ K ++ udata), at least 64 rounds, until
    * the round's last cipher byte is <= round - 32.
    */
  def hash2B(password: Array[Byte], salt: Array[Byte],
             udata: Array[Byte]): Array[Byte] = {
    var k = sha("SHA-256", password, salt, udata)
    var e = Array.emptyByteArray
    var round = 0
    while (round < 64 || (e(e.length - 1) & 0xFF) > round - 32) {
      val one = password ++ k ++ udata
      val k1 = new Array[Byte](one.length * 64)
      var i = 0
      while (i < 64) { System.arraycopy(one, 0, k1, i * one.length, one.length); i += 1 }
      e = aesCbcRaw(k.take(16), k.slice(16, 32), k1, encrypt = true)
      k = ((e(0) & 0xFF) + (e(1) & 0xFF) + (e(2) & 0xFF) + (e(3) & 0xFF) +
        (e(4) & 0xFF) + (e(5) & 0xFF) + (e(6) & 0xFF) + (e(7) & 0xFF) +
        (e(8) & 0xFF) + (e(9) & 0xFF) + (e(10) & 0xFF) + (e(11) & 0xFF) +
        (e(12) & 0xFF) + (e(13) & 0xFF) + (e(14) & 0xFF) + (e(15) & 0xFF)) % 3 match {
        case 0 => sha("SHA-256", e)
        case 1 => sha("SHA-384", e)
        case 2 => sha("SHA-512", e)
      }
      round += 1
    }
    k.take(32)
  }

  /** RC4 (symmetric: encrypts and decrypts). */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + key(i % key.length)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    i = 0; j = 0
    var k = 0
    while (k < data.length) {
      i = (i + 1) & 0xFF
      j = (j + s(i)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      out(k) = (data(k) ^ s((s(i) + s(j)) & 0xFF)).toByte
      k += 1
    }
    out
  }

  /** AES-CBC with the spec's leading 16-byte IV; PKCS#5 padding
    * stripped when well-formed (tolerated otherwise — a lenient tail
    * beats refusing a decodable stream). A malformed LENGTH throws:
    * silently returning empty would erase a stream/string with no
    * signal, where the module's contract routes corruption to the
    * caller's DLQ.
    */
  def aesDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.length < 32 || (data.length - 16) % 16 != 0)
      throw new java.io.IOException(
        s"AES stream length ${data.length} is not IV + 16n ciphertext")
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
      new IvParameterSpec(java.util.Arrays.copyOfRange(data, 0, 16)))
    val out = c.doFinal(java.util.Arrays.copyOfRange(data, 16, data.length))
    val p = if (out.isEmpty) 0 else out(out.length - 1) & 0xFF
    if (p >= 1 && p <= 16 && p <= out.length) out.dropRight(p) else out
  }

  def aesEncrypt(key: Array[Byte], iv: Array[Byte],
                 data: Array[Byte]): Array[Byte] = {
    // PKCS#5 pad (always adds 1..16 bytes), prepend IV — the inverse of
    // aesDecrypt, used by specs to author encrypted fixtures
    val padLen = 16 - (data.length % 16)
    val padded = data ++ Array.fill(padLen)(padLen.toByte)
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
      new IvParameterSpec(iv))
    iv ++ c.doFinal(padded)
  }

  // --------------------------------------------------------------- strings

  /** Parse one PDF string whose opener is at `i` in `s`: literal
    * `(…)` with escapes/balanced parens, or hex `<…>`. Returns the raw
    * bytes and the index just past the closer.
    */
  def parseStringAt(s: String, i: Int): Option[(Array[Byte], Int)] = {
    if (i >= s.length) return None
    s.charAt(i) match {
      case '(' =>
        val out = new java.io.ByteArrayOutputStream()
        var depth = 1
        var p = i + 1
        while (p < s.length && depth > 0) {
          val c = s.charAt(p)
          if (c == '\\' && p + 1 < s.length) {
            val e = s.charAt(p + 1)
            e match {
              case 'n' => out.write('\n'); p += 2
              case 'r' => out.write('\r'); p += 2
              case 't' => out.write('\t'); p += 2
              case 'b' => out.write('\b'); p += 2
              case 'f' => out.write('\f'); p += 2
              case '\n' => p += 2
              case '\r' => p += 2; if (p < s.length && s.charAt(p) == '\n') p += 1
              case d if d >= '0' && d <= '7' =>
                var v = 0; var k = 0; p += 1
                while (k < 3 && p < s.length && s.charAt(p) >= '0' && s.charAt(p) <= '7') {
                  v = v * 8 + (s.charAt(p) - '0'); p += 1; k += 1
                }
                out.write(v)
              case other => out.write(other.toInt); p += 2
            }
          } else if (c == '(') { depth += 1; out.write(c.toInt); p += 1 }
          else if (c == ')') { depth -= 1; if (depth > 0) out.write(c.toInt); p += 1 }
          else { out.write(c.toInt); p += 1 }
        }
        Some((out.toByteArray, p))
      case '<' if !s.startsWith("<<", i) =>
        val close = s.indexOf('>', i + 1)
        if (close < 0) None
        else {
          val hex = s.substring(i + 1, close).filterNot(_.isWhitespace)
          if (!hex.forall(c => Character.digit(c, 16) >= 0)) None // not a hex string
          else {
            val padded = if (hex.length % 2 == 0) hex else hex + "0"
            val bytes = padded.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
            Some((bytes, close + 1))
          }
        }
      case _ => None
    }
  }

  /** Emit bytes as a PDF literal string, escaping delimiters. */
  def literal(bytes: Array[Byte]): String = {
    val sb = new StringBuilder("(")
    bytes.foreach { b =>
      val c = b & 0xFF
      c match {
        case '(' | ')' | '\\' => sb += '\\' += c.toChar
        case '\r' => sb ++= "\\r"
        case '\n' => sb ++= "\\n"
        case _ => sb += c.toChar
      }
    }
    (sb += ')').toString
  }

  /** First string value after `key` in `dict`. */
  def strValue(dict: String, key: String): Option[Array[Byte]] =
    (java.util.regex.Pattern.quote(key) + """(?![A-Za-z0-9])\s*""").r
      .findFirstMatchIn(dict)
      .flatMap(m => parseStringAt(dict, m.end).map(_._1))

  // ------------------------------------------------------------- decryptor

  /** Per-document decryption state. `keyBytes` is the file key
    * (Algorithm 2 for V<=4; the /UE-unwrapped AES-256 key for V5);
    * V<=4 derives a per-object key (§7.6.2), V5 (`perObjectKey=false`)
    * applies the file key directly.
    */
  final case class Decryptor(keyBytes: Array[Byte], aes: Boolean,
                             perObjectKey: Boolean = true) {
    private def objectKey(num: Int): Array[Byte] = {
      if (!perObjectKey) return keyBytes
      val ext = Array[Byte](
        (num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte,
        ((num >> 16) & 0xFF).toByte, 0, 0) // generation always 0 here
      val salt =
        if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) // "sAlT"
        else Array.emptyByteArray
      md5(keyBytes, ext, salt).take(math.min(keyBytes.length + 5, 16))
    }
    def decrypt(num: Int, data: Array[Byte]): Array[Byte] =
      if (aes) aesDecrypt(objectKey(num), data)
      else rc4(objectKey(num), data)
    /** Symmetric counterpart, for fixture authoring (RC4 is symmetric;
      * AES takes a caller-chosen IV).
      */
    def encrypt(num: Int, data: Array[Byte], iv: Array[Byte] = null): Array[Byte] =
      if (aes) aesEncrypt(objectKey(num),
        Option(iv).getOrElse(md5(keyBytes, Array(num.toByte)).take(16)), data)
      else rc4(objectKey(num), data)
  }

  /** The file encryption key for given Encrypt-dict parameters and an
    * empty user password (Algorithm 2). Exposed so fixture authors and
    * the document prober share one derivation.
    */
  def fileKey(o32: Array[Byte], p: Int, id0: Array[Byte], r: Int,
              lengthBits: Int, encryptMetadata: Boolean): Array[Byte] = {
    val n = if (r == 2) 5 else math.max(5, math.min(16, lengthBits / 8))
    val pLE = Array[Byte](
      (p & 0xFF).toByte, ((p >> 8) & 0xFF).toByte,
      ((p >> 16) & 0xFF).toByte, ((p >> 24) & 0xFF).toByte)
    val tail =
      if (r >= 4 && !encryptMetadata)
        Array[Byte](0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte)
      else Array.emptyByteArray
    var key = md5(Pad, o32, pLE, id0, tail)
    if (r >= 3) for (_ <- 0 until 50) key = md5(key.take(n))
    key.take(n)
  }

  /** The /U entry the empty user password should produce (Algorithm
    * 4 for R2, Algorithm 5 for R>=3 — first 16 bytes significant).
    */
  def expectedU(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(key, Pad)
    else {
      var u = rc4(key, md5(Pad, id0))
      for (i <- 1 to 19)
        u = rc4(key.map(b => (b ^ i).toByte), u)
      u
    }

  /** The /O entry for given owner/user passwords (Algorithm 3) —
    * fixture authoring helper.
    */
  def ownerEntry(ownerPwd: Array[Byte], userPwd: Array[Byte], r: Int,
                 lengthBits: Int): Array[Byte] = {
    val n = if (r == 2) 5 else math.max(5, math.min(16, lengthBits / 8))
    var h = md5((ownerPwd ++ Pad).take(32))
    if (r >= 3) for (_ <- 0 until 50) h = md5(h)
    val key = h.take(n)
    var o = rc4(key, (userPwd ++ Pad).take(32))
    if (r >= 3) for (i <- 1 to 19)
      o = rc4(key.map(b => (b ^ i).toByte), o)
    o
  }

  /** Probe `fileText` (latin-1 whole file) for encryption. None when
    * the document is unencrypted; Some(decryptor) when the standard
    * handler accepts the EMPTY user password; throws when a real
    * password (or an unsupported handler/cipher) blocks decryption.
    */
  /** Object number of the newest trailer's /Encrypt reference — ONE
    * definition shared by forDocument and load()'s skip-the-Encrypt-
    * dict logic.
    */
  def encryptRef(fileText: String): Option[Int] =
    """/Encrypt\s+(\d+)\s+0\s+R""".r
      .findAllMatchIn(fileText).toSeq.lastOption.map(_.group(1).toInt)

  def forDocument(fileText: String,
                  objs: Map[Int, PdfTextCodec.PdfObj]): Option[Decryptor] = {
    val encDict = encryptRef(fileText).flatMap(objs.get).map(_.dict).orElse {
      // inline trailer form: trailer << … /Encrypt << … >> … >>
      """/Encrypt\s*(?=<<)""".r.findAllMatchIn(fileText).toSeq.lastOption
        .map(m => PdfTextCodec.dictSpan(fileText, m.end))
    }
    encDict.flatMap { enc =>
      if (!enc.contains("/Standard"))
        throw new SecurityException("unsupported PDF security handler")
      val v = PdfTextCodec.int(enc, "/V").getOrElse(0)
      val r = PdfTextCodec.int(enc, "/R").getOrElse(2)
      // V4/V5 route streams/strings through named crypt filters: both
      // /Identity means the document body is NOT encrypted (e.g.
      // attachments-only encryption) — decrypting plaintext would
      // corrupt it. Mixed configurations are refused loudly.
      def cfName(key: String): String =
        (java.util.regex.Pattern.quote(key) + """(?![A-Za-z0-9])\s*/(\w+)""").r
          .findFirstMatchIn(enc).map(_.group(1)).getOrElse("StdCF")
      val (stmF, strF) = if (v >= 4) (cfName("/StmF"), cfName("/StrF"))
        else ("StdCF", "StdCF")
      if (stmF == "Identity" && strF == "Identity") None
      else if (stmF != strF)
        throw new SecurityException(
          s"unsupported mixed crypt filters StmF=$stmF StrF=$strF")
      else if (v == 5 && (r == 5 || r == 6)) Some(forV5(enc, r))
      else {
        if (v > 4 || r > 4)
          throw new SecurityException(s"unsupported PDF encryption V=$v R=$r")
        val o32 = strValue(enc, "/O")
          .getOrElse(throw new SecurityException("PDF /Encrypt missing /O"))
        val u = strValue(enc, "/U")
          .getOrElse(throw new SecurityException("PDF /Encrypt missing /U"))
        // via Long: some producers render /P as its unsigned 32-bit
        // value (e.g. 4294963392 for -3904), which Int parsing rejects
        val p = """/P(?![A-Za-z0-9])\s*(-?\d+)""".r.findFirstMatchIn(enc)
          .map(_.group(1).toLong.toInt).getOrElse(-1)
        val lengthBits = PdfTextCodec.int(enc, "/Length").getOrElse(40)
        // regex, not substring: '/EncryptMetadata   false' and newline
        // separations are legal token splits
        val encryptMetadata =
          """/EncryptMetadata\s+false""".r.findFirstIn(enc).isEmpty
        // AES vs RC4: V4 consults the /StdCF crypt filter
        val aes = v == 4 && {
          val cf = PdfTextCodec.subDict(objs, enc, "/StdCF")
            .orElse(PdfTextCodec.subDict(objs, enc, "/CF")
              .flatMap(c => PdfTextCodec.subDict(objs, c, "/StdCF")))
          cf.exists(_.contains("/AESV2"))
        }
        // /ID first element: scan from the end (newest trailer wins);
        // validate by shape so binary false positives are skipped
        val id0 = """/ID(?![A-Za-z0-9])\s*\[\s*""".r
          .findAllMatchIn(fileText).toSeq.reverseIterator
          .flatMap(m => parseStringAt(fileText, m.end).map(_._1))
          .nextOption().getOrElse(Array.emptyByteArray)
        val key = fileKey(o32.take(32), p, id0, r, lengthBits, encryptMetadata)
        val want = expectedU(key, id0, r)
        val ok =
          if (r == 2) java.util.Arrays.equals(want, u.take(32))
          else want.take(16).sameElements(u.take(16))
        if (!ok)
          throw new SecurityException("PDF requires a non-empty user password")
        Some(Decryptor(key, aes))
      }
    }
  }

  /** AES-256 standard handler (V5: R5 = the deprecated Adobe extension,
    * R6 = ISO 32000-2) with an EMPTY user password: /U is 48 bytes —
    * 32-byte verification hash, 8-byte validation salt, 8-byte key
    * salt; the file key unwraps from /UE with AES-256-CBC under a zero
    * IV. V5 applies the file key to streams/strings DIRECTLY (no
    * per-object derivation), AES-256-CBC with the leading-IV layout.
    */
  private def forV5(enc: String, r: Int): Decryptor = {
    val u = strValue(enc, "/U")
      .getOrElse(throw new SecurityException("PDF /Encrypt missing /U"))
    val ue = strValue(enc, "/UE")
      .getOrElse(throw new SecurityException("PDF /Encrypt missing /UE"))
    if (u.length < 48 || ue.length < 32)
      throw new SecurityException("malformed V5 /U or /UE entry")
    val vSalt = u.slice(32, 40)
    val kSalt = u.slice(40, 48)
    val pwd = Array.emptyByteArray
    def h(salt: Array[Byte]): Array[Byte] =
      if (r == 6) hash2B(pwd, salt, Array.emptyByteArray)
      else sha("SHA-256", pwd, salt)
    if (!h(vSalt).take(32).sameElements(u.take(32)))
      throw new SecurityException("PDF requires a non-empty user password")
    val fileKey = aesCbcRaw(h(kSalt), new Array[Byte](16), ue.take(32),
      encrypt = false)
    Decryptor(fileKey, aes = true, perObjectKey = false)
  }

  /** Rewrite every string inside a top-level object DICT to its
    * decrypted form (strings in encrypted documents are individually
    * RC4/AES-protected) — what makes an encrypted Info dictionary's
    * /CreationDate scannable. Stream bodies are handled separately; the
    * /Encrypt dictionary itself must be skipped by the caller.
    */
  def decryptDictStrings(dict: String, num: Int, dec: Decryptor): String = {
    val sb = new StringBuilder(dict.length)
    var i = 0
    while (i < dict.length) {
      val c = dict.charAt(i)
      // copy '<<' whole, or its second '<' would read as a hex opener
      if (dict.startsWith("<<", i)) { sb ++= "<<"; i += 2 }
      else if (c == '(' || c == '<') {
        parseStringAt(dict, i) match {
          case Some((bytes, end)) =>
            // lenient per-string: a stray PLAINTEXT string in a dict of
            // an otherwise-encrypted file (nonconforming but seen in
            // the wild, e.g. an empty `()`) keeps its original text
            // rather than failing the whole document — stream bodies
            // stay strict
            sb ++= (try literal(dec.decrypt(num, bytes))
              catch { case _: java.io.IOException => dict.substring(i, end) })
            i = end
          case None => sb += c; i += 1
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }
}
