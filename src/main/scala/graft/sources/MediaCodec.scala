package graft.sources

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Byte-level image header codec — the real decode behind the
  * multimodal column family. The reference pipeline never probes media
  * (its handlers are scraper/orchestrator/worker/teardown); this codec
  * exists for the SURVEY §7.4 extension mandate: multimodal columns as
  * opaque binary with typed, verifiable metadata.
  *
  * [[sniff]] is the production path: a pure function over the leading
  * bytes of a blob that needs no codec library — PNG dimensions live at
  * fixed offsets in the IHDR chunk, JPEG dimensions in the first SOFn
  * marker segment, GIF dimensions in the logical screen descriptor —
  * so it runs inside executor tasks at full speed on arbitrary data.
  *
  * The `encode*` builders produce REAL image bytes (JDK ImageIO for
  * PNG/JPEG; a handcrafted but spec-valid LZW stream for animated GIF)
  * and exist to synthesize corpus fixtures; [[imageIoMeta]] decodes
  * through ImageIO as an INDEPENDENT second decoder for the x12g gate.
  */
object MediaCodec {

  // Every decode input here is ALREADY an in-memory byte array, but
  // ImageIO's default useCache=true spools each stream through a temp
  // FILE (FileCacheImageInputStream): one create/write/read/delete
  // per decoded blob — pure disk churn that at corpus scale turns the
  // decode path IO-bound and degrades as the run ages (measured: the
  // x83/x87/x12g bench family slowed monotonically pass over pass with
  // no code change). Memory-backed streams are strictly correct for
  // byte-array inputs and executor-friendly at any scale.
  ImageIO.setUseCache(false)

  /** What a header parse yields: container format, pixel dimensions,
    * and frame count (GIF image descriptors / APNG acTL; 1 for stills).
    */
  final case class Probe(format: String, width: Int, height: Int, nFrames: Int)

  /** Fallback for bytes that are not a recognized image container. */
  val NotImage: Probe = Probe("bin", 0, 0, 1)

  private def u(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u(b, i) << 8) | u(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u(b, i) | (u(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u(b, i).toLong << 24) | (u(b, i + 1) << 16) | (u(b, i + 2) << 8) | u(b, i + 3)

  private val pngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Identify PNG / JPEG / GIF from raw bytes and read dimensions and
    * frame count straight out of the container headers. Anything
    * unrecognized, truncated, or structurally broken degrades to
    * [[NotImage]] — never an exception (executors must survive
    * arbitrary crawl bytes).
    */
  def sniff(bytes: Array[Byte]): Probe =
    try {
      if (isPng(bytes)) sniffPng(bytes)
      else if (isJpeg(bytes)) sniffJpeg(bytes)
      else if (isGif(bytes)) sniffGif(bytes)
      else NotImage
    } catch { case _: IndexOutOfBoundsException => NotImage }

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 33 && pngSig.indices.forall(i => b(i) == pngSig(i))

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && u(b, 0) == 0xff && u(b, 1) == 0xd8

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** PNG: IHDR is required to be the first chunk, so width/height sit
    * at fixed offsets 16/20 (big-endian u32). Frame count: walk the
    * chunk list for an APNG `acTL` chunk (its first field is
    * num_frames); stop at IDAT — acTL must precede it per the spec.
    */
  private def sniffPng(b: Array[Byte]): Probe = {
    val w = be32(b, 16).toInt
    val h = be32(b, 20).toInt
    if (w <= 0 || h <= 0) return NotImage
    var frames = 1
    var pos = 8
    var going = true
    while (going && pos + 8 <= b.length) {
      val len = be32(b, pos)
      val typ = new String(b, pos + 4, 4, "US-ASCII")
      if (typ == "acTL" && pos + 12 <= b.length) {
        frames = math.max(1, be32(b, pos + 8).toInt); going = false
      } else if (typ == "IDAT" || typ == "IEND") going = false
      else if (len < 0 || len > Int.MaxValue - 12 - pos) going = false
      else pos += 12 + len.toInt
    }
    Probe("png", w, h, frames)
  }

  /** JPEG: scan the marker stream for the first start-of-frame segment
    * (SOF0-SOF15, minus the non-frame C4/C8/CC codes); its payload is
    * precision(1), height(2), width(2) big-endian. Stops — and falls
    * back — at SOS/EOI, since past SOS the stream is entropy-coded.
    */
  private def sniffJpeg(b: Array[Byte]): Probe = {
    val n = b.length
    var i = 2
    while (i + 1 < n) {
      if (u(b, i) != 0xff) i += 1
      else {
        val m = u(b, i + 1)
        if (m == 0xff) i += 1 // fill byte
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) i += 2 // no payload
        else if (m == 0xd9 || m == 0xda) return NotImage // EOI / SOS
        else {
          if (i + 3 >= n) return NotImage
          val segLen = be16(b, i + 2)
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (i + 8 >= n) return NotImage
            val h = be16(b, i + 5)
            val w = be16(b, i + 7)
            return if (w > 0 && h > 0) Probe("jpeg", w, h, 1) else NotImage
          }
          if (segLen < 2) return NotImage
          i += 2 + segLen
        }
      }
    }
    NotImage
  }

  /** GIF: dimensions from the logical screen descriptor (little-endian
    * u16 at offsets 6/8); frame count by walking the block stream —
    * skip the global color table, then extensions (0x21: label +
    * length-prefixed sub-blocks) and image descriptors (0x2C: 9-byte
    * header, optional local color table, LZW seed byte, sub-blocks),
    * counting the latter, until the 0x3B trailer.
    */
  private def sniffGif(b: Array[Byte]): Probe = {
    val w = le16(b, 6)
    val h = le16(b, 8)
    if (w <= 0 || h <= 0) return NotImage
    var pos = 13
    val flags = u(b, 10)
    if ((flags & 0x80) != 0) pos += 3 * (1 << ((flags & 0x07) + 1))
    var frames = 0
    var going = true
    def skipSubBlocks(start: Int): Int = {
      var p = start
      while (p < b.length && u(b, p) != 0) p += 1 + u(b, p)
      p + 1
    }
    while (going && pos < b.length) {
      u(b, pos) match {
        case 0x21 => pos = skipSubBlocks(pos + 2) // extension: label then sub-blocks
        case 0x2c =>
          frames += 1
          val lf = u(b, pos + 9)
          var p = pos + 10
          if ((lf & 0x80) != 0) p += 3 * (1 << ((lf & 0x07) + 1))
          pos = skipSubBlocks(p + 1) // LZW min-code-size byte, then data
        case 0x3b => going = false
        case _ => going = false // unknown block: stop with what we have
      }
    }
    Probe("gif", w, h, math.max(frames, 1))
  }

  // --- real encoders (fixture/corpus synthesis) -------------------------

  private def solidImage(w: Int, h: Int, rgb: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    img
  }

  private def imageIoBytes(img: BufferedImage, fmt: String): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt, o), s"no JDK ImageIO writer for $fmt")
    o.toByteArray
  }

  /** REAL pixel resample: decode via JDK ImageIO, bilinear-scale onto a
    * w×h canvas, re-encode in the SNIFFED container format. None when
    * the bytes aren't a decodable still (caller falls back); an
    * animated GIF flattens to its first frame (the JDK reader's
    * single-image contract — per-frame resampling is a frame-splitter
    * composition via [[graft.operators.Multimodal.sampleFrames]]).
    * Deterministic: fixed interpolation hint, fixed target raster type.
    */
  def imageIoResize(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    try {
      val fmt = sniff(bytes).format
      if (fmt != "png" && fmt != "jpeg" && fmt != "gif") None
      else Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { src =>
        val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, w, h, null)
        } finally g.dispose()
        imageIoBytes(dst, fmt)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Full JDK ImageIO pixel decode, gated on the sniffable containers
    * (arbitrary bytes would make ImageIO probe every registered
    * reader). None for non-images or corrupt streams.
    */
  def imageIoDecode(bytes: Array[Byte]): Option[BufferedImage] =
    try {
      val fmt = sniff(bytes).format
      if (fmt != "png" && fmt != "jpeg" && fmt != "gif") None
      else Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Real PNG bytes (JDK ImageIO encoder) of a solid-color w×h image. */
  def encodePng(w: Int, h: Int, rgb: Int): Array[Byte] =
    imageIoBytes(solidImage(w, h, rgb), "png")

  /** Real container bytes of a solid-color w×h image through ANY JDK
    * ImageIO writer ("png", "gif", "bmp", …) — the cross-format gate
    * fixture needs the SAME pixel content through two independent
    * encoder paths (the GIF path palette-quantizes; a solid color is
    * its own exact palette entry).
    */
  def encodeSolid(w: Int, h: Int, rgb: Int, fmt: String): Array[Byte] =
    imageIoBytes(solidImage(w, h, rgb), fmt)

  /** Real JPEG bytes (JDK ImageIO encoder) of a solid-color w×h image. */
  def encodeJpeg(w: Int, h: Int, rgb: Int): Array[Byte] =
    imageIoBytes(solidImage(w, h, rgb), "jpeg")

  /** Real animated-GIF bytes, handcrafted: GIF89a header, 4-color
    * global table, a graphic-control extension + image descriptor per
    * frame, and a spec-valid LZW stream (a CLEAR code before every
    * pixel code keeps the code width fixed at 3 bits — wasteful but
    * decodable by any conforming reader, which the x12g ImageIO gate
    * proves). Frame f is solid color index f % 4.
    */
  def encodeGif(w: Int, h: Int, frames: Int): Array[Byte] = {
    require(w > 0 && h > 0 && frames > 0, s"bad gif shape ${w}x$h x$frames")
    val out = new ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { b(v); b(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(w); w16(h)
    b(0xf1) // GCT present, 4 entries
    b(0); b(0)
    // palette: black, red, green, blue
    Seq((0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255))
      .foreach { case (r, g, bl) => b(r); b(g); b(bl) }
    (0 until frames).foreach { f =>
      b(0x21); b(0xf9); b(4); b(0); w16(10); b(0); b(0) // GCE: 100ms delay
      b(0x2c); w16(0); w16(0); w16(w); w16(h); b(0) // image descriptor, no LCT
      b(2) // LZW min code size (4-color palette)
      // bit-pack LSB-first at a fixed 3-bit width: CLEAR(4) px CLEAR px ... EOI(5)
      val codes = (0 until w * h).flatMap(_ => Seq(4, f % 4)) :+ 5
      val packed = new ByteArrayOutputStream()
      var acc = 0; var nbits = 0
      codes.foreach { c =>
        acc |= c << nbits; nbits += 3
        while (nbits >= 8) { packed.write(acc & 0xff); acc >>= 8; nbits -= 8 }
      }
      if (nbits > 0) packed.write(acc & 0xff)
      val data = packed.toByteArray
      var off = 0
      while (off < data.length) {
        val len = math.min(255, data.length - off)
        b(len); out.write(data, off, len); off += len
      }
      b(0) // sub-block terminator
    }
    b(0x3b)
    out.toByteArray
  }

  /** Splice an APNG `acTL` chunk (with a correct CRC) after IHDR —
    * produces a structurally valid animated-PNG header for exercising
    * [[sniff]]'s chunk walk in tests.
    */
  def withApngFrames(png: Array[Byte], frames: Int): Array[Byte] = {
    val crc = new java.util.zip.CRC32()
    val chunk = new ByteArrayOutputStream()
    def be(v: Long): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val body = "acTL".getBytes("US-ASCII") ++ be(frames.toLong) ++ be(0L)
    crc.update(body)
    chunk.write(be(8L)); chunk.write(body); chunk.write(be(crc.getValue))
    val ihdrEnd = 8 + 12 + 13 // sig + IHDR chunk (len+type+13+crc)
    png.take(ihdrEnd) ++ chunk.toByteArray ++ png.drop(ihdrEnd)
  }

  /** Decode through JDK ImageIO — a genuinely independent second
    * decoder (different code, different author) for gating [[sniff]].
    * Frame count is reported for GIF only: the JDK PNG reader is not
    * APNG-aware and JPEG is single-frame by definition.
    */
  def imageIoMeta(bytes: Array[Byte]): Option[Probe] = {
    val in = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(in)
          val fmt = r.getFormatName.toLowerCase match {
            case "jpg" | "jpeg" => "jpeg"
            case f => f
          }
          val n = if (fmt == "gif") r.getNumImages(true) else 1
          Some(Probe(fmt, r.getWidth(0), r.getHeight(0), n))
        } finally r.dispose()
      }
    } finally in.close()
  }
}
