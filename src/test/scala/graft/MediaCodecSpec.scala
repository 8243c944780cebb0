package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MediaCodec
import graft.sources.MediaCodec.Probe

/** Byte-level tests of the image header codec: every parser is pinned
  * against bytes produced by a REAL encoder (JDK ImageIO for PNG/JPEG;
  * the handcrafted-but-valid GIF stream is itself verified decodable
  * by ImageIO), plus truncation/garbage robustness.
  */
class MediaCodecSpec extends AnyFunSuite {

  test("PNG: IHDR dimensions from real ImageIO bytes") {
    val b = MediaCodec.encodePng(20, 13, 0x336699)
    assert(MediaCodec.sniff(b) === Probe("png", 20, 13, 1))
    // independent decoder agrees
    assert(MediaCodec.imageIoMeta(b) === Some(Probe("png", 20, 13, 1)))
  }

  test("PNG: APNG acTL chunk sets the frame count") {
    val b = MediaCodec.withApngFrames(MediaCodec.encodePng(8, 9, 0), 5)
    assert(MediaCodec.sniff(b) === Probe("png", 8, 9, 5))
  }

  test("JPEG: SOFn scan past APP0/DQT/DHT segments finds the dimensions") {
    val b = MediaCodec.encodeJpeg(37, 21, 0xaa5511)
    assert(MediaCodec.sniff(b) === Probe("jpeg", 37, 21, 1))
    assert(MediaCodec.imageIoMeta(b) === Some(Probe("jpeg", 37, 21, 1)))
  }

  test("GIF: LSD dimensions and frame count from the block walk") {
    val b = MediaCodec.encodeGif(24, 17, 3)
    assert(MediaCodec.sniff(b) === Probe("gif", 24, 17, 3))
    // the handcrafted stream is REAL GIF: the JDK decoder reads the
    // same dimensions, counts the same frames, and decodes pixel data
    assert(MediaCodec.imageIoMeta(b) === Some(Probe("gif", 24, 17, 3)))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    assert(img.getWidth === 24 && img.getHeight === 17)
  }

  test("GIF: single frame, and 256-wide dims exercise both LE bytes") {
    val b = MediaCodec.encodeGif(300, 2, 1)
    assert(MediaCodec.sniff(b) === Probe("gif", 300, 2, 1))
    assert(MediaCodec.imageIoMeta(b) === Some(Probe("gif", 300, 2, 1)))
  }

  test("non-image, truncated, and empty bytes degrade to bin, never throw") {
    assert(MediaCodec.sniff(Array.empty[Byte]) === MediaCodec.NotImage)
    assert(MediaCodec.sniff("plain text".getBytes("UTF-8")) === MediaCodec.NotImage)
    // valid signatures but truncated before the dimension fields
    assert(MediaCodec.sniff(MediaCodec.encodePng(5, 5, 0).take(20)) ===
      MediaCodec.NotImage)
    assert(MediaCodec.sniff(MediaCodec.encodeGif(5, 5, 1).take(9)) ===
      MediaCodec.NotImage)
    val jpegHeadOnly = MediaCodec.encodeJpeg(5, 5, 0).take(4)
    assert(MediaCodec.sniff(jpegHeadOnly) === MediaCodec.NotImage)
    // garbage tail after a valid GIF header: the walk stops, frames
    // clamp to >= 1
    val gifGarbage = MediaCodec.encodeGif(6, 4, 2).dropRight(3) ++
      Array[Byte](0x7f, 0x00)
    val p = MediaCodec.sniff(gifGarbage)
    assert(p.format === "gif" && p.width === 6 && p.height === 4 && p.nFrames >= 1)
  }

  test("encoders are deterministic (same input, same bytes)") {
    assert(MediaCodec.encodePng(11, 7, 0x123456).toSeq ===
      MediaCodec.encodePng(11, 7, 0x123456).toSeq)
    assert(MediaCodec.encodeJpeg(11, 7, 0x123456).toSeq ===
      MediaCodec.encodeJpeg(11, 7, 0x123456).toSeq)
    assert(MediaCodec.encodeGif(11, 7, 2).toSeq ===
      MediaCodec.encodeGif(11, 7, 2).toSeq)
  }
}
