package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Unit pins for the REAL image-header parsers ([[Multimodal.sniffFormat]],
  * [[Multimodal.parseDims]]) — round-trips through the in-repo header
  * builders plus the edge cases the DuckDB oracle can't exercise
  * (truncated headers, JPEG fill bytes / standalone markers, BMP top-down
  * negative height, marker-sync loss).
  */
class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  private def dims(b: Array[Byte]): (Int, Int) =
    Multimodal.parseDims(Multimodal.sniffFormat(b), b)

  test("sniffFormat: magic prefixes and both GIF variants") {
    assert(Multimodal.sniffFormat(Multimodal.pngBytes(1, 1)) === "png")
    assert(Multimodal.sniffFormat(Multimodal.jpegBytes(1, 1)) === "jpeg")
    assert(Multimodal.sniffFormat(Multimodal.bmpBytes(1, 1)) === "bmp")
    assert(Multimodal.sniffFormat(Multimodal.gifBytes(1, 1)) === "gif")
    val gif87 = Multimodal.gifBytes(3, 4)
    gif87(4) = '7'.toByte // GIF87a is a legal variant
    assert(Multimodal.sniffFormat(gif87) === "gif")
    assert(Multimodal.sniffFormat("hello world".getBytes) === "unknown")
    assert(Multimodal.sniffFormat(Array.empty[Byte]) === "unknown")
    // a text payload that merely STARTS with "BM" sniffs as bmp — by design
    assert(Multimodal.sniffFormat("BMW is a carmaker".getBytes) === "bmp")
  }

  test("round-trip: builder dims parse back exactly, all four formats") {
    val cases = Seq((1, 1), (16, 16), (640, 480), (4079, 2159), (65535, 65535))
    cases.foreach { case (w, h) =>
      assert(dims(Multimodal.pngBytes(w, h)) === ((w, h)), s"png $w x $h")
      assert(dims(Multimodal.bmpBytes(w, h)) === ((w, h)), s"bmp $w x $h")
      if (w <= 65535 && h <= 65535) {
        assert(dims(Multimodal.jpegBytes(w, h)) === ((w, h)), s"jpeg $w x $h")
        assert(dims(Multimodal.gifBytes(w, h)) === ((w, h)), s"gif $w x $h")
      }
    }
    // PNG carries 32-bit dims — beyond u16 range too
    assert(dims(Multimodal.pngBytes(100000, 70000)) === ((100000, 70000)))
  }

  test("truncated headers parse as (-1, -1), never throw") {
    Seq(
      Multimodal.pngBytes(640, 480),
      Multimodal.jpegBytes(640, 480),
      Multimodal.bmpBytes(640, 480),
      Multimodal.gifBytes(640, 480)
    ).foreach { full =>
      (0 until full.length).foreach { n =>
        val cut = java.util.Arrays.copyOfRange(full, 0, n)
        val fmt = Multimodal.sniffFormat(cut)
        val (w, h) = Multimodal.parseDims(fmt, cut)
        // either the magic itself is cut (unknown) or dims must be sane:
        // the exact pair on a complete header region, (-1,-1) otherwise
        assert(w == -1 && h == -1 || (w == 640 && h == 480),
          s"cut at $n of ${full.length}: ($w, $h)")
      }
    }
  }

  test("JPEG walk: fill bytes, restart markers, EOI-before-SOF, sync loss") {
    def jpeg(body: Int*): Array[Byte] =
      (Seq(0xff, 0xd8) ++ body).map(_.toByte).toArray
    // fill bytes (padding FFs) before the SOF marker are legal
    val filled = jpeg(0xff, 0xff, 0xff, 0xc0, 0x00, 0x11, 0x08,
      0x01, 0xe0, 0x02, 0x80, 0x03, 0x01, 0x22, 0x00, 0x02, 0x11,
      0x01, 0x03, 0x11, 0x01)
    assert(dims(filled) === ((640, 480)))
    // standalone restart marker then SOF
    val rst = jpeg(0xff, 0xd0, 0xff, 0xc0, 0x00, 0x11, 0x08,
      0x00, 0x10, 0x00, 0x20)
    assert(dims(rst) === ((32, 16)))
    // EOI before any SOF: no dimensions in the stream
    assert(dims(jpeg(0xff, 0xd9)) === ((-1, -1)))
    // lost marker sync (garbage where a marker must be)
    assert(dims(jpeg(0x00, 0x12, 0x34)) === ((-1, -1)))
    // progressive SOF2 carries dims the same way as baseline SOF0
    val sof2 = jpeg(0xff, 0xc2, 0x00, 0x11, 0x08, 0x04, 0x00, 0x03, 0x00)
    assert(dims(sof2) === ((768, 1024)))
    // DHT (C4) is NOT a SOF marker — the walk must skip it by length
    val dht = jpeg(0xff, 0xc4, 0x00, 0x04, 0x00, 0x00,
      0xff, 0xc0, 0x00, 0x11, 0x08, 0x00, 0x08, 0x00, 0x09)
    assert(dims(dht) === ((9, 8)))
  }

  test("BMP: negative (top-down) height parses as magnitude") {
    val b = Multimodal.bmpBytes(320, 200)
    // write height = -200 little-endian at offset 22
    val neg = -200
    (0 until 4).foreach(i => b(22 + i) = ((neg >>> (8 * i)) & 0xff).toByte)
    assert(dims(b) === ((320, 200)))
  }

  test("BMP: 12-byte BITMAPCOREHEADER parses u16 dims; bad DIB rejected") {
    assert(dims(Multimodal.bmpCoreBytes(320, 200)) === ((320, 200)))
    assert(dims(Multimodal.bmpCoreBytes(65535, 1)) === ((65535, 1)))
    // unknown DIB header size (e.g. 16) must NOT misparse as info-header
    val odd = Multimodal.bmpBytes(320, 200)
    odd(14) = 16
    assert(dims(odd) === ((-1, -1)))
    // corrupt non-positive width is rejected, not passed through
    val negW = Multimodal.bmpBytes(320, 200)
    val w = -320
    (0 until 4).foreach(i => negW(18 + i) = ((w >>> (8 * i)) & 0xff).toByte)
    assert(dims(negW) === ((-1, -1)))
    val zeroW = Multimodal.bmpBytes(0, 200)
    assert(dims(zeroW) === ((-1, -1)))
  }

  test("decode composes sniff + dims + magic + placeholder feature") {
    val m = Multimodal.decode(7L, Multimodal.jpegBytes(800, 600))
    assert(m.format === "jpeg" && m.width === 800 && m.height === 600)
    assert(m.magic === 0xff && m.nBytes === 50 && m.feature.length === 8)
    val u = Multimodal.decode(8L, "plain text".getBytes)
    assert(u.format === "unknown" && u.width === -1 && u.height === -1)
    assert(Multimodal.decode(9L, Array.empty[Byte]).magic === -1)
  }

  test("mm3 header round-trip query matches its arithmetic prediction") {
    val rows = Multimodal.mm3HeaderParse(spark, sfDir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      val expFmt = (id % 4) match {
        case 0 => "png"; case 1 => "jpeg"; case 2 => "bmp"; case _ => "gif"
      }
      assert(r.getString(1) === expFmt, s"doc $id format")
      assert(r.getLong(2) === 16 + (id * 31) % 4080, s"doc $id width")
      assert(r.getLong(3) === 16 + (id * 17) % 2160, s"doc $id height")
    }
  }
}
