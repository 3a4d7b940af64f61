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
    assert(Multimodal.sniffFormat(Multimodal.tiffBytes(1, 1)) === "tiff")
    assert(Multimodal.sniffFormat(
      Multimodal.tiffBytes(1, 1, bigEndian = true)) === "tiff")
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
      if (h <= 65535) {
        assert(dims(Multimodal.tiffBytes(w, h)) === ((w, h)), s"tiff-le $w")
        assert(dims(Multimodal.tiffBytes(w, h, bigEndian = true))
          === ((w, h)), s"tiff-be $w")
      }
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
      Multimodal.gifBytes(640, 480),
      Multimodal.tiffBytes(640, 480),
      Multimodal.tiffBytes(640, 480, bigEndian = true)
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

  test("TIFF: missing tags and unsupported value types reject cleanly") {
    // drop ImageLength by retagging entry 2 to an unrelated tag (259)
    val noLen = Multimodal.tiffBytes(320, 200)
    noLen(22) = 3; noLen(23) = 1 // tag 259 little-endian
    assert(dims(noLen) === ((-1, -1)))
    // RATIONAL (type 5) width is unsupported → rejected, not misread
    val rat = Multimodal.tiffBytes(320, 200)
    rat(12) = 5
    assert(dims(rat) === ((-1, -1)))
    // an IFD offset pointing past the buffer fails cleanly
    val far = Multimodal.tiffBytes(320, 200)
    far(4) = 0xF0.toByte
    assert(dims(far) === ((-1, -1)))
    // big-endian value bytes are NOT valid little-endian ones: flipping
    // just the magic must change or reject the parse, never alias
    val flip = Multimodal.tiffBytes(320, 200, bigEndian = true)
    flip(0) = 0x49; flip(1) = 0x49; flip(2) = 0x2A; flip(3) = 0x00
    assert(dims(flip) !== ((320, 200)))
  }

  test("decode composes sniff + dims + magic + placeholder feature") {
    val m = Multimodal.decode(7L, Multimodal.jpegBytes(800, 600))
    assert(m.format === "jpeg" && m.width === 800 && m.height === 600)
    assert(m.magic === 0xff && m.nBytes === 50 && m.feature.length === 8)
    val u = Multimodal.decode(8L, "plain text".getBytes)
    assert(u.format === "unknown" && u.width === -1 && u.height === -1)
    assert(Multimodal.decode(9L, Array.empty[Byte]).magic === -1)
  }

  test("BMP pixel codec: encode→decode round-trips every pixel exactly") {
    val px = (x: Int, y: Int) => ((x * 7 + y) % 256, (x + y * 5) % 256, (x * y) % 256)
    // widths 1..5 cover all four row-padding residues
    (1 to 5).foreach { w =>
      val img = Multimodal.decodeBmpPixels(Multimodal.bmpPixelBytes(w, 3, px)).get
      assert(img.width === w && img.height === 3)
      for (y <- 0 until 3; x <- 0 until w) {
        val (r, g, b) = px(x, y)
        val i = 3 * (y * w + x)
        assert((img.rgb(i) & 0xff, img.rgb(i + 1) & 0xff, img.rgb(i + 2) & 0xff)
          === ((r, g, b)), s"pixel ($x,$y) at width $w")
      }
    }
  }

  test("BMP pixel codec: top-down files decode to the same pixels") {
    val bytes = Multimodal.bmpPixelBytes(4, 3, (x, y) => (x * 10 + y, 0, 0))
    val up = Multimodal.decodeBmpPixels(bytes).get
    // flip to top-down: negate height, reverse the stored row order
    val stride = (3 * 4 + 3) / 4 * 4
    val neg = -3
    (0 until 4).foreach(i => bytes(22 + i) = ((neg >>> (8 * i)) & 0xff).toByte)
    val rows = (0 until 3).map(r =>
      java.util.Arrays.copyOfRange(bytes, 54 + r * stride, 54 + (r + 1) * stride))
    rows.reverse.zipWithIndex.foreach { case (row, r) =>
      System.arraycopy(row, 0, bytes, 54 + r * stride, stride)
    }
    val down = Multimodal.decodeBmpPixels(bytes).get
    assert(down.rgb.toSeq === up.rgb.toSeq)
  }

  test("BMP pixel codec: rejects non-24bpp, compressed, truncated") {
    assert(Multimodal.decodeBmpPixels(Multimodal.pngBytes(4, 4)).isEmpty)
    // headers-only BMP (no pixel data) is truncated for its declared dims
    assert(Multimodal.decodeBmpPixels(Multimodal.bmpBytes(4, 4)).isEmpty)
    val comp = Multimodal.bmpPixelBytes(4, 4, (_, _) => (1, 2, 3))
    comp(30) = 1 // BI_RLE8
    assert(Multimodal.decodeBmpPixels(comp).isEmpty)
    val bpp = Multimodal.bmpPixelBytes(4, 4, (_, _) => (1, 2, 3))
    bpp(28) = 8
    assert(Multimodal.decodeBmpPixels(bpp).isEmpty)
  }

  test("BMP pixel codec: crafted overflow headers fail cleanly, not crash") {
    def withDims(w: Int, h: Int): Array[Byte] = {
      val b = Multimodal.bmpPixelBytes(4, 4, (_, _) => (1, 2, 3))
      (0 until 4).foreach { i =>
        b(18 + i) = ((w >>> (8 * i)) & 0xff).toByte
        b(22 + i) = ((h >>> (8 * i)) & 0xff).toByte
      }
      b
    }
    // 3*w+3 overflows Int into a negative stride without the dim cap
    assert(Multimodal.decodeBmpPixels(withDims(715827883, 4)).isEmpty)
    // |Int.MinValue| is still negative; must not reach the allocator
    assert(Multimodal.decodeBmpPixels(withDims(4, Int.MinValue)).isEmpty)
    assert(Multimodal.decodeBmpPixels(withDims(4, 0)).isEmpty)
    // zero-area headers are also rejected at the dims (metadata) level
    assert(dims(Multimodal.bmpBytes(320, 0)) === ((-1, -1)))
  }

  test("resizeBmp: nearest-neighbor floor maps, verified pixel by pixel") {
    val px = (x: Int, y: Int) => ((x * 3 + y * 7) % 256, (x * 11) % 256, (y * 13) % 256)
    val resized = Multimodal.resizeBmp(
      Multimodal.bmpPixelBytes(12, 6, px), box = 8).get
    val img = Multimodal.decodeBmpPixels(resized).get
    assert(img.width === 8 && img.height === 4) // 12x6 fit to longest=8
    for (y2 <- 0 until 4; x2 <- 0 until 8) {
      val (r, g, b) = px(x2 * 12 / 8, y2 * 6 / 4)
      val i = 3 * (y2 * 8 + x2)
      assert((img.rgb(i) & 0xff, img.rgb(i + 1) & 0xff, img.rgb(i + 2) & 0xff)
        === ((r, g, b)), s"resized pixel ($x2,$y2)")
    }
    // upscale path: 2x2 -> 8x8 replicates each source pixel 4x4
    val up = Multimodal.decodeBmpPixels(
      Multimodal.resizeBmp(Multimodal.bmpPixelBytes(2, 2, px), 8).get).get
    assert(up.width === 8 && up.height === 8)
    assert((up.rgb(3 * (3 * 8 + 3)) & 0xff) === px(0, 0)._1)
    assert((up.rgb(3 * (4 * 8 + 4)) & 0xff) === px(1, 1)._1)
  }

  test("pixelStats: sums, luma histogram, and embedding from known pixels") {
    // 2x2 image with hand-picked channels: luma and bins computed by hand
    //   (10,20,30): luma (2990+11740+3420)/1000 = 18  -> bin 18*5/256 = 0
    //   (200,10,0): luma (59800+5870+0)/1000   = 65  -> bin 1
    //   (0,250,0):  luma 146750/1000           = 146 -> bin 2
    //   (255,255,255): luma 254745/1000        = 254 -> bin 4
    val pxs = Seq((10, 20, 30), (200, 10, 0), (0, 250, 0), (255, 255, 255))
    val img = Multimodal.decodeBmpPixels(Multimodal.bmpPixelBytes(2, 2,
      (x, y) => pxs(y * 2 + x))).get
    val st = Multimodal.pixelStats(3L, img)
    assert(st.nPx === 4 && st.width === 2 && st.height === 2)
    assert((st.sumR, st.sumG, st.sumB) === ((465L, 535L, 285L)))
    assert(st.hist.toSeq === Seq(1L, 1L, 1L, 0L, 1L))
    assert(st.domC === 1) // green sum wins
    assert(st.domB === 0) // four-way tie in counts 1: first bin wins
    assert(st.emb(0) === 465.0 / (255.0 * 4))
    assert(st.emb(3) === 0.25 && st.emb(6) === 0.0 && st.emb(7) === 0.25)
    // dominant-channel tie goes to the FIRST channel (r before g before b)
    val tied = Multimodal.pixelStats(0L, Multimodal.decodeBmpPixels(
      Multimodal.bmpPixelBytes(1, 1, (_, _) => (9, 9, 9))).get)
    assert(tied.domC === 0 && tied.domB === 0)
  }

  test("featureOf: real pixel-statistics vector for BMPs, hash fallback") {
    val bmp = Multimodal.bmpPixelBytes(3, 2, (x, y) => (x * 40, y * 80, 5))
    val img = Multimodal.decodeBmpPixels(bmp).get
    val exp = Multimodal.pixelStats(0L, img).emb.map(_.toFloat)
    assert(Multimodal.featureOf(bmp).toSeq === exp.toSeq)
    // non-decodable payloads keep the deterministic byte-hash fallback
    val txt = "not an image".getBytes
    assert(Multimodal.featureOf(txt).toSeq ===
      Multimodal.byteHashFeature(txt).toSeq)
    assert(Multimodal.featureOf(txt).forall(v => v >= 0f && v <= 1f))
  }

  test("mm5/mm6: embedding witnesses match arithmetic; near-dup pairs " +
    "share the blocking key and clear the cosine bar") {
    val rows = Multimodal.mm5PixelEmbedding(spark, sfDir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      val w = (4 + id % 13).toInt; val h = (4 + id % 11).toInt
      assert(r.getLong(1) === w.toLong * h, s"doc $id n_px")
      // replay one witness end-to-end: the red-channel sum
      var sr = 0L
      for (y <- 0 until h; x <- 0 until w) sr += (x * 7 + y * 3 + id) % 256
      assert(r.getLong(2) === sr, s"doc $id sum_r")
      // bins partition the pixels
      assert((5 to 9).map(r.getLong).sum === w.toLong * h, s"doc $id bins")
    }
    val pairs = Multimodal.mm6PixelNeardup(spark, sfDir).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { p =>
      assert(p.getDouble(2) >= Multimodal.PixelNearDupCosine - 1e-4)
      // both ends must genuinely share the content-derived blocking key
      val (a, b) = (p.getLong(0), p.getLong(1))
      assert(a < b)
      assert(a % 13 === b % 13, s"pair ($a,$b) width key")
      assert(a % 11 === b % 11, s"pair ($a,$b) height key")
    }
  }

  test("Y4M: header parse round-trips the builder across layouts") {
    val p420 = Multimodal.parseY4mHeader(Multimodal.y4mBytes(8, 6, 2)).get
    assert(p420.width === 8 && p420.height === 6)
    assert(p420.colorspace === "C420jpeg" && p420.frameBytes === 8 * 6 * 3 / 2)
    val p444 = Multimodal.parseY4mHeader(
      Multimodal.y4mBytes(5, 3, 1, "C444")).get
    assert(p444.frameBytes === 3 * 5 * 3)
    val mono = Multimodal.parseY4mHeader(
      Multimodal.y4mBytes(7, 3, 1, "Cmono")).get
    assert(mono.frameBytes === 21)
    val p422 = Multimodal.parseY4mHeader(
      "YUV4MPEG2 W6 H3 C422\n".getBytes("US-ASCII")).get
    assert(p422.frameBytes === 2 * 6 * 3)
    // spec default colorspace (no C param) is 4:2:0; X params are skipped
    val dflt = Multimodal.parseY4mHeader(
      "YUV4MPEG2 W4 H2 F30:1 Ip A0:0 XYSCSS=420JPEG\n".getBytes("US-ASCII")).get
    assert(dflt.colorspace === "C420jpeg" && dflt.frameBytes === 12)
    assert(dflt.headerLen === "YUV4MPEG2 W4 H2 F30:1 Ip A0:0 XYSCSS=420JPEG\n".length)
  }

  test("Y4M: malformed headers and layouts fail cleanly as None") {
    def p(s: String) = Multimodal.parseY4mHeader(s.getBytes("US-ASCII"))
    assert(p("YUV4MPEG2 W5 H3 C420jpeg\n").isEmpty) // odd dims under 4:2:0
    assert(p("YUV4MPEG2 W5 H3 C422\n").isEmpty)     // odd width under 4:2:2
    assert(p("YUV4MPEG2 W4 H2 Cweird\n").isEmpty)   // unknown colorspace
    assert(p("YUV4MPEG2 H2 Cmono\n").isEmpty)       // missing width
    assert(p("YUV4MPEG2 W0 H2 Cmono\n").isEmpty)    // non-positive dim
    assert(p("YUV4MPEG2 Wx H2 Cmono\n").isEmpty)    // non-numeric dim
    assert(p("YUV4MPEG3 W4 H2\n").isEmpty)          // wrong magic
    assert(p("YUV4MPEG2 W4 H2 Cmono").isEmpty)      // unterminated header
    assert(p("YUV4MPEG2 W4 H2 " + "X".repeat(300) + "\n").isEmpty) // scan cap
    assert(Multimodal.parseY4mHeader(Array.empty[Byte]).isEmpty)
  }

  test("Y4M: frameSample demuxes real frame boundaries with the stride") {
    import spark.implicits._
    // 9 mono 3x2 frames, frame f filled with byte 100 + f
    val media = Seq((5L, Multimodal.y4mBytes(3, 2, 9, "Cmono", f => 100 + f)))
      .toDF("id", "payload")
    val frames = Multimodal.frameSample(media, spark, every = 4)
      .collect().sortBy(_.frameIdx)
    assert(frames.map(_.frameIdx).toSeq === Seq(0, 4, 8))
    assert(frames.forall(_.nBytes === 6))
    assert(frames.map(_.head).toSeq === Seq(100, 104, 108))
    // a truncated trailing frame is dropped, earlier frames kept
    val whole = Multimodal.y4mBytes(3, 2, 5, "Cmono")
    val cut = java.util.Arrays.copyOfRange(whole, 0, whole.length - 2)
    val cutFrames = Multimodal.frameSample(
      Seq((6L, cut)).toDF("id", "payload"), spark, every = 1).collect()
    assert(cutFrames.map(_.frameIdx).sorted.toSeq === Seq(0, 1, 2, 3))
    // garbage between frames ends the walk instead of misparsing
    val broken = whole.clone()
    val secondMark = Multimodal.parseY4mHeader(whole).get.headerLen + 6 + 6
    broken(secondMark) = 'X'
    val brokenFrames = Multimodal.frameSample(
      Seq((7L, broken)).toDF("id", "payload"), spark, every = 1).collect()
    assert(brokenFrames.map(_.frameIdx).toSeq === Seq(0))
  }

  test("GIF: frame spans round-trip the builder arithmetic") {
    // span size = 0x2C+9 descriptor (10) [+ LCT] + lzw-min (1) +
    // block (1 + dataLen) + terminator (1)
    def span(dataLen: Int, lct: Int) = 10 + lct + 1 + (1 + dataLen) + 1
    val b = Multimodal.gifStreamBytes(7, 5, 6, withGct = true, withExt = true,
      lctEvery = 3, dataLen = 12)
    val spans = Multimodal.gifFrameSpans(b)
    assert(spans.length === 6)
    // frames 0 and 3 carry a 2-entry local color table (6 bytes)
    assert(spans.map(_._2) === Seq(span(12, 6), span(12, 0), span(12, 0),
      span(12, 6), span(12, 0), span(12, 0)))
    // spans are contiguous up to the extension blocks between them
    assert(spans.forall { case (from, _) => (b(from) & 0xff) == 0x2C })
    // no GCT, no extensions: first span starts right after the 13-byte
    // header
    val plain = Multimodal.gifStreamBytes(3, 3, 2, withGct = false,
      withExt = false)
    assert(Multimodal.gifFrameSpans(plain).head._1 === 13)
  }

  test("GIF: malformed streams keep the frames already walked") {
    val whole = Multimodal.gifStreamBytes(4, 4, 4, dataLen = 8)
    // truncate inside frame 3's data sub-block
    val spans = Multimodal.gifFrameSpans(whole)
    val cut = java.util.Arrays.copyOfRange(whole, 0,
      spans(3)._1 + spans(3)._2 - 3)
    assert(Multimodal.gifFrameSpans(cut).length === 3)
    // an unknown block byte between frames stops the walk
    val broken = whole.clone()
    broken(spans(2)._1) = 0x55
    assert(Multimodal.gifFrameSpans(broken).length === 2)
    // non-GIF and too-short inputs produce no spans
    assert(Multimodal.gifFrameSpans("GIF89a".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.gifFrameSpans(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("GIF: frameSample demuxes descriptor frames with the stride") {
    import spark.implicits._
    val media = Seq((9L, Multimodal.gifStreamBytes(5, 4, 7, dataLen = 10)))
      .toDF("id", "payload")
    val frames = Multimodal.frameSample(media, spark, every = 3)
      .collect().sortBy(_.frameIdx)
    assert(frames.map(_.frameIdx).toSeq === Seq(0, 3, 6))
    assert(frames.forall(_.head === 0x2C))
    assert(frames.forall(_.nBytes === 10 + 1 + 11 + 1))
  }

  test("mm2 census matches the Y4M layout arithmetic per document") {
    val rows = Multimodal.mm2FrameCensus(spark, sfDir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      val w = (2 * (2 + id % 6)).toInt
      val h = (2 * (2 + id % 4)).toInt
      val nf = (1 + id % 9).toInt
      val fb = (id % 3) match {
        case 0 => w * h * 3 / 2
        case 1 => 3 * w * h
        case _ => w * h
      }
      val ns = (nf + 3) / 4
      assert(r.getLong(1) === ns, s"doc $id n_sampled")
      assert(r.getLong(2) === ((nf - 1) / 4) * 4, s"doc $id last_idx")
      assert(r.getLong(3) === ns.toLong * fb, s"doc $id bytes_sampled")
      val hs = (0 until nf by 4).map(f => (id + f) % 256).sum
      assert(r.getLong(4) === hs, s"doc $id head_sum")
    }
  }

  test("mm3 header round-trip query matches its arithmetic prediction") {
    val rows = Multimodal.mm3HeaderParse(spark, sfDir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      val expFmt = (id % 5) match {
        case 0 => "png"; case 1 => "jpeg"; case 2 => "bmp"
        case 3 => "gif"; case _ => "tiff"
      }
      assert(r.getString(1) === expFmt, s"doc $id format")
      assert(r.getLong(2) === 16 + (id * 31) % 4080, s"doc $id width")
      assert(r.getLong(3) === 16 + (id * 17) % 2160, s"doc $id height")
    }
  }
}
