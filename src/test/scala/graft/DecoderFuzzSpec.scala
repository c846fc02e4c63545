package graft

import org.scalatest.funsuite.AnyFunSuite

/** Crash-safety fuzz for every pure-JVM binary decoder: at 100 TB the
  * failure mode that matters is a malformed blob KILLING A TASK — the
  * contract everywhere is "None, never exceptions". Three adversarial
  * families per decoder: random bytes, every truncation prefix of a
  * valid fixture (the range-request read path), and random single-byte
  * mutations of valid fixtures (bit rot / codec bugs upstream). The
  * RNG is seeded — failures reproduce.
  */
class DecoderFuzzSpec extends AnyFunSuite {

  private val decoders: Seq[(String, Array[Byte] => Any)] = Seq(
    "wav header" -> Multimodal.decodeWavHeader _,
    "wav samples" -> Multimodal.decodeWavSamples _,
    "png header" -> Multimodal.decodePngHeader _,
    "png gray" -> Multimodal.decodePngGray _,
    "png dhash" -> Multimodal.pngDHash _,
    "bmp header" -> Multimodal.decodeBmpHeader _,
    "bmp gray" -> Multimodal.decodeBmpGray _,
    "jpeg header" -> Multimodal.decodeJpegHeader _,
    "jpeg gray" -> Multimodal.decodeJpegGray _,
    "jpeg dhash" -> Multimodal.jpegDHash _,
    "jpeg exif" -> Multimodal.decodeJpegExif _,
    "image dhash" -> Multimodal.imageDHash _,
    "mp4 header" -> Multimodal.decodeMp4Header _,
    "mp4 samples" -> Multimodal.decodeMp4Samples _,
    "avi mjpeg" -> Multimodal.decodeAviMjpeg _,
    "bmp dhash" -> Multimodal.bmpDHash _,
    "gif gray" -> Multimodal.decodeGifGray _,
    "gif dhash" -> Multimodal.gifDHash _,
    "gif frames" -> Multimodal.decodeGifFrames _,
    "tiff gray" -> Multimodal.decodeTiffGray _,
    "tiff dhash" -> Multimodal.tiffDHash _,
    "wav phash" -> Multimodal.wavPhash _,
    // r20 census sniffers — header-only, bounds-checked per read
    "webp header" -> Multimodal.decodeWebpHeader _,
    "avif header" -> Multimodal.decodeAvifHeader _,
    "ogg header" -> Multimodal.decodeOggHeader _,
    "flac header" -> Multimodal.decodeFlacHeader _,
    "mp3 header" -> Multimodal.decodeMp3Header _,
    "adts header" -> Multimodal.decodeAdtsHeader _,
    "image header" -> Multimodal.decodeImageHeader _,
    "audio header" -> Multimodal.decodeAudioHeader _)

  /** A REAL GIF-flavor LZW encoder (variable width, LSB-first,
    * dictionary growth, the add-then-widen rule) — the spec's own
    * reference implementation, independent of both the decoder under
    * test and ImageIO, so the two interop tests triangulate. */
  private def lzwEncode(mcs: Int, syms: Array[Int]): Array[Byte] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    var acc = 0L
    var nb = 0
    var width = mcs + 1
    def emit(code: Int): Unit = {
      acc |= code.toLong << nb
      nb += width
      while (nb >= 8) {
        out += (acc & 0xff).toByte
        acc >>= 8
        nb -= 8
      }
    }
    val dict = scala.collection.mutable.HashMap[List[Int], Int]()
    var next = eoi + 1
    emit(clear)
    var cur = List(syms(0))
    def codeOf(s: List[Int]): Int =
      if (s.length == 1) s.head else dict(s)
    for (s <- syms.drop(1)) {
      val ext = cur :+ s
      if (cur.length > 1 && !dict.contains(cur)) fail("encoder bug")
      if (dict.contains(ext) ) cur = ext
      else {
        emit(codeOf(cur))
        if (next < 4096) {
          dict(ext) = next
          next += 1
          // GIF is NOT early-change: the decoder adds each entry one
          // code LATER than the encoder, so the encoder widens one
          // add after the power-of-two boundary (verified against the
          // JDK ImageIO GIF encoder's streams)
          if (next == (1 << width) + 1 && width < 12) width += 1
        }
        cur = List(s)
      }
    }
    emit(codeOf(cur))
    emit(eoi)
    if (nb > 0) out += (acc & 0xff).toByte
    out.toArray
  }

  /** Wrap an LZW payload into a complete single-frame GIF87a. */
  private def buildGif(w: Int, h: Int, mcs: Int, palette: Array[Int],
                       lzw: Array[Byte],
                       interlaced: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF87a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write(v >> 8) }
    le16(w); le16(h)
    val sizeBits = (math.log(palette.length) / math.log(2)).round.toInt
    out.write(0x80 | 0x70 | (sizeBits - 1)); out.write(0); out.write(0)
    palette.foreach { g => out.write(g); out.write(g); out.write(g) }
    out.write(0x2c); le16(0); le16(0); le16(w); le16(h)
    out.write(if (interlaced) 0x40 else 0x00)
    out.write(mcs)
    var off = 0
    while (off < lzw.length) { // sub-block framing, 255-byte max
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0); out.write(0x3b)
    out.toByteArray
  }

  /** Valid seed fixtures — one genuine container per format, built the
    * way the specs build them, so mutations start from parseable bytes
    * (pure-random input rarely gets past a magic check).
    */
  private def fixtures: Seq[Array[Byte]] = {
    val wav = {
      val n = 40
      val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(36 + 2 * n)
      bb.put("WAVE".getBytes)
      bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1)
      bb.putShort(1); bb.putInt(8000); bb.putInt(16000); bb.putShort(2)
      bb.putShort(16)
      bb.put("data".getBytes); bb.putInt(2 * n)
      (0 until n).foreach(i => bb.putShort(((i * 37) % 2000 - 1000).toShort))
      bb.array()
    }
    val bmp = {
      val rowBytes = 28
      val bb = java.nio.ByteBuffer.allocate(54 + rowBytes * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("BM".getBytes); bb.putInt(54 + rowBytes * 8); bb.putInt(0)
      bb.putInt(54); bb.putInt(40); bb.putInt(9); bb.putInt(8)
      bb.putShort(1); bb.putShort(24); bb.putInt(0); bb.putInt(rowBytes * 8)
      bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
      for (s <- 0 until 8; c <- 0 until 9) {
        val p = ((s * 29 + c * 53) % 255).toByte
        bb.put(p); bb.put(p); bb.put(p)
        if (c == 8) bb.put(0.toByte)
      }
      bb.array()
    }
    val png = {
      val raw = new Array[Byte](8 * 10)
      for (r <- 0 until 8; c <- 0 until 9)
        raw(r * 10 + 1 + c) = ((r * 29 + c * 53) % 255).toByte
      val defl = new java.util.zip.Deflater()
      defl.setInput(raw); defl.finish()
      val zbuf = new Array[Byte](raw.length + 64)
      val zlen = defl.deflate(zbuf); defl.end()
      def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
        val crc = new java.util.zip.CRC32()
        val tb = typ.getBytes("US-ASCII")
        crc.update(tb); crc.update(data)
        java.nio.ByteBuffer.allocate(12 + data.length)
          .putInt(data.length).put(tb).put(data)
          .putInt(crc.getValue.toInt).array()
      }
      val ihdr = java.nio.ByteBuffer.allocate(13).putInt(9).putInt(8)
        .put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        .put(0.toByte).array()
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte) ++
        chunk("IHDR", ihdr) ++ chunk("IDAT", zbuf.take(zlen)) ++
        chunk("IEND", Array.empty[Byte])
    }
    val jpeg = {
      val bb = java.nio.ByteBuffer.allocate(39)
      bb.putShort(0xFFD8.toShort)
      bb.putShort(0xFFE0.toShort); bb.putShort(16)
      bb.put("JFIF".getBytes); bb.put(0.toByte)
      bb.put(Array[Byte](1, 1, 1, 0, 72, 0, 96, 0, 0))
      bb.putShort(0xFFC0.toShort); bb.putShort(17); bb.put(8.toByte)
      bb.putShort(240.toShort); bb.putShort(320.toShort); bb.put(3.toByte)
      bb.put(Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
      bb.array()
    }
    val mp4 = {
      // fast-start Motion-JPEG MP4: ftyp + moov(mvhd, trak→…→stbl
      // with stsd/stsz/stsc/stco) + mdat holding one 39-byte JPEG —
      // the q194 layout at fCount = 1, built imperatively here
      val frame = jpeg.take(39)
      val bb = java.nio.ByteBuffer.allocate(385)
      def fourcc(s: String) = bb.put(s.getBytes("US-ASCII"))
      bb.putInt(16); fourcc("ftyp"); fourcc("isom"); bb.putInt(0)
      bb.putInt(322); fourcc("moov")
      bb.putInt(108); fourcc("mvhd"); bb.putInt(0); bb.putInt(0)
      bb.putInt(0); bb.putInt(1000); bb.putInt(40); bb.putInt(0x10000)
      bb.putShort(0x100.toShort); bb.putShort(0)
      bb.putLong(0)
      bb.putInt(0x10000); bb.putInt(0); bb.putInt(0)
      bb.putInt(0); bb.putInt(0x10000); bb.putInt(0)
      bb.putInt(0); bb.putInt(0); bb.putInt(0x40000000)
      (0 until 6).foreach(_ => bb.putInt(0)) // pre_defined
      bb.putInt(2) // next track id
      bb.putInt(206); fourcc("trak")
      bb.putInt(198); fourcc("mdia")
      bb.putInt(190); fourcc("minf")
      bb.putInt(182); fourcc("stbl")
      bb.putInt(102); fourcc("stsd"); bb.putInt(0); bb.putInt(1)
      bb.putInt(86); fourcc("jpeg")
      (0 until 6).foreach(_ => bb.put(0.toByte)); bb.putShort(1)
      (0 until 4).foreach(_ => bb.putInt(0))
      bb.putShort(320.toShort); bb.putShort(240.toShort)
      bb.putInt(0x480000); bb.putInt(0x480000); bb.putInt(0)
      bb.putShort(1)
      (0 until 8).foreach(_ => bb.putInt(0)) // compressorname
      bb.putShort(24); bb.putShort(-1)
      bb.putInt(24); fourcc("stsz"); bb.putInt(0); bb.putInt(0)
      bb.putInt(1); bb.putInt(39)
      bb.putInt(28); fourcc("stsc"); bb.putInt(0); bb.putInt(1)
      bb.putInt(1); bb.putInt(1); bb.putInt(1)
      bb.putInt(20); fourcc("stco"); bb.putInt(0); bb.putInt(1)
      bb.putInt(346) // ftyp 16 + moov 322 + mdat header 8
      bb.putInt(47); fourcc("mdat"); bb.put(frame)
      bb.array()
    }
    val gif = {
      val (w, h) = (9, 8)
      val pix = Array.tabulate(w * h)(i =>
        ((i % w) * 29 + (i / w) * 53) % 256)
      buildGif(w, h, 8, Array.tabulate(256)(identity),
        lzwEncode(8, pix))
    }
    val tiff = {
      val (w, h) = (9, 8)
      val bb = java.nio.ByteBuffer.allocate(8 + w * h + 2 + 8 * 12 + 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('I'.toByte).put('I'.toByte).putShort(42)
      bb.putInt(8 + w * h) // IFD after the strip
      for (i <- 0 until w * h)
        bb.put((((i % w) * 29 + (i / w) * 53) % 256).toByte)
      bb.putShort(8)
      def e(tag: Int, typ: Int, cnt: Int, v: Int): Unit = {
        bb.putShort(tag.toShort); bb.putShort(typ.toShort); bb.putInt(cnt)
        if (typ == 3) { bb.putShort(v.toShort); bb.putShort(0) }
        else bb.putInt(v)
      }
      e(256, 3, 1, w); e(257, 3, 1, h); e(258, 3, 1, 8); e(259, 3, 1, 1)
      e(262, 3, 1, 1); e(273, 4, 1, 8); e(278, 3, 1, h)
      e(279, 4, 1, w * h)
      bb.putInt(0)
      bb.array()
    }
    val adpcm = {
      val ba = 12
      val bb = java.nio.ByteBuffer.allocate(44 + 2 * ba)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(36 + 2 * ba)
      bb.put("WAVE".getBytes)
      bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(0x11)
      bb.putShort(1); bb.putInt(8000); bb.putInt(4000)
      bb.putShort(ba.toShort); bb.putShort(4)
      bb.put("data".getBytes); bb.putInt(2 * ba)
      for (b <- 0 until 2) {
        bb.putShort((b * 321 - 100).toShort); bb.put((b * 5).toByte)
        bb.put(0.toByte)
        (0 until ba - 4).foreach(i => bb.put(((i * 57 + b) % 256).toByte))
      }
      bb.array()
    }
    // r20 census containers (appended — earlier indices are pinned by
    // the mp4/tiff seed tests)
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val webp = hx("52494646" + "16000000" + "57454250" + "56503820" +
      "0A000000" + "000000" + "9D012A" + "1400" + "0B00")
    val avif = hx("00000010" + "66747970" + "61766966" + "00000000" +
      "00000040" + "6D657461" + "00000000" +
      "00000034" + "69707270" +
      "0000002C" + "6970636F" +
      "00000014" + "69737065" + "00000000" + "00000021" + "00000015" +
      "00000010" + "70697869" + "00000000" + "03" + "080808")
    val ogg = hx("4F676753" + "00" + "02" + "00" * 8 + "01000000" +
      "00000000" + "00000000" + "01" + "13" +
      "4F70757348656164" + "01" + "02" + "0000" + "803E0000" +
      "0000" + "00")
    val stereoAdpcm = hx("52494646" + "38000000" + "57415645" +
      "666D7420" + "14000000" + "1100" + "0200" + "401F0000" +
      "A00F0000" + "1000" + "0400" + "0200" + "0900" +
      "64617461" + "10000000" +
      "6400" + "0000" + "CEFF" + "0000" + "21436587" + "A9CBED0F")
    val mp3Padded = hx("494433030000" + "00000004" + "00" * 4 +
      "00" * 6 + "FFFB94C0")
    Seq(wav, bmp, png, jpeg, jpegScan, mp4, gif, tiff, adpcm,
      webp, avif, ogg, stereoAdpcm, mp3Padded)
  }

  /** A complete DC-only baseline grayscale JPEG (24×16 = 3×2 flat
    * blocks), built IMPERATIVELY here — an independent re-derivation
    * of the q184 fixture layout (all-ones quant, twelve 4-bit DC
    * codes, 1-bit EOB), so the Column-arithmetic builder and this one
    * cross-check each other through [[Multimodal.decodeJpegGray]]. */
  private lazy val jpegScanBlocks = Array(Array(10, 128, 250),
    Array(60, 200, 5))
  private lazy val jpegScan: Array[Byte] = {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val bits = new StringBuilder
    var prev = 0
    for (r <- 0 until 2; c <- 0 until 3) {
      val f = 8 * (jpegScanBlocks(r)(c) - 128)
      val diff = f - prev
      prev = f
      val cat = if (diff == 0) 0
        else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      bits.append(("0000" + cat.toBinaryString).takeRight(4))
      if (cat > 0) {
        val amp = if (diff >= 0) diff else diff + (1 << cat) - 1
        bits.append(("0" * cat + amp.toBinaryString).takeRight(cat))
      }
      bits.append("0") // EOB
    }
    while (bits.length % 8 != 0) bits.append("1")
    val scan = bits.toString.grouped(8)
      .map(Integer.parseInt(_, 2))
      .flatMap(v => if (v == 0xFF) Seq(0xFF, 0x00) else Seq(v))
      .map(_.toByte).toArray
    hx("FFD8" + "FFDB004300" + "01" * 64 +
      "FFC0000B08" + "0010" + "0018" + "01011100" +
      "FFC4001F00" + "0000000C" + "00" * 12 +
      "000102030405060708090A0B" +
      "FFC4001410" + "01" + "00" * 15 + "00" +
      "FFDA0008010100003F00") ++ scan ++ hx("FFD9")
  }

  test("jpeg gray: a DC-only baseline fixture decodes to exact flat " +
    "blocks (F00 = 8·(p − 128) round-trips through the IDCT)") {
    val img = Multimodal.decodeJpegGray(jpegScan).get
    assert(img.length == 16 && img(0).length == 24)
    for (y <- 0 until 16; x <- 0 until 24)
      assert(img(y)(x) == jpegScanBlocks(y / 8)(x / 8),
        s"pixel ($x,$y): ${img(y)(x)}")
  }

  test("jpeg gray: decodes the JDK ImageIO encoder's real baseline " +
    "output (standard Huffman tables, full AC path) within JPEG " +
    "quantization error") {
    import java.awt.image.BufferedImage
    val (w, h) = (40, 25)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, 60 + 2 * x + 3 * y)
    val baos = new java.io.ByteArrayOutputStream
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(
      javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.97f)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null),
      param)
    ios.close()
    writer.dispose()
    val img = Multimodal.decodeJpegGray(baos.toByteArray)
      .getOrElse(fail("ImageIO baseline JPEG did not decode"))
    assert(img.length == h && img(0).length == w)
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w)
      maxErr = math.max(maxErr,
        math.abs(img(y)(x) - (60 + 2 * x + 3 * y)))
    assert(maxErr <= 8,
      s"max pixel error $maxErr vs the reference encoder at q=0.97")
  }

  test("jpeg gray: decodes the JDK ImageIO encoder's COLOR output " +
    "(interleaved YCbCr, subsampled chroma) to the luma plane " +
    "within JPEG quantization error") {
    import java.awt.image.BufferedImage
    val (w, h) = (37, 22) // odd dims: exercises MCU edge crop
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    def rgb(x: Int, y: Int) =
      (40 + 4 * x, 30 + 5 * y, 90 + 2 * x + 2 * y) // smooth ramps
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgb(x, y)
      bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val baos = new java.io.ByteArrayOutputStream
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(
      javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.97f)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null),
      param)
    ios.close()
    writer.dispose()
    val bytes = baos.toByteArray
    // must really be a 3-component frame (the encoder writes YCbCr)
    assert(Multimodal.decodeJpegHeader(bytes)
      .exists(_.bits_per_pixel == 24), "expected a color JPEG")
    val img = Multimodal.decodeJpegGray(bytes)
      .getOrElse(fail("ImageIO color baseline JPEG did not decode"))
    assert(img.length == h && img(0).length == w)
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgb(x, y)
      val luma = math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt
      maxErr = math.max(maxErr, math.abs(img(y)(x) - luma))
    }
    assert(maxErr <= 8,
      s"max luma error $maxErr vs BT.601 of the source at q=0.97")
  }

  test("jpeg gray: a grayscale SOF declaring 2x2 sampling factors " +
    "still decodes in raster block order (T.81 A.2: a single-" +
    "component scan is non-interleaved, factors ignored)") {
    // same stream as jpegScan but the SOF component byte says 2x2 —
    // some encoders keep luma's default factors when writing gray
    val mutated = jpegScan.clone()
    // SOF0 payload: FFC0 000B 08 0010 0018 01 [id=01 hv=11 tq=00];
    // the hv byte is 2 before the end of the 0x0B-long segment
    val sofAt = {
      var i = 2
      while (!((mutated(i) & 0xff) == 0xff &&
        (mutated(i + 1) & 0xff) == 0xc0)) i += 1
      i
    }
    // marker(2) + len(2) + prec(1) + h(2) + w(2) + nc(1) + id(1)
    val hvAt = sofAt + 11
    assert((mutated(hvAt) & 0xff) == 0x11, "fixture layout moved")
    mutated(hvAt) = 0x22.toByte
    val img = Multimodal.decodeJpegGray(mutated)
      .getOrElse(fail("2x2-factor grayscale JPEG did not decode"))
    assert(img.length == 16 && img(0).length == 24)
    for (y <- 0 until 16; x <- 0 until 24)
      assert(img(y)(x) == jpegScanBlocks(y / 8)(x / 8),
        s"pixel ($x,$y): ${img(y)(x)} — block order scrambled")
  }

  /** jpegScan re-encoded with a RESTART INTERVAL of 2 MCUs: DRI
    * before SOS, the scan split into byte-aligned segments joined by
    * RST0/RST1, DC prediction reset per segment — the re-sync layout
    * every camera emits. */
  private lazy val jpegScanRestart: Array[Byte] = {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def segBytes(blocks: Seq[Int]): Array[Byte] = {
      val bits = new StringBuilder
      var prev = 0
      for (p <- blocks) {
        val f = 8 * (p - 128)
        val diff = f - prev
        prev = f
        val cat = if (diff == 0) 0
          else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        bits.append(("0000" + cat.toBinaryString).takeRight(4))
        if (cat > 0) {
          val amp = if (diff >= 0) diff else diff + (1 << cat) - 1
          bits.append(("0" * cat + amp.toBinaryString).takeRight(cat))
        }
        bits.append("0") // EOB
      }
      while (bits.length % 8 != 0) bits.append("1")
      bits.toString.grouped(8).map(Integer.parseInt(_, 2))
        .flatMap(v => if (v == 0xFF) Seq(0xFF, 0x00) else Seq(v))
        .map(_.toByte).toArray
    }
    val raster = for (r <- 0 until 2; c <- 0 until 3)
      yield jpegScanBlocks(r)(c)
    val segs = raster.grouped(2).map(segBytes).toSeq
    val scan = segs.zipWithIndex.map { case (s, i) =>
      if (i < segs.size - 1)
        s ++ Array(0xFF.toByte, (0xD0 + (i % 8)).toByte)
      else s
    }.reduce(_ ++ _)
    hx("FFD8" + "FFDB004300" + "01" * 64 +
      "FFC0000B08" + "0010" + "0018" + "01011100" +
      "FFC4001F00" + "0000000C" + "00" * 12 +
      "000102030405060708090A0B" +
      "FFC4001410" + "01" + "00" * 15 + "00" +
      "FFDD00040002" + // DRI: restart every 2 MCUs
      "FFDA0008010100003F00") ++ scan ++ hx("FFD9")
  }

  test("jpeg gray: restart intervals (DRI + RSTn) re-sync and reset " +
    "DC prediction — the segmented fixture decodes to the same " +
    "blocks as its unsegmented twin") {
    val img = Multimodal.decodeJpegGray(jpegScanRestart)
      .getOrElse(fail("restart-interval JPEG did not decode"))
    assert(img.length == 16 && img(0).length == 24)
    for (y <- 0 until 16; x <- 0 until 24)
      assert(img(y)(x) == jpegScanBlocks(y / 8)(x / 8),
        s"pixel ($x,$y): ${img(y)(x)}")
  }

  private def imageIoJpeg(bi: java.awt.image.BufferedImage,
                          progressive: Boolean): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(
      javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.97f)
    if (progressive)
      param.setProgressiveMode(
        javax.imageio.ImageWriteParam.MODE_DEFAULT)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null),
      param)
    ios.close()
    writer.dispose()
    baos.toByteArray
  }

  private def isSof2(bytes: Array[Byte]): Boolean =
    bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2)

  test("jpeg gray: decodes the JDK ImageIO encoder's PROGRESSIVE " +
    "grayscale output (the encoder's own multi-scan script: DC " +
    "first/refine, AC spectral selection + successive approximation) " +
    "within JPEG quantization error") {
    import java.awt.image.BufferedImage
    val (w, h) = (41, 26) // odd dims: MCU edge crop under SOF2
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, 55 + 3 * x + 2 * y)
    val bytes = imageIoJpeg(bi, progressive = true)
    assert(isSof2(bytes), "ImageIO did not write a progressive frame")
    val img = Multimodal.decodeJpegGray(bytes)
      .getOrElse(fail("ImageIO progressive JPEG did not decode"))
    assert(img.length == h && img(0).length == w)
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w)
      maxErr = math.max(maxErr,
        math.abs(img(y)(x) - (55 + 3 * x + 2 * y)))
    assert(maxErr <= 8,
      s"max pixel error $maxErr vs the progressive encoder at q=0.97")
  }

  test("jpeg gray: decodes the JDK ImageIO encoder's PROGRESSIVE " +
    "COLOR output (interleaved DC scans, per-component AC scans — " +
    "chroma-only scans skipped by marker-scan) to the luma plane " +
    "within JPEG quantization error") {
    import java.awt.image.BufferedImage
    val (w, h) = (37, 22)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    def rgb(x: Int, y: Int) =
      (40 + 4 * x, 30 + 5 * y, 90 + 2 * x + 2 * y)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgb(x, y)
      bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bytes = imageIoJpeg(bi, progressive = true)
    assert(isSof2(bytes), "ImageIO did not write a progressive frame")
    val img = Multimodal.decodeJpegGray(bytes)
      .getOrElse(fail("ImageIO progressive color JPEG did not decode"))
    assert(img.length == h && img(0).length == w)
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgb(x, y)
      val luma = math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt
      maxErr = math.max(maxErr, math.abs(img(y)(x) - luma))
    }
    assert(maxErr <= 8,
      s"max luma error $maxErr vs BT.601 of the source at q=0.97")
  }

  test("png gray: decodes the JDK ImageIO encoder's PALETTE-8 output " +
    "(color type 3, PLTE lookup) to exact grays") {
    import java.awt.image.{BufferedImage, IndexColorModel}
    val (w, h) = (23, 14)
    // a deliberately permuted palette: entry i is gray (i*7)%256, so
    // index != gray and a skipped lookup is visible
    val grays = Array.tabulate(256)(i => ((i * 7) % 256).toByte)
    val icm = new IndexColorModel(8, 256, grays, grays, grays)
    val bi = new BufferedImage(w, h,
      BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, (x * 5 + y * 11) % 256)
    val baos = new java.io.ByteArrayOutputStream
    javax.imageio.ImageIO.write(bi, "png", baos)
    val bytes = baos.toByteArray
    assert((bytes(25) & 0xff) == 3, "ImageIO did not write color type 3")
    val img = Multimodal.decodePngGray(bytes)
      .getOrElse(fail("ImageIO palette PNG did not decode"))
    assert(img.length == h && img(0).length == w)
    for (y <- 0 until h; x <- 0 until w) {
      val expected = ((x * 5 + y * 11) % 256 * 7) % 256
      assert(img(y)(x) == expected,
        s"pixel ($x,$y): ${img(y)(x)} != $expected — PLTE lookup wrong")
    }
  }

  test("png gray: decodes the JDK ImageIO encoder's ADAM7-INTERLACED " +
    "gray output bit-equal to the sequential decode of the same image") {
    import java.awt.image.BufferedImage
    val (w, h) = (21, 13) // non-multiples of 8 exercise partial passes
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, (x * 13 + y * 29 + 7) % 256)
    def write(progressive: Boolean): Array[Byte] = {
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("png").next()
      val baos = new java.io.ByteArrayOutputStream
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      if (progressive) p.setProgressiveMode(
        javax.imageio.ImageWriteParam.MODE_DEFAULT)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), p)
      ios.close(); writer.dispose()
      baos.toByteArray
    }
    val seq = write(progressive = false)
    val inter = write(progressive = true)
    assert((inter(28) & 0xff) == 1, "ImageIO did not write Adam7")
    assert((seq(28) & 0xff) == 0)
    val a = Multimodal.decodePngGray(seq)
      .getOrElse(fail("sequential gray PNG did not decode"))
    val b = Multimodal.decodePngGray(inter)
      .getOrElse(fail("interlaced gray PNG did not decode"))
    assert(a.length == h && b.length == h)
    for (y <- 0 until h; x <- 0 until w) {
      val expected = (x * 13 + y * 29 + 7) % 256
      assert(a(y)(x) == expected, s"seq pixel ($x,$y)")
      assert(b(y)(x) == expected,
        s"interlaced pixel ($x,$y): ${b(y)(x)} != $expected — " +
          "de-interlace scatter wrong")
    }
  }

  test("png gray: decodes the JDK ImageIO encoder's 16-BIT gray " +
    "output with the high-byte truncation") {
    import java.awt.image.BufferedImage
    val (w, h) = (17, 11)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_USHORT_GRAY)
    def v16(x: Int, y: Int) = (x * 4111 + y * 911 + 257) % 65536
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, v16(x, y))
    val baos = new java.io.ByteArrayOutputStream
    javax.imageio.ImageIO.write(bi, "png", baos)
    val bytes = baos.toByteArray
    assert((bytes(24) & 0xff) == 16, "ImageIO did not write depth 16")
    val img = Multimodal.decodePngGray(bytes)
      .getOrElse(fail("16-bit gray PNG did not decode"))
    for (y <- 0 until h; x <- 0 until w)
      assert(img(y)(x) == (v16(x, y) >> 8),
        s"pixel ($x,$y): ${img(y)(x)} != ${v16(x, y) >> 8} — " +
          "16-bit truncation wrong (LSB taken?)")
  }

  test("png gray: decodes the JDK ImageIO encoder's 4-BIT PALETTE " +
    "output (sub-8 bit unpacking + PLTE lookup)") {
    import java.awt.image.{BufferedImage, IndexColorModel}
    val (w, h) = (19, 9) // odd width: the last byte carries pad bits
    // 16 permuted gray entries: entry i = gray (i*13+5)%256
    val grays = Array.tabulate(16)(i => ((i * 13 + 5) % 256).toByte)
    val icm = new IndexColorModel(4, 16, grays, grays, grays)
    val bi = new BufferedImage(w, h,
      BufferedImage.TYPE_BYTE_BINARY, icm)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, (x * 3 + y * 7) % 16)
    val baos = new java.io.ByteArrayOutputStream
    javax.imageio.ImageIO.write(bi, "png", baos)
    val bytes = baos.toByteArray
    assert((bytes(24) & 0xff) == 4 && (bytes(25) & 0xff) == 3,
      s"ImageIO wrote depth ${bytes(24)} type ${bytes(25)}, not 4/3")
    val img = Multimodal.decodePngGray(bytes)
      .getOrElse(fail("4-bit palette PNG did not decode"))
    for (y <- 0 until h; x <- 0 until w) {
      val expected = ((x * 3 + y * 7) % 16 * 13 + 5) % 256
      assert(img(y)(x) == expected,
        s"pixel ($x,$y): ${img(y)(x)} != $expected — bit unpack or " +
          "PLTE lookup wrong")
    }
  }

  test("png gray: decodes a 1-BIT image (the lowest packed depth, " +
    "eight samples per byte)") {
    import java.awt.image.BufferedImage
    val (w, h) = (21, 7) // width % 8 != 0: trailing pad bits
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY)
    def bit(x: Int, y: Int) = (x * 5 + y * 3) % 7 < 3
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, if (bit(x, y)) 1 else 0)
    val baos = new java.io.ByteArrayOutputStream
    javax.imageio.ImageIO.write(bi, "png", baos)
    val bytes = baos.toByteArray
    assert((bytes(24) & 0xff) == 1,
      s"ImageIO wrote depth ${bytes(24)}, not 1")
    val img = Multimodal.decodePngGray(bytes)
      .getOrElse(fail("1-bit PNG did not decode"))
    for (y <- 0 until h; x <- 0 until w)
      assert(img(y)(x) == (if (bit(x, y)) 255 else 0),
        s"pixel ($x,$y): ${img(y)(x)} — 1-bit unpack wrong")
  }

  test("mp4 samples: the fast-start Motion-JPEG fixture walks the " +
    "sample-table chain to one decoded frame with the JPEG's own dims") {
    val m = Multimodal.decodeMp4Samples(fixtures(5)) // the mp4 seed
      .getOrElse(fail("MP4 sample fixture did not decode"))
    assert(m.codec == "jpeg" && m.declared_samples == 1)
    // decoded from the sample bytes, not stsd; the seed has no stss
    // box, so the spec default applies: every sample is sync
    assert(m.frames ==
      Seq(Multimodal.Mp4Sample(0, "jpeg", 320, 240, is_sync = true)),
      s"frames: ${m.frames}")
  }

  test("png gray: decodes the JDK ImageIO encoder's RGBA output " +
    "(color type 6) with white compositing — opaque pixels are the " +
    "identity, translucent ones follow comp = (x·a + 255·(255−a))/255") {
    import java.awt.image.BufferedImage
    val (w, h) = (17, 11)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 13 + y * 29 + 5) % 256
      val a = if ((x + y) % 3 == 0) 255 else (x * 31 + y * 7) % 256
      bi.setRGB(x, y, (a << 24) | (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream
    javax.imageio.ImageIO.write(bi, "png", baos)
    val bytes = baos.toByteArray
    assert((bytes(25) & 0xff) == 6, "ImageIO did not write color type 6")
    val img = Multimodal.decodePngGray(bytes)
      .getOrElse(fail("ImageIO RGBA PNG did not decode"))
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 13 + y * 29 + 5) % 256
      val a = if ((x + y) % 3 == 0) 255 else (x * 31 + y * 7) % 256
      val expected = (v * a + 255 * (255 - a)) / 255 // 3 equal channels
      assert(img(y)(x) == expected,
        s"pixel ($x,$y) a=$a: ${img(y)(x)} != $expected")
    }
  }

  test("png gray: a hand-built GRAY+ALPHA (color type 4) image " +
    "filters at bpp 2 and composites the alpha lane, not the gray") {
    val (w, h) = (9, 6)
    val gray = Array.tabulate(h, w)((y, x) => (x * 23 + y * 41 + 3) % 256)
    val alph = Array.tabulate(h, w)((y, x) => (x * 17 + y * 53 + 9) % 256)
    // raw scanlines: filter 1 (Sub) everywhere — left is the same
    // LANE two bytes back, so a bpp-1 reconstruction scrambles it
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      raw.write(1)
      for (x <- 0 until w; k <- 0 until 2) {
        val cur = if (k == 0) gray(y)(x) else alph(y)(x)
        val left = if (x == 0) 0 else if (k == 0) gray(y)(x - 1)
          else alph(y)(x - 1)
        raw.write((cur - left) & 0xff)
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw.toByteArray); defl.finish()
    val zbuf = new Array[Byte](raw.size() + 64)
    val zlen = defl.deflate(zbuf); defl.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val tb = typ.getBytes("US-ASCII")
      crc.update(tb); crc.update(data)
      java.nio.ByteBuffer.allocate(12 + data.length)
        .putInt(data.length).put(tb).put(data)
        .putInt(crc.getValue.toInt).array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(4.toByte).put(0.toByte).put(0.toByte)
      .put(0.toByte).array()
    val bytes = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", zbuf.take(zlen)) ++
      chunk("IEND", Array.empty[Byte])
    val img = Multimodal.decodePngGray(bytes)
      .getOrElse(fail("gray+alpha PNG did not decode"))
    for (y <- 0 until h; x <- 0 until w) {
      val a = alph(y)(x)
      val expected = (gray(y)(x) * a + 255 * (255 - a)) / 255
      assert(img(y)(x) == expected,
        s"pixel ($x,$y): ${img(y)(x)} != $expected")
    }
  }

  test("gif gray: the spec's own LZW encoder round-trips exactly — " +
    "dictionary growth, width stepping, and sub-block reassembly") {
    // 64×48 with enough distinct 2-grams to push the dictionary past
    // several width boundaries (9 → 10 → 11 bits)
    val (w, h) = (64, 48)
    val pix = Array.tabulate(w * h)(i =>
      ((i % w) * 31 + (i / w) * 17 + (i * i) % 97) % 256)
    val gif = buildGif(w, h, 8, Array.tabulate(256)(identity),
      lzwEncode(8, pix))
    val img = Multimodal.decodeGifGray(gif)
      .getOrElse(fail("hand-encoded GIF did not decode"))
    assert(img.length == h && img(0).length == w)
    for (y <- 0 until h; x <- 0 until w)
      assert(img(y)(x) == pix(y * w + x),
        s"pixel ($x,$y): ${img(y)(x)} != ${pix(y * w + x)}")
  }

  test("gif gray: KwKwK (code == next free slot) decodes per the " +
    "spec's special case — the run-of-equal-pixels shape") {
    // pixels aaa: encoder emits CLEAR, a, <dictSize> — the code that
    // does not exist yet when the decoder reads it
    val pix = Array(7, 7, 7)
    val gif = buildGif(3, 1, 4, Array.tabulate(16)(i => i * 17),
      lzwEncode(4, pix))
    val img = Multimodal.decodeGifGray(gif)
      .getOrElse(fail("KwKwK GIF did not decode"))
    assert(img(0).toSeq == Seq(119, 119, 119)) // palette 7·17
  }

  test("gif gray: a permuted palette is looked up (index != gray), " +
    "and the 4-pass interlace row order is unscrambled") {
    val (w, h) = (11, 13) // non-multiples exercise ragged passes
    val pal = Array.tabulate(64)(i => (i * 11) % 256)
    val pix = Array.tabulate(w * h)(i => (i * 5 + i / w) % 64)
    val plain = buildGif(w, h, 6, pal, lzwEncode(6, pix))
    // interlaced: same image, rows EMITTED in pass order
    val order = (0 until h by 8) ++ (4 until h by 8) ++
      (2 until h by 4) ++ (1 until h by 2)
    val ipix = order.toArray.flatMap(r =>
      (0 until w).map(c => pix(r * w + c)))
    val inter = buildGif(w, h, 6, pal, lzwEncode(6, ipix),
      interlaced = true)
    val a = Multimodal.decodeGifGray(plain)
      .getOrElse(fail("plain GIF did not decode"))
    val b = Multimodal.decodeGifGray(inter)
      .getOrElse(fail("interlaced GIF did not decode"))
    for (y <- 0 until h; x <- 0 until w) {
      assert(a(y)(x) == pal(pix(y * w + x)), s"palette lookup ($x,$y)")
      assert(b(y)(x) == a(y)(x), s"interlace scatter ($x,$y)")
    }
  }

  test("gif gray: decodes the JDK ImageIO encoder's output (real " +
    "LZW compression) to exact grays") {
    import java.awt.image.{BufferedImage, IndexColorModel}
    val (w, h) = (37, 23)
    val grays = Array.tabulate(256)(i => ((i * 7) % 256).toByte)
    val icm = new IndexColorModel(8, 256, grays, grays, grays)
    val bi = new BufferedImage(w, h,
      BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, (x * 5 + y * 11) % 256)
    val baos = new java.io.ByteArrayOutputStream
    javax.imageio.ImageIO.write(bi, "gif", baos)
    val bytes = baos.toByteArray
    val img = Multimodal.decodeGifGray(bytes)
      .getOrElse(fail("ImageIO GIF did not decode"))
    assert(img.length == h && img(0).length == w)
    for (y <- 0 until h; x <- 0 until w) {
      val expected = ((x * 5 + y * 11) % 256 * 7) % 256
      assert(img(y)(x) == expected,
        s"pixel ($x,$y): ${img(y)(x)} != $expected")
    }
  }

  test("gif gray: a graphic-control extension (89a) is skipped by its " +
    "framing, and a local color table shadows the global one") {
    val pal = Array.tabulate(16)(i => i * 17)
    val revPal = pal.reverse
    val pix = Array.tabulate(12)(i => i % 16)
    // global table REVERSED, local straight: correct decode must read
    // the local one
    val base = buildGif(4, 3, 4, revPal, lzwEncode(4, pix))
    val out = new java.io.ByteArrayOutputStream()
    // splice: header+LSD+GCT (13 + 48 bytes), then a GCE, then the
    // image descriptor with the LCT flag + the straight table
    out.write(base, 0, 13 + 48)
    out.write(Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)) // GCE
    out.write(Array[Byte](0x2c, 0, 0, 0, 0, 4, 0, 3, 0,
      (0x80 | 3).toByte)) // LCT flag, 16 entries
    pal.foreach { g => out.write(g); out.write(g); out.write(g) }
    // the LZW payload from the base fixture (mcs byte onward)
    out.write(base, 13 + 48 + 10, base.length - (13 + 48 + 10))
    val img = Multimodal.decodeGifGray(out.toByteArray)
      .getOrElse(fail("89a-style GIF with GCE+LCT did not decode"))
    for (y <- 0 until 3; x <- 0 until 4)
      assert(img(y)(x) == pal(pix(y * 4 + x)),
        s"LCT shadowing broken at ($x,$y): ${img(y)(x)}")
  }

  test("gif frames: a hand-built two-frame 89a animation walks to " +
    "both frames — GCE delays bind to the NEXT frame, placement and " +
    "per-frame pixels decode independently") {
    val pal = Array.tabulate(16)(i => i * 17)
    val f0 = Array.tabulate(6)(i => (i * 3) % 16)     // 3×2 at (0,0)
    val f1 = Array.tabulate(4)(i => (i * 5 + 1) % 16) // 2×2 at (4,1)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(Array[Byte](8, 0, 6, 0, (0x80 | 0x70 | 3).toByte, 0, 0))
    pal.foreach { g => out.write(g); out.write(g); out.write(g) }
    def frame(px: Array[Int], left: Int, top: Int, w: Int, h: Int,
              delay: Option[Int]): Unit = {
      delay.foreach { dl =>
        out.write(Array[Byte](0x21, 0xf9.toByte, 4, 0,
          (dl & 0xff).toByte, (dl >> 8).toByte, 0, 0))
      }
      out.write(0x2c)
      out.write(Array[Byte]((left & 0xff).toByte, 0, (top & 0xff).toByte,
        0, (w & 0xff).toByte, 0, (h & 0xff).toByte, 0, 0))
      out.write(4) // min code size
      val lzw = lzwEncode(4, px)
      out.write(lzw.length); out.write(lzw, 0, lzw.length); out.write(0)
    }
    frame(f0, 0, 0, 3, 2, None)      // no GCE → null delay
    frame(f1, 4, 1, 2, 2, Some(37))
    out.write(0x3b)
    val anim = Multimodal.decodeGifFrames(out.toByteArray)
      .getOrElse(fail("two-frame GIF did not walk"))
    assert(anim.screen_w == 8 && anim.screen_h == 6)
    assert(anim.frames.length == 2)
    val Seq(a, b) = anim.frames
    assert(a == Multimodal.GifFrame(0, 0, 0, 3, 2, None,
      f0.map(i => pal(i).toLong).sum), s"frame 0: $a")
    assert(b == Multimodal.GifFrame(1, 4, 1, 2, 2, Some(37),
      f1.map(i => pal(i).toLong).sum), s"frame 1: $b")
    // the single-frame gray kernel still reads ONLY the poster frame
    val poster = Multimodal.decodeGifGray(out.toByteArray)
      .getOrElse(fail("poster frame did not decode"))
    assert(poster.length == 2 && poster(0).length == 3)
    assert(poster(0)(0) == pal(f0(0)))
  }

  test("tiff gray: the II seed fixture decodes to its ramp exactly, " +
    "and a WhiteIsZero twin with inverted samples decodes EQUAL") {
    val (w, h) = (9, 8)
    val seed = fixtures(7)
    val img = Multimodal.decodeTiffGray(seed)
      .getOrElse(fail("II TIFF seed did not decode"))
    for (y <- 0 until h; x <- 0 until w)
      assert(img(y)(x) == (x * 29 + y * 53) % 256, s"pixel ($x,$y)")
    // flip photometric to 0 and invert the strip: same image
    val inv = seed.clone()
    // photometric entry is the 5th (offset: 8+72+2 + 4*12 + 8)
    val pOff = 8 + w * h + 2 + 4 * 12 + 8
    assert(inv(pOff - 8) == 6.toByte) // tag 262 low byte sanity (II)
    inv(pOff) = 0
    for (i <- 0 until w * h)
      inv(8 + i) = (255 - (inv(8 + i) & 0xff)).toByte
    val img2 = Multimodal.decodeTiffGray(inv)
      .getOrElse(fail("WhiteIsZero TIFF did not decode"))
    for (y <- 0 until h; x <- 0 until w)
      assert(img2(y)(x) == img(y)(x), s"invert roundtrip ($x,$y)")
  }

  test("tiff gray: decodes the JDK ImageIO TIFF writer's uncompressed " +
    "gray output (real-world IFD: extra tags, its own strip layout)") {
    import java.awt.image.BufferedImage
    val (w, h) = (33, 21)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, (x * 13 + y * 29 + 7) % 256)
    // the default TIFF write param is UNCOMPRESSED (the plugin's
    // explicit types are all real codecs; "no compression" is the
    // absence of one)
    val baos = new java.io.ByteArrayOutputStream
    javax.imageio.ImageIO.write(bi, "tiff", baos)
    val img = Multimodal.decodeTiffGray(baos.toByteArray)
      .getOrElse(fail("ImageIO TIFF did not decode"))
    assert(img.length == h && img(0).length == w)
    for (y <- 0 until h; x <- 0 until w)
      assert(img(y)(x) == (x * 13 + y * 29 + 7) % 256,
        s"pixel ($x,$y): ${img(y)(x)}")
  }

  test("tiff gray: decodes the JDK ImageIO TIFF writer's RGB output " +
    "(SamplesPerPixel 3) via the channel average") {
    import java.awt.image.BufferedImage
    val (w, h) = (19, 12)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 11 + y * 31 + 3) % 256
      bi.setRGB(x, y, (v << 16) | (((v + 2) % 256) << 8) | ((v + 4) % 256))
    }
    // the default TIFF write param is UNCOMPRESSED (the plugin's
    // explicit types are all real codecs; "no compression" is the
    // absence of one)
    val baos = new java.io.ByteArrayOutputStream
    javax.imageio.ImageIO.write(bi, "tiff", baos)
    val img = Multimodal.decodeTiffGray(baos.toByteArray)
      .getOrElse(fail("ImageIO RGB TIFF did not decode"))
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 11 + y * 31 + 3) % 256
      val expected = (v + (v + 2) % 256 + (v + 4) % 256) / 3
      assert(img(y)(x) == expected,
        s"pixel ($x,$y): ${img(y)(x)} != $expected")
    }
  }

  test("jpeg exif: decodes a BIG-ENDIAN (MM) TIFF with an offset " +
    "model string and inline orientation — the classic-camera byte " +
    "order the fixtures' II variant never exercises") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // APP1: MM TIFF, IFD0 @8 with Orientation (inline SHORT, 6) and
    // Model ("NikonX\0" 7 bytes @ offset 38); minimal SOF/SOS absent —
    // the walker returns at APP1, so nothing more is needed
    val app1 =
      "4D4D002A00000008" + // "MM", 42, IFD0 at 8
      "0002" +             // 2 entries
      "0110" + "0002" + "00000007" + "00000026" + // Model @ 0x26=38
      "0112" + "0003" + "00000001" + "00060000" + // Orientation = 6
      "00000000" +
      "4E696B6F6E5800"     // "NikonX\0"
    val payload = "457869660000" + app1
    val len = payload.length / 2 + 2
    val bytes = hx("FFD8" + "FFE1" + "%04X".format(len) + payload +
      "FFD9")
    val m = Multimodal.decodeJpegExif(bytes)
      .getOrElse(fail("MM-order Exif did not decode"))
    assert(m.orientation.contains(6), s"orientation: ${m.orientation}")
    assert(m.model.contains("NikonX"), s"model: ${m.model}")
    assert(m.datetime.isEmpty, "datetime invented from nothing")
    // and a stream with no APP1 at all yields None, not a sentinel
    assert(Multimodal.decodeJpegExif(jpegScan).isEmpty)
  }

  test("exif orientation normalization: all eight values permute an " +
    "asymmetric matrix exactly per spec, and the rotation pairs " +
    "invert each other") {
    val m = Array(Array(1, 2, 3), Array(4, 5, 6)) // 2x3, no symmetry
    def n(o: Int) = Multimodal.normalizeOrientation(m, o).map(_.toSeq).toSeq
    assert(n(1) == Seq(Seq(1, 2, 3), Seq(4, 5, 6)))
    assert(n(2) == Seq(Seq(3, 2, 1), Seq(6, 5, 4)), "mirror H")
    assert(n(3) == Seq(Seq(6, 5, 4), Seq(3, 2, 1)), "rot180")
    assert(n(4) == Seq(Seq(4, 5, 6), Seq(1, 2, 3)), "mirror V")
    assert(n(5) == Seq(Seq(1, 4), Seq(2, 5), Seq(3, 6)), "transpose")
    assert(n(6) == Seq(Seq(4, 1), Seq(5, 2), Seq(6, 3)), "rot90 CW")
    assert(n(7) == Seq(Seq(6, 3), Seq(5, 2), Seq(4, 1)), "transverse")
    assert(n(8) == Seq(Seq(3, 6), Seq(2, 5), Seq(1, 4)), "rot90 CCW")
    // the fixture contract: a camera stores CCW(base) + tag 6 (or
    // CW(base) + tag 8) and normalization recovers base exactly
    def eq(a: Array[Array[Int]]) = a.map(_.toSeq).toSeq
    assert(eq(Multimodal.normalizeOrientation(
      Multimodal.normalizeOrientation(m, 8), 6)) == eq(m))
    assert(eq(Multimodal.normalizeOrientation(
      Multimodal.normalizeOrientation(m, 6), 8)) == eq(m))
    // no EXIF → identity print: oriented hash equals the raw hash
    assert(Multimodal.orientedImageDHash(jpegScan) ==
      Multimodal.imageDHash(jpegScan))
  }

  test("random bytes never throw in any decoder") {
    val rng = new scala.util.Random(0xBADC0DE)
    for (_ <- 0 until 400; (name, dec) <- decoders) {
      val len = rng.nextInt(200)
      val bytes = Array.fill(len)(rng.nextInt().toByte)
      try dec(bytes)
      catch { case e: Throwable =>
        fail(s"$name threw on random input (len $len): $e")
      }
    }
  }

  test("every truncation prefix of a valid container decodes or " +
    "rejects — never throws (the range-request read path)") {
    for (fx <- fixtures; cut <- 0 to fx.length; (name, dec) <- decoders) {
      try dec(fx.take(cut))
      catch { case e: Throwable =>
        fail(s"$name threw on a $cut-byte prefix: $e")
      }
    }
  }

  test("single-byte mutations of valid containers never throw") {
    val rng = new scala.util.Random(0x5EED)
    for (fx <- fixtures; _ <- 0 until 150; (name, dec) <- decoders) {
      val m = fx.clone()
      m(rng.nextInt(m.length)) = rng.nextInt().toByte
      try dec(m)
      catch { case e: Throwable =>
        fail(s"$name threw on a mutated container: $e")
      }
    }
  }

  test("adversarial declared sizes: huge/negative chunk and box sizes " +
    "end the walk cleanly") {
    def patchInt(fx: Array[Byte], off: Int, value: Int,
                 le: Boolean = true): Array[Byte] = {
      val m = fx.clone()
      val bb = java.nio.ByteBuffer.allocate(4)
        .order(if (le) java.nio.ByteOrder.LITTLE_ENDIAN
        else java.nio.ByteOrder.BIG_ENDIAN)
      bb.putInt(value)
      bb.array().copyToArray(m, off)
      m
    }
    val Seq(wav, bmp, _*) = fixtures
    for (v <- Seq(Int.MaxValue, Int.MinValue, -1, 0)) {
      // RIFF chunk-size fields (fmt at 16, data at 40)
      Multimodal.decodeWavSamples(patchInt(wav, 16, v))
      Multimodal.decodeWavSamples(patchInt(wav, 40, v))
      Multimodal.decodeAviMjpeg(patchInt(wav, 4, v))
      // BMP pixel-data offset and dims
      Multimodal.decodeBmpGray(patchInt(bmp, 10, v))
      Multimodal.decodeBmpGray(patchInt(bmp, 18, v))
      Multimodal.decodeBmpGray(patchInt(bmp, 22, v))
    }
    succeed // reaching here means no decoder threw
  }
}
