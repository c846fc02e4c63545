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
    "mp4 header" -> Multimodal.decodeMp4Header _,
    "avi mjpeg" -> Multimodal.decodeAviMjpeg _,
    "bmp dhash" -> Multimodal.bmpDHash _,
    "wav phash" -> Multimodal.wavPhash _)

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
    Seq(wav, bmp, png, jpeg)
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
    val Seq(wav, bmp, _, _) = fixtures
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
