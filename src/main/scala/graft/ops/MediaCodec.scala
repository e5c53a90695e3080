package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Pure-JVM media codecs for the multimodal pipeline — no native
  * libraries: PPM (P6) has a hand-rolled parser/encoder, PNG/JPEG/BMP/GIF
  * decode through `javax.imageio` (built into every JRE, headless-safe),
  * WAV (RIFF/PCM) has a hand-rolled header parser plus an encoder for
  * fixtures. These are the real payloads behind [[Multimodal]]'s
  * partition-local batch shape; the reference has no media pipeline — the
  * operator set follows the LLM-training-data brief, with the binary
  * payload contract of `flink-cdc-common`'s BINARY/VARBINARY columns
  * (types/DataTypeRoot.java).
  */
object MediaCodec {

  /** Decoded raster: interleaved RGB bytes, row-major, no padding. */
  final case class Image(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]) {
    /** Per-channel pixel-value sum — integer-exact decode evidence. */
    def channelSums: Array[Long] = {
      val sums = new Array[Long](channels)
      var i = 0
      while (i < pixels.length) {
        sums(i % channels) += (pixels(i) & 0xFF)
        i += 1
      }
      sums
    }
  }

  /** Decoded PCM audio header + samples-as-read. */
  final case class Audio(channels: Int, sampleRate: Int, bitsPerSample: Int,
      numFrames: Long) {
    def durationMs: Long =
      if (sampleRate == 0) 0L else numFrames * 1000L / sampleRate
  }

  // ------------------------------------------------------------------
  // PPM (P6): ASCII header "P6\n<w> <h>\n255\n" + raw interleaved RGB
  // ------------------------------------------------------------------

  def encodePpm(img: Image): Array[Byte] = {
    require(img.channels == 3, "PPM is RGB")
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  def decodePpm(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < 11 ||
      bytes(0) != 'P' || bytes(1) != '6') return None
    // header tokens: magic, width, height, maxval; '#' comments allowed
    var pos = 2
    def nextToken(): Option[String] = {
      while (pos < bytes.length &&
        (bytes(pos) == ' ' || bytes(pos) == '\n' || bytes(pos) == '\r' ||
          bytes(pos) == '\t' || bytes(pos) == '#')) {
        if (bytes(pos) == '#') { // comment to end of line
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else pos += 1
      }
      if (pos >= bytes.length) return None
      val start = pos
      while (pos < bytes.length && !Character.isWhitespace(bytes(pos).toChar)) pos += 1
      Some(new String(bytes, start, pos - start, "US-ASCII"))
    }
    try {
      val w = nextToken().map(_.toInt).getOrElse(return None)
      val h = nextToken().map(_.toInt).getOrElse(return None)
      val maxval = nextToken().map(_.toInt).getOrElse(return None)
      if (w <= 0 || h <= 0 || maxval != 255) return None
      pos += 1 // single whitespace after maxval, then raster
      // long arithmetic: a crafted header whose w*h*3 wraps Int would
      // otherwise pass the length guard with an undersized pixel array
      val need = w.toLong * h * 3
      if (need > bytes.length - pos) return None
      val px = new Array[Byte](need.toInt)
      System.arraycopy(bytes, pos, px, 0, need.toInt)
      Some(Image(w, h, 3, px))
    } catch { case _: NumberFormatException => None }
  }

  // ------------------------------------------------------------------
  // BMP: 24-bit uncompressed, BITMAPINFOHEADER — encoder for fixtures
  // (decode goes through ImageIO, an independent implementation, so a
  // row-padding or bottom-up bug in either side breaks the q76 gate)
  // ------------------------------------------------------------------

  def encodeBmp(img: Image): Array[Byte] = {
    require(img.channels == 3, "BMP fixture is RGB")
    val rowSize = (img.width * 3 + 3) / 4 * 4 // rows pad to 4 bytes
    val dataSize = rowSize * img.height
    val fileSize = 54 + dataSize
    val b = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54) // reserved, pixel offset
    b.putInt(40).putInt(img.width).putInt(img.height) // positive = bottom-up
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    val row = new Array[Byte](rowSize)
    var y = img.height - 1 // bottom-up storage
    while (y >= 0) {
      java.util.Arrays.fill(row, 0.toByte)
      var x = 0
      while (x < img.width) {
        val src = (y * img.width + x) * 3
        row(x * 3) = img.pixels(src + 2) // BGR order
        row(x * 3 + 1) = img.pixels(src + 1)
        row(x * 3 + 2) = img.pixels(src)
        x += 1
      }
      b.put(row)
      y -= 1
    }
    b.array()
  }

  // ------------------------------------------------------------------
  // General image decode: PPM via the parser above, PNG/JPEG/BMP/GIF via
  // javax.imageio (pure JVM, headless)
  // ------------------------------------------------------------------

  def decodeImage(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < 4) return None
    // the PPM parse is also exception-guarded: an undecodable blob must
    // flow through as None, never crash the task (module contract)
    (try decodePpm(bytes) catch { case _: Exception => None }).orElse {
      try {
        val buf = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
        if (buf == null) None
        else {
          val (w, h) = (buf.getWidth, buf.getHeight)
          val px = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = buf.getRGB(x, y)
              val dst = (y * w + x) * 3
              px(dst) = ((rgb >> 16) & 0xFF).toByte
              px(dst + 1) = ((rgb >> 8) & 0xFF).toByte
              px(dst + 2) = (rgb & 0xFF).toByte
              x += 1
            }
            y += 1
          }
          Some(Image(w, h, 3, px))
        }
      } catch { case _: Exception => None }
    }
  }

  /** Nearest-neighbor resize of a decoded raster — the real resample
    * behind [[Multimodal.resize]]; nearest (not bilinear) keeps byte
    * values exactly reproducible for the spec oracle.
    */
  def resizeImage(img: Image, newW: Int, newH: Int): Image = {
    require(newW > 0 && newH > 0, s"bad target ${newW}x$newH")
    val out = new Array[Byte](newW * newH * img.channels)
    var y = 0
    while (y < newH) {
      val sy = math.min(img.height - 1, y * img.height / newH)
      var x = 0
      while (x < newW) {
        val sx = math.min(img.width - 1, x * img.width / newW)
        var c = 0
        while (c < img.channels) {
          out((y * newW + x) * img.channels + c) =
            img.pixels((sy * img.width + sx) * img.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Image(newW, newH, img.channels, out)
  }

  // ------------------------------------------------------------------
  // WAV (RIFF / PCM): hand-rolled chunk walk — javax.sound would also
  // work, but the parser doubles as documentation of the byte layout
  // ------------------------------------------------------------------

  def encodeWav(channels: Int, sampleRate: Int, bitsPerSample: Int,
      samples: Array[Short]): Array[Byte] = {
    require(bitsPerSample == 16, "fixture encoder is 16-bit PCM")
    val dataSize = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * bitsPerSample / 8)
      .putShort((channels * bitsPerSample / 8).toShort)
      .putShort(bitsPerSample.toShort)
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(b.putShort)
    b.array()
  }

  def decodeWav(bytes: Array[Byte]): Option[Audio] = try {
    if (bytes == null || bytes.length < 44) return None
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val riff = new Array[Byte](4); b.get(riff)
    if (new String(riff, "US-ASCII") != "RIFF") return None
    b.getInt // file size
    val wave = new Array[Byte](4); b.get(wave)
    if (new String(wave, "US-ASCII") != "WAVE") return None
    var channels = 0; var sampleRate = 0; var bits = 0; var dataLen = -1L
    // chunk walk: fmt and data may be in any order, with strangers
    // between — keep walking until BOTH are seen (a data-before-fmt file
    // is valid RIFF); the whole parse is exception-guarded so truncated
    // or lying chunk sizes surface as None, never a task crash
    while (b.remaining() >= 8 && (dataLen < 0 || bits == 0)) {
      val id = new Array[Byte](4); b.get(id)
      val size = b.getInt
      new String(id, "US-ASCII") match {
        case "fmt " =>
          val fmtStart = b.position()
          val audioFormat = b.getShort
          if (audioFormat != 1) return None // PCM only
          channels = b.getShort
          sampleRate = b.getInt
          b.getInt; b.getShort // byte rate, block align
          bits = b.getShort
          b.position(fmtStart + size + (size & 1))
        case "data" =>
          dataLen = size.toLong & 0xFFFFFFFFL
          // a data size past the bytes actually present is truncated or
          // lying — reject like the stranger-chunk branch (the trailing
          // pad byte alone may be absent at EOF, so compare the payload)
          if (dataLen > b.remaining()) return None
          // skip the payload to keep walking for a trailing fmt
          val skip = math.min(dataLen + (dataLen & 1), b.remaining().toLong)
          b.position(b.position() + skip.toInt)
        case _ =>
          if (size < 0 || b.remaining() < size) return None
          b.position(b.position() + size + (size & 1))
      }
    }
    val frameBytes = channels * bits / 8
    if (channels <= 0 || bits <= 0 || frameBytes == 0 || dataLen < 0) None
    else Some(Audio(channels, sampleRate, bits, dataLen / frameBytes))
  } catch { case _: Exception => None }

  /** Re-encode a raster as PNG through ImageIO — the real "transcode"
    * payload for resize outputs.
    */
  def encodePng(img: Image): Array[Byte] = {
    val buf = new java.awt.image.BufferedImage(
      img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val src = (y * img.width + x) * 3
        buf.setRGB(x, y,
          ((img.pixels(src) & 0xFF) << 16) |
            ((img.pixels(src + 1) & 0xFF) << 8) |
            (img.pixels(src + 2) & 0xFF))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(buf, "png", out)
    out.toByteArray
  }
}
