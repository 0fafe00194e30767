package graft.multimodal

/** Minimal pure-JVM PPM (P6) codec — a real raster format (netpbm,
  * public spec) that needs no native libraries, so the multimodal decode
  * path can be exercised END-TO-END with actual bytes-in/pixels-out
  * semantics rather than a stub. The container ships no JPEG/PNG codecs;
  * P6 is the honest real-format stand-in: binary header + raw RGB24.
  *
  * Format: `P6<ws>width<ws>height<ws>maxval<single-ws>` then
  * `width*height*3` raw bytes. `#` comments in the header are skipped,
  * per the spec.
  */
object Ppm {

  /** Encode an RGB24 pixel buffer (row-major, 3 bytes per pixel). */
  def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3,
      s"pixel buffer ${rgb.length} != $w x $h x 3")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Decode a P6 image: (width, height, rgb bytes). Throws on anything
    * that is not a well-formed P6 (magic, maxval > 255, truncated data). */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a P6 PPM (bad magic)")
    var i = 2
    def skipWs(): Unit = {
      var in = true
      while (in && i < bytes.length) {
        val c = bytes(i)
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
        else in = false
      }
    }
    def int(): Int = {
      skipWs()
      var v = 0
      require(i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9',
        "malformed PPM header")
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1
      }
      v
    }
    val w = int(); val h = int(); val maxval = int()
    require(maxval > 0 && maxval < 256, s"unsupported maxval $maxval")
    i += 1 // exactly one whitespace byte before the raster, per spec
    val n = w * h * 3
    require(bytes.length - i >= n, s"truncated raster: ${bytes.length - i} < $n")
    val rgb = new Array[Byte](n)
    System.arraycopy(bytes, i, rgb, 0, n)
    (w, h, rgb)
  }

  /** Nearest-neighbor resize: target pixel (tx, ty) samples source pixel
    * (tx*w/tw, ty*h/th) — integer arithmetic, so independently
    * re-derivable by an oracle. */
  def resize(w: Int, h: Int, rgb: Array[Byte], tw: Int, th: Int): Array[Byte] = {
    val out = new Array[Byte](tw * th * 3)
    var ty = 0
    while (ty < th) {
      val sy = ty * h / th
      var tx = 0
      while (tx < tw) {
        val sx = tx * w / tw
        val s = (sy * w + sx) * 3
        val d = (ty * tw + tx) * 3
        out(d) = rgb(s); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s + 2)
        tx += 1
      }
      ty += 1
    }
    out
  }
}
