package graft.multimodal

/** Minimal pure-JVM Y4M (YUV4MPEG2) codec — the video counterpart of
  * [[Ppm]]/[[Wav]]: a real video container (public mjpegtools spec,
  * the interchange format of ffmpeg/x264 toolchains) with an ASCII
  * stream header and raw uncompressed frames, so video-frame operations
  * run bytes-in/frames-out end-to-end without native libraries.
  *
  * Supports C420 (default, 4:2:0 — frame size w·h·3/2) and Cmono
  * (w·h). Stream header: `YUV4MPEG2 W<w> H<h> F<n>:<d> ...\n`; each
  * frame: `FRAME<params>\n` + raw planes.
  */
object Y4m {

  final case class Video(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      mono: Boolean, frames: Vector[Array[Byte]])

  private def frameSize(w: Int, h: Int, mono: Boolean): Int =
    if (mono) w * h else w * h * 3 / 2

  /** Encode frames (each a full plane buffer of `frameSize` bytes). */
  def encode(v: Video): Array[Byte] = {
    val cs = if (v.mono) "Cmono" else "C420"
    val header =
      s"YUV4MPEG2 W${v.width} H${v.height} F${v.fpsNum}:${v.fpsDen} Ip A1:1 $cs\n"
        .getBytes("US-ASCII")
    val fm = "FRAME\n".getBytes("US-ASCII")
    val fs = frameSize(v.width, v.height, v.mono)
    v.frames.foreach(f => require(f.length == fs, s"frame ${f.length} != $fs"))
    val buf = new java.io.ByteArrayOutputStream(
      header.length + v.frames.size * (fm.length + fs))
    buf.write(header)
    v.frames.foreach { f => buf.write(fm); buf.write(f) }
    buf.toByteArray
  }

  /** Decode a YUV4MPEG2 stream. Unknown header/frame parameters are
    * skipped per the spec; throws on bad magic, missing W/H, or a
    * truncated frame. */
  def decode(bytes: Array[Byte]): Video = {
    val nl = bytes.indexOf('\n'.toByte)
    require(nl > 0, "no stream header")
    val header = new String(bytes, 0, nl, "US-ASCII")
    require(header.startsWith("YUV4MPEG2"), "not a YUV4MPEG2 stream")
    var w = -1; var h = -1; var fn = 25; var fd = 1; var mono = false
    header.split(' ').drop(1).filter(_.nonEmpty).foreach { p =>
      p.head match {
        case 'W' => w = p.tail.toInt
        case 'H' => h = p.tail.toInt
        case 'F' =>
          val Array(a, b) = p.tail.split(':'); fn = a.toInt; fd = b.toInt
        case 'C' => mono = p.tail.startsWith("mono")
        case _ => // Ip, A1:1, X...: skipped
      }
    }
    require(w > 0 && h > 0, "missing W/H in stream header")
    val fs = frameSize(w, h, mono)
    var i = nl + 1
    val frames = Vector.newBuilder[Array[Byte]]
    while (i < bytes.length) {
      val fnl = bytes.indexOf('\n'.toByte, i)
      require(fnl > 0 &&
        new String(bytes, i, math.min(5, fnl - i), "US-ASCII") == "FRAME",
        "expected FRAME marker")
      require(bytes.length - (fnl + 1) >= fs, "truncated frame")
      val f = new Array[Byte](fs)
      System.arraycopy(bytes, fnl + 1, f, 0, fs)
      frames += f
      i = fnl + 1 + fs
    }
    Video(w, h, fn, fd, mono, frames.result())
  }

  /** Byte offset of each frame's RASTER within the stream — a real walk
    * of the container (header line, then per-frame FRAME markers, plane
    * strides from the parsed geometry) without materializing any plane.
    * This is the index a seek-based frame reader needs: task i reads only
    * `[offset_i, offset_i + frameSize)`. One offset per frame, stream
    * order; validates magic/markers/geometry like [[decode]]. */
  def frameOffsets(bytes: Array[Byte]): Vector[Long] = {
    val nl = bytes.indexOf('\n'.toByte)
    require(nl > 0, "no stream header")
    val header = new String(bytes, 0, nl, "US-ASCII")
    require(header.startsWith("YUV4MPEG2"), "not a YUV4MPEG2 stream")
    var w = -1; var h = -1; var mono = false
    header.split(' ').drop(1).filter(_.nonEmpty).foreach { p =>
      p.head match {
        case 'W' => w = p.tail.toInt
        case 'H' => h = p.tail.toInt
        case 'C' => mono = p.tail.startsWith("mono")
        case _ => // F, Ip, A1:1, X...: irrelevant to offsets
      }
    }
    require(w > 0 && h > 0, "missing W/H in stream header")
    val fs = frameSize(w, h, mono)
    var i = nl + 1
    val out = Vector.newBuilder[Long]
    while (i < bytes.length) {
      val fnl = bytes.indexOf('\n'.toByte, i)
      require(fnl > 0 &&
        new String(bytes, i, math.min(5, fnl - i), "US-ASCII") == "FRAME",
        "expected FRAME marker")
      require(bytes.length - (fnl + 1) >= fs, "truncated frame")
      out += (fnl + 1).toLong
      i = fnl + 1 + fs
    }
    out.result()
  }

  /** Keep every `stride`-th frame (temporal subsampling — the real
    * version of frame sampling for training pipelines). */
  def sampleFrames(v: Video, stride: Int): Video = {
    require(stride >= 1)
    v.copy(frames = v.frames.zipWithIndex.collect {
      case (f, i) if i % stride == 0 => f
    })
  }
}
