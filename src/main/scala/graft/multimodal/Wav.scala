package graft.multimodal

/** Minimal pure-JVM WAV (RIFF/PCM16) codec — the audio counterpart of
  * [[Ppm]]: a real container format (public RIFF/WAVE spec) parsed from
  * actual bytes, so the audio path of the multimodal suite runs
  * bytes-in/samples-out end-to-end without native libraries.
  *
  * Supports the canonical mono/stereo PCM16 little-endian layout:
  * `RIFF<size>WAVE` + `fmt ` chunk (PCM, 16-bit) + `data` chunk; other
  * chunks (LIST, fact, …) are skipped per the spec.
  */
object Wav {

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Encode PCM16 samples (interleaved if stereo) to a WAV byte stream. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(channels == 1 || channels == 2, s"channels $channels")
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16) // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }

  /** Decode: (sampleRate, channels, samples). Skips non-fmt/data chunks;
    * throws on non-PCM16 or malformed streams. */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Short]) = {
    require(bytes.length >= 44 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE stream")
    var i = 12
    var rate = -1; var channels = -1
    var samples: Array[Short] = null
    while (i + 8 <= bytes.length && (samples == null || rate < 0)) {
      val id = new String(bytes, i, 4, "US-ASCII")
      val sz = le32(bytes, i + 4)
      require(sz >= 0 && i + 8 + sz <= bytes.length, s"truncated chunk $id")
      id match {
        case "fmt " =>
          require(le16(bytes, i + 8) == 1, "only PCM supported")
          channels = le16(bytes, i + 10)
          rate = le32(bytes, i + 12)
          require(le16(bytes, i + 22) == 16, "only 16-bit supported")
        case "data" =>
          samples = new Array[Short](sz / 2)
          var j = 0
          while (j < samples.length) {
            samples(j) = le16(bytes, i + 8 + j * 2).toShort; j += 1
          }
        case _ => // LIST/fact/...: skip
      }
      i += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    require(rate > 0 && channels > 0, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    (rate, channels, samples)
  }

  /** Integer-ratio downsample by decimation (every `factor`-th frame) —
    * the deterministic resample an oracle can re-derive; a production
    * resampler (polyphase filter) drops into the same shape. */
  def decimate(samples: Array[Short], channels: Int, factor: Int): Array[Short] = {
    require(factor >= 1)
    val frames = samples.length / channels
    val outFrames = (frames + factor - 1) / factor
    val out = new Array[Short](outFrames * channels)
    var f = 0
    while (f < outFrames) {
      var c = 0
      while (c < channels) {
        out(f * channels + c) = samples(f * factor * channels + c); c += 1
      }
      f += 1
    }
    out
  }
}
