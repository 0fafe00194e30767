package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Assets are opaque `binary` columns + typed metadata — the layout that
  * scales: parquet stores the bytes column-compressed, predicate pushdown
  * prunes on the metadata columns without touching the blobs, and decode
  * runs per-partition next to the data (never on the driver).
  *
  * All decode/inspect/resize/sample paths run on REAL bytes through
  * pure-JVM codecs for real public formats — PPM/P6 ([[Ppm]]), RIFF/PCM16
  * WAV ([[Wav]]), YUV4MPEG2 ([[Y4m]]) — oracle-checked against
  * independent arithmetic integrations of the generation laws (m69/m70,
  * m94–m98). The container ships no JPEG/MP3/H.264 codecs; these formats
  * are the honest real-format stand-ins, and everything around them — the
  * asset schema, the mapPartitions batch shape, the per-partition
  * iterator contract (setup once per partition, stream rows, no
  * materialization) — is the production plumbing any codec drops into.
  * The one remaining deterministic stand-in is [[featureExtractStub]]
  * (an embedding MODEL, not a codec — no pure-JVM implementation can be
  * "the real thing"); it is clearly marked.
  */
object Multimodal {

  /** Wrap a text/blob column as a binary asset table: (asset_id, content).
    * In production `content` arrives as real bytes from parquet/tar
    * shards; here it's the UTF-8 encoding of a text column. */
  def asAssets(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("asset_id"),
      col(payloadCol).cast("binary").as("content"))

  /** REAL asset inspection — the "what is this file" metadata pass an
    * ingest runs before committing to full decode: dimensions parsed from
    * the ACTUAL P6 header bytes (magic validated, raster length checked),
    * plus raw byte length and the leading bytes hex-encoded for format
    * forensics. Same per-partition streamed-iterator contract as
    * [[decodePpm]]: codec state initializes once per partition, rows
    * stream through, constant memory, scan-stage, no shuffle. */
  def inspectPpm(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets.select("asset_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (w, h, _) = Ppm.decode(bytes) // parse + validate real bytes
          val header = bytes.take(8).map(b => f"${b & 0xff}%02x").mkString
          (id, bytes.length, header, w, h, 3)
        }
      }
      .toDF("asset_id", "byte_len", "header_hex", "width", "height",
        "channels")
  }

  /** REAL frame sampling by SEEK OFFSET: walk the actual Y4M container
    * ([[Y4m.frameOffsets]] — header line, FRAME markers, plane strides),
    * keep every `stride`-th frame, one output row per kept frame with its
    * original index and its raster's byte offset in the stream. This is
    * the index a video pipeline materializes so downstream decode tasks
    * read ONLY their frames' byte ranges — the fan-out shape of
    * [[sampleVideoFrames]] without touching pixel data (1 asset row → N
    * frame rows, all inside one task). */
  def frameByteOffsets(spark: SparkSession, assets: DataFrame,
      stride: Int): DataFrame = {
    import spark.implicits._
    require(stride >= 1)
    assets.select("asset_id", "content").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        Y4m.frameOffsets(bytes).zipWithIndex.collect {
          case (off, i) if i % stride == 0 => (id, i.toLong, off)
        }
      }
      .toDF("asset_id", "frame_idx", "byte_offset")
  }

  /** Deterministic PPM asset generation (for specs and the oracle-checked
    * decode gate): image `id` is `(8 + id%5) × (6 + id%4)` with pixel
    * `(x, y) = ((id + 7x + 13y) % 256, (3id + 5x + y) % 256,
    * (5id + x + 11y) % 256)` — a closed form an oracle can integrate
    * independently. Encoding runs per-partition (mapPartitions), exactly
    * where a tar/webdataset reader would materialize real bytes. */
  def generatePpmAssets(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (8 + id % 5).toInt; val h = (6 + id % 4).toInt
        val rgb = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = (y * w + x) * 3
            rgb(p) = ((id + 7 * x + 13 * y) % 256).toByte
            rgb(p + 1) = ((3 * id + 5 * x + y) % 256).toByte
            rgb(p + 2) = ((5 * id + x + 11 * y) % 256).toByte
            x += 1
          }
          y += 1
        }
        (id, Ppm.encode(w, h, rgb))
      }
    }.toDF("asset_id", "content")
  }

  /** REAL decode: parse the P6 byte stream and aggregate per-image pixel
    * statistics — bytes in, pixels out, no stub. Per-partition streamed
    * iterator (codec state would be initialized once per partition);
    * runs in the scan stage, constant memory, no shuffle. */
  def decodePpm(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets.select("asset_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (w, h, rgb) = Ppm.decode(bytes)
          var r = 0L; var g = 0L; var b = 0L
          var i = 0
          while (i < rgb.length) {
            r += rgb(i) & 0xff; g += rgb(i + 1) & 0xff; b += rgb(i + 2) & 0xff
            i += 3
          }
          val n = (w * h).toDouble
          (id, w.toLong, h.toLong, 3, r / n, g / n, b / n)
        }
      }
      .toDF("asset_id", "width", "height", "channels", "mean_r", "mean_g", "mean_b")
  }

  /** REAL nearest-neighbor resize: decode → sample → re-encode. Binary
    * in, binary out, per-partition — the exact shape of a production
    * thumbnail/normalize pass. Integer source mapping (tx*w/tw) keeps the
    * result independently derivable by the oracle. */
  def resizePpm(spark: SparkSession, assets: DataFrame, tw: Int, th: Int): DataFrame = {
    import spark.implicits._
    assets.select("asset_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (w, h, rgb) = Ppm.decode(bytes)
          (id, Ppm.encode(tw, th, Ppm.resize(w, h, rgb, tw, th)))
        }
      }.toDF("asset_id", "content")
  }

  /** Deterministic WAV asset generation (specs + the oracle-checked audio
    * gates): asset `id` is mono PCM16, rate `8000 + (id%3)*4000`,
    * `100 + id%50` samples with `s(t) = (31·id + 7·t) % 65536 − 32768` —
    * closed-form, so the oracle can integrate it without seeing a byte. */
  def generateWavAssets(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = (100 + id % 50).toInt
        val samples = Array.tabulate(n)(t => ((31 * id + 7 * t) % 65536 - 32768).toShort)
        (id, Wav.encode((8000 + (id % 3) * 4000).toInt, 1, samples))
      }
    }.toDF("asset_id", "content")
  }

  /** REAL audio decode: parse RIFF/PCM16 and report per-asset sample
    * statistics — same per-partition streamed contract as decodePpm. */
  def decodeWav(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets.select("asset_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (rate, channels, samples) = Wav.decode(bytes)
          var sum = 0L; var peak = Int.MinValue
          var i = 0
          while (i < samples.length) {
            sum += samples(i); if (samples(i) > peak) peak = samples(i)
            i += 1
          }
          (id, rate, channels, samples.length.toLong,
            sum.toDouble / samples.length, peak)
        }
      }
      .toDF("asset_id", "sample_rate", "channels", "n_samples", "mean_sample", "peak")
  }

  /** REAL resample (decimation): decode → every `factor`-th frame →
    * re-encode at rate/factor. Binary in, binary out, scan-stage. */
  def decimateWav(spark: SparkSession, assets: DataFrame, factor: Int): DataFrame = {
    import spark.implicits._
    assets.select("asset_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (rate, channels, samples) = Wav.decode(bytes)
          (id, Wav.encode(rate / factor, channels,
            Wav.decimate(samples, channels, factor)))
        }
      }.toDF("asset_id", "content")
  }

  /** Deterministic Y4M asset generation: video `id` is mono
    * `(8 + (id%3)·2) × 6`, `5 + id%6` frames at 24 fps, luma
    * `(13·id + 17·f + 5·x + 3·y) % 256` — closed-form per (frame, pixel)
    * so the oracle can integrate it. */
  def generateY4mAssets(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (8 + (id % 3) * 2).toInt; val h = 6
        val nf = (5 + id % 6).toInt
        val frames = Vector.tabulate(nf) { f =>
          Array.tabulate(w * h) { p =>
            val x = p % w; val y = p / w
            ((13 * id + 17 * f + 5 * x + 3 * y) % 256).toByte
          }
        }
        (id, Y4m.encode(Y4m.Video(w, h, 24, 1, mono = true, frames)))
      }
    }.toDF("asset_id", "content")
  }

  /** REAL video frame sampling: parse the Y4M stream, keep every
    * `stride`-th frame, one output row per KEPT frame with its original
    * index and true mean luma (Y plane) — the 1-asset-row → N-frame-rows
    * in-task fan-out, computed from actual decoded frames. */
  def sampleVideoFrames(spark: SparkSession, assets: DataFrame, stride: Int): DataFrame = {
    import spark.implicits._
    assets.select("asset_id", "content").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val v = Y4m.decode(bytes)
        val lumaLen = v.width * v.height // Y plane (all of it when mono)
        v.frames.zipWithIndex.collect {
          case (f, i) if i % stride == 0 =>
            var s = 0L; var j = 0
            while (j < lumaLen) { s += f(j) & 0xff; j += 1 }
            (id, i.toLong, v.width.toLong, v.height.toLong,
              v.frames.size.toLong, s.toDouble / lumaLen)
        }
      }
      .toDF("asset_id", "frame_no", "width", "height", "n_frames", "mean_y")
  }

  /** Feature-extraction stub: binary payload → fixed-size float embedding
    * (deterministic: seeded hashes of the payload bytes per dimension,
    * normalized). Real models slot in behind the same per-partition
    * batch contract (load the model once per partition, stream rows
    * through it — the same mapPartitions shape as [[decodePpm]]); the
    * output column is exactly what graft.similarity consumes for ANN. */
  def featureExtractStub(spark: SparkSession, assets: DataFrame, dim: Int): DataFrame = {
    import spark.implicits._
    assets.select("asset_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition setup: a real embedding model loads here, once
        rows.map { case (id, bytes) =>
          val raw = Array.tabulate(dim) { d =>
            var h = 1125899906842597L * (d + 1)
            var i = 0
            while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
            ((h % 1000L) / 1000.0f)
          }
          val norm = math.sqrt(raw.map(x => x * x.toDouble).sum).toFloat max 1e-9f
          (id, raw.map(_ / norm))
        }
      }
      .toDF("asset_id", "embedding")
  }
}
