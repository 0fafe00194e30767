package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Assets are opaque `binary` columns + typed metadata — the layout that
  * scales: parquet stores the bytes column-compressed, predicate pushdown
  * prunes on the metadata columns without touching the blobs, and decode
  * runs per-partition next to the data (never on the driver).
  *
  * The decode kernel itself is a clearly-marked deterministic STUB (this
  * environment ships no image/audio codecs); everything around it — the
  * asset schema, the mapPartitions batch shape, the per-partition iterator
  * contract (setup once per partition, stream rows, no materialization) —
  * is the real production plumbing a codec would drop into.
  */
object Multimodal {

  /** Typed metadata emitted by the decode step. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("header_hex", StringType, nullable = false),
    StructField("fake_width", IntegerType, nullable = false),
    StructField("fake_height", IntegerType, nullable = false),
    StructField("fake_channels", IntegerType, nullable = false)))

  /** Wrap a text/blob column as a binary asset table: (asset_id, content).
    * In production `content` arrives as real bytes from parquet/tar
    * shards; here it's the UTF-8 encoding of a text column. */
  def asAssets(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("asset_id"),
      col(payloadCol).cast("binary").as("content"))

  /** Per-partition decode. The iterator is streamed — constant memory per
    * partition regardless of partition size — and the (stub) codec is
    * initialized once per partition, the contract a JNI/FFI decoder needs.
    *
    * STUB: dimensions are derived deterministically from the payload bytes
    * instead of an actual image parse. Swap `decodeOne` for a real codec. */
  def decodeStub(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets.select("asset_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition setup would open the codec here (once, not per row)
        rows.map { case (id, bytes) => decodeOne(id, bytes) }
      }
      .toDF("asset_id", "byte_len", "header_hex",
        "fake_width", "fake_height", "fake_channels")
  }

  /** ??? real codec goes here — deterministic fake for now: header is the
    * first 8 bytes hex-encoded; dimensions derived from byte length. */
  private def decodeOne(id: Long, bytes: Array[Byte]): (Long, Int, String, Int, Int, Int) = {
    val header = bytes.take(8).map(b => f"${b & 0xff}%02x").mkString
    val len = bytes.length
    (id, len, header, len % 640 + 1, len % 480 + 1, len % 3 + 1)
  }

  /** Frame sampling stub: pick every `stride`-th "frame" (byte offset) of
    * the payload — the partition/batch shape of real video frame sampling
    * (one input row fans out to N frame rows, all inside one task). */
  def sampleFramesStub(spark: SparkSession, assets: DataFrame, stride: Int): DataFrame =
    assets.select(col("asset_id"),
      posexplode(sequence(lit(0),
        greatest(floor(octet_length(col("content")) / lit(stride)).cast("int") - 1, lit(0)))))
      .select(col("asset_id"), col("pos").as("frame_idx"),
        (col("col") * stride).as("byte_offset"))

  /** Resize stub: emits the (target_w, target_h) metadata and a payload
    * "resized" by truncation to w*h bytes — the real operation is a
    * per-row codec call with the SAME shape: binary in, binary + metadata
    * out, executed inside the scan stage (no shuffle, no driver). */
  def resizeStub(assets: DataFrame, targetW: Int, targetH: Int): DataFrame =
    assets.select(col("asset_id"),
      lit(targetW).as("target_w"), lit(targetH).as("target_h"),
      substring(col("content"), 1, targetW * targetH).as("content"))

  /** Feature-extraction stub: binary payload → fixed-size float embedding
    * (deterministic: seeded hashes of the payload bytes per dimension,
    * normalized). Real models slot in behind the same per-partition
    * batch contract (load the model once per partition, stream rows
    * through it — the mapPartitions shape of decodeStub); the output
    * column is exactly what graft.similarity consumes for ANN. */
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
