package graft.sources.tfrecord

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException, File, FileInputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util
import java.util.zip.CRC32C

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** TFRecord container IO (reference io/TFRecordIO.java; format per the
  * public TensorFlow record spec): each record is
  * `uint64le length | uint32le masked_crc32c(length) | data |
  * uint32le masked_crc32c(data)`. Implemented on JDK CRC32C — no
  * TensorFlow dependency.
  *
  * Scale notes: TFRecord has no sync markers, so files are NOT
  * splittable — the read unit is one file per task (same contract as the
  * reference's TFRecordSource). Shard on write (`repartition(n)`) to get
  * read parallelism back; `checkCrc` can be disabled to trade integrity
  * checking for scan throughput.
  */
object TFRecordIO {

  private val MaskDelta = 0xa282ead8L

  private[graft] def maskedCrc(bytes: Array[Byte], len: Int): Int = {
    val c = new CRC32C
    c.update(bytes, 0, len)
    val crc = c.getValue
    ((((crc >>> 15) | (crc << 17)) + MaskDelta) & 0xFFFFFFFFL).toInt
  }

  private def le64(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()
  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  /** Sharded write: one .tfrecord file per partition of the `recordCol`
    * binary column, temp-then-rename committed (≙ TFRecordIO.write). */
  def write(df: DataFrame, path: String, recordCol: String = "value"): Unit = {
    val dir = new File(path)
    dir.mkdirs()
    val jobId = java.util.UUID.randomUUID.toString.take(8)
    df.select(col(recordCol).cast("binary")).rdd.mapPartitionsWithIndex { (idx, rows) =>
      val tmp = new File(dir, f".part-$idx%05d-$jobId.tfrecord.inprogress")
      val fin = new File(dir, f"part-$idx%05d-$jobId.tfrecord")
      val out = new BufferedOutputStream(new FileOutputStream(tmp), 1 << 16)
      var n = 0L
      rows.foreach { r =>
        val data = r.getAs[Array[Byte]](0)
        val lenBytes = le64(data.length.toLong)
        out.write(lenBytes)
        out.write(le32(maskedCrc(lenBytes, 8)))
        out.write(data)
        out.write(le32(maskedCrc(data, data.length)))
        n += 1
      }
      out.close()
      if (!tmp.renameTo(fin))
        throw new java.io.IOException(s"commit rename failed for $fin")
      Iterator.single(n)
    }.sum()
    new File(dir, "_SUCCESS").createNewFile()
  }

  /** Read back as a single-binary-column frame via the graft-tfrecord
    * DSv2 source (one file per task; ≙ TFRecordIO.read). */
  def read(spark: SparkSession, path: String, checkCrc: Boolean = true): DataFrame =
    spark.read.format("graft-tfrecord")
      .option("path", path).option("checkCrc", checkCrc.toString).load()
}

class TFRecordProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-tfrecord"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TFRecordTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TFRecordTable(properties.get("path"),
      Option(properties.get("checkCrc")).forall(_.toBoolean))
}

object TFRecordTable {
  val schema: StructType =
    StructType(Seq(StructField("value", BinaryType, nullable = false)))
  def listFiles(path: String): Array[File] = {
    val f = new File(path)
    val all = if (f.isDirectory) f.listFiles() else Array(f)
    all.filter(x => x.isFile && x.getName.endsWith(".tfrecord")).sortBy(_.getName)
  }
}

class TFRecordTable(path: String, checkCrc: Boolean) extends Table with SupportsRead {
  override def name(): String = s"graft_tfrecord($path)"
  override def schema(): StructType = TFRecordTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TFRecordScan(path, checkCrc)
}

case class TFRecordFilePartition(file: String, checkCrc: Boolean) extends InputPartition

class TFRecordScan(path: String, checkCrc: Boolean)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = TFRecordTable.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    TFRecordTable.listFiles(path)
      .map(f => TFRecordFilePartition(f.getPath, checkCrc): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory = TFRecordReaderFactory
}

object TFRecordReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[TFRecordFilePartition]
    new PartitionReader[InternalRow] {
      private val in = new DataInputStream(
        new BufferedInputStream(new FileInputStream(part.file), 1 << 16))
      private var rec: Array[Byte] = _

      private def readFully(n: Int): Array[Byte] = {
        val b = new Array[Byte](n)
        in.readFully(b)
        b
      }

      override def next(): Boolean = {
        val lenBytes =
          try readFully(8)
          catch { case _: EOFException => return false }
        val lenCrc = readFully(4)
        val len = ByteBuffer.wrap(lenBytes).order(ByteOrder.LITTLE_ENDIAN).getLong
        if (part.checkCrc) {
          val expect = ByteBuffer.wrap(lenCrc).order(ByteOrder.LITTLE_ENDIAN).getInt
          require(TFRecordIO.maskedCrc(lenBytes, 8) == expect,
            s"length crc mismatch in ${part.file}")
        }
        require(len >= 0 && len <= Int.MaxValue, s"bad record length $len")
        rec = readFully(len.toInt)
        val dataCrc = readFully(4)
        if (part.checkCrc) {
          val expect = ByteBuffer.wrap(dataCrc).order(ByteOrder.LITTLE_ENDIAN).getInt
          require(TFRecordIO.maskedCrc(rec, rec.length) == expect,
            s"data crc mismatch in ${part.file}")
        }
        true
      }
      override def get(): InternalRow = InternalRow(rec)
      override def close(): Unit = in.close()
    }
  }
}
