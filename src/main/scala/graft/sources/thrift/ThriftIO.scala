package graft.sources.thrift

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, File, FileInputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Thrift file IO (reference sdks/java/io/thrift/ThriftIO.java): files of
  * concatenated thrift-serialized structs, read/written with a chosen
  * protocol — here self-contained TBinaryProtocol and TCompactProtocol
  * codecs written to the public Thrift wire specs (no libthrift in this
  * environment, and none needed for flat records).
  *
  * Schema mapping (flat structs, field id = column position + 1):
  * BOOLEAN/INT/BIGINT/DOUBLE/STRING/BINARY map to the matching thrift
  * types; DATE is an i32 of epoch days and TIMESTAMP an i64 of epoch
  * micros (TIMESTAMP_NTZ likewise). NULL columns are omitted fields (thrift's optional-field
  * convention); unknown field ids on read are skipped, so schema
  * evolution by appended fields works in both directions. Nested
  * structs/lists/maps are out of scope (the reference's own tests
  * roundtrip flat records).
  *
  * Scale notes: thrift structs have no sync markers, so files are NOT
  * splittable — the read unit is one file per task (same contract as
  * TFRecordIO here and the reference's ReadFiles). Shard on write
  * (`repartition(n)`) to get read parallelism back.
  */
object ThriftIO {

  // thrift wire type ids
  private object B { // TBinaryProtocol
    val STOP = 0; val BOOL = 2; val DOUBLE = 4; val I32 = 8; val I64 = 10
    val STRING = 11
  }
  private object C { // TCompactProtocol
    val STOP = 0; val TRUE = 1; val FALSE = 2; val I32 = 5; val I64 = 6
    val DOUBLE = 7; val BINARY = 8
  }

  private def zigzag32(n: Int): Int = (n << 1) ^ (n >> 31)
  private def zigzag64(n: Long): Long = (n << 1) ^ (n >> 63)
  private def unzigzag32(n: Int): Int = (n >>> 1) ^ -(n & 1)
  private def unzigzag64(n: Long): Long = (n >>> 1) ^ -(n & 1)

  private def writeVarint(out: DataOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.writeByte(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.writeByte(v.toInt)
  }
  private def readVarint(in: DataInputStream): Long = {
    var shift = 0; var result = 0L
    while (true) {
      val b = in.readByte()
      result |= (b & 0x7FL) << shift
      if ((b & 0x80) == 0) return result
      shift += 7
    }
    result // unreachable
  }

  /** One encoded struct per row. The compact protocol writes field-id
    * deltas; ids ascend by construction (field id = position + 1). */
  private[thrift] def encode(out: DataOutputStream, row: Row,
      schema: StructType, compact: Boolean): Unit = {
    var lastId = 0
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val id = i + 1
        val dt = schema(i).dataType
        if (compact) {
          val tpe = dt match {
            case BooleanType => if (row.getBoolean(i)) C.TRUE else C.FALSE
            case IntegerType | DateType => C.I32
            case LongType | TimestampType | TimestampNTZType => C.I64
            case DoubleType => C.DOUBLE
            case StringType | BinaryType => C.BINARY
            case other => throw new IllegalArgumentException(s"thrift: unsupported type $other")
          }
          val delta = id - lastId
          if (delta > 0 && delta <= 15) out.writeByte((delta << 4) | tpe)
          else { out.writeByte(tpe); writeVarint(out, zigzag32(id).toLong & 0xFFFFFFFFL) }
          dt match {
            case BooleanType => // value lives in the type nibble
            case IntegerType => writeVarint(out, zigzag32(row.getInt(i)).toLong & 0xFFFFFFFFL)
            case DateType => writeVarint(out,
              zigzag32(DateTimeUtils.fromJavaDate(row.getAs[java.sql.Date](i))).toLong & 0xFFFFFFFFL)
            case LongType => writeVarint(out, zigzag64(row.getLong(i)))
            case TimestampType => writeVarint(out,
              zigzag64(DateTimeUtils.fromJavaTimestamp(row.getAs[java.sql.Timestamp](i))))
            case TimestampNTZType => writeVarint(out,
              zigzag64(DateTimeUtils.localDateTimeToMicros(row.getAs[java.time.LocalDateTime](i))))
            case DoubleType =>
              val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
                .putDouble(row.getDouble(i)).array()
              out.write(b)
            case StringType =>
              val b = row.getString(i).getBytes("UTF-8")
              writeVarint(out, b.length.toLong); out.write(b)
            case BinaryType =>
              val b = row.getAs[Array[Byte]](i)
              writeVarint(out, b.length.toLong); out.write(b)
            case _ =>
          }
        } else { // TBinaryProtocol: type byte + i16 BE field id + value
          val tpe = dt match {
            case BooleanType => B.BOOL
            case IntegerType | DateType => B.I32
            case LongType | TimestampType | TimestampNTZType => B.I64
            case DoubleType => B.DOUBLE
            case StringType | BinaryType => B.STRING
            case other => throw new IllegalArgumentException(s"thrift: unsupported type $other")
          }
          out.writeByte(tpe); out.writeShort(id)
          dt match {
            case BooleanType => out.writeByte(if (row.getBoolean(i)) 1 else 0)
            case IntegerType => out.writeInt(row.getInt(i))
            case DateType => out.writeInt(DateTimeUtils.fromJavaDate(row.getAs[java.sql.Date](i)))
            case LongType => out.writeLong(row.getLong(i))
            case TimestampType =>
              out.writeLong(DateTimeUtils.fromJavaTimestamp(row.getAs[java.sql.Timestamp](i)))
            case TimestampNTZType =>
              out.writeLong(DateTimeUtils.localDateTimeToMicros(row.getAs[java.time.LocalDateTime](i)))
            case DoubleType => out.writeDouble(row.getDouble(i))
            case StringType =>
              val b = row.getString(i).getBytes("UTF-8")
              out.writeInt(b.length); out.write(b)
            case BinaryType =>
              val b = row.getAs[Array[Byte]](i)
              out.writeInt(b.length); out.write(b)
            case _ =>
          }
        }
        lastId = id
      }
      i += 1
    }
    out.writeByte(0) // STOP
  }

  /** Decode one struct into InternalRow values; None at clean EOF.
    * Unknown field ids are skipped (schema evolution). */
  private[thrift] def decode(in: DataInputStream, schema: StructType,
      compact: Boolean): Option[Array[Any]] = {
    val first =
      try in.readByte()
      catch { case _: EOFException => return None }
    val vals = new Array[Any](schema.length)

    def assign(id: Int, v: Any): Unit =
      if (id >= 1 && id <= schema.length) {
        vals(id - 1) = schema(id - 1).dataType match {
          case StringType => UTF8String.fromBytes(v.asInstanceOf[Array[Byte]])
          case BinaryType => v
          case BooleanType | DoubleType => v
          case IntegerType | DateType => v
          case LongType | TimestampType | TimestampNTZType => v
          case other => throw new IllegalArgumentException(s"thrift: unsupported type $other")
        }
      } // else: unknown field, value already consumed — skipped

    if (compact) {
      var lastId = 0
      var header = first
      while (header != C.STOP) {
        val tpe = header & 0x0F
        val delta = (header & 0xFF) >>> 4
        val id = if (delta != 0) lastId + delta
          else unzigzag32(readVarint(in).toInt)
        tpe match {
          case C.TRUE => assign(id, true)
          case C.FALSE => assign(id, false)
          case C.I32 => assign(id, unzigzag32(readVarint(in).toInt))
          case C.I64 => assign(id, unzigzag64(readVarint(in)))
          case C.DOUBLE =>
            val b = new Array[Byte](8); in.readFully(b)
            assign(id, ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getDouble)
          case C.BINARY =>
            val len = readVarint(in).toInt
            val b = new Array[Byte](len); in.readFully(b)
            assign(id, b)
          case other =>
            throw new java.io.IOException(s"thrift compact: unsupported wire type $other")
        }
        lastId = id
        header = in.readByte()
      }
    } else {
      var tpe = first.toInt
      while (tpe != B.STOP) {
        val id = in.readShort().toInt
        tpe match {
          case B.BOOL => assign(id, in.readByte() != 0)
          case B.I32 => assign(id, in.readInt())
          case B.I64 => assign(id, in.readLong())
          case B.DOUBLE => assign(id, in.readDouble())
          case B.STRING =>
            val len = in.readInt()
            val b = new Array[Byte](len); in.readFully(b)
            assign(id, b)
          case other =>
            throw new java.io.IOException(s"thrift binary: unsupported wire type $other")
        }
        tpe = in.readByte().toInt
      }
    }
    Some(vals)
  }

  /** Sharded write: one .thrift file of concatenated structs per
    * partition, temp-then-rename committed (≙ ThriftIO.sink). */
  def write(df: DataFrame, path: String, protocol: String = "compact"): Unit = {
    val compact = isCompact(protocol)
    val schema = df.schema
    val dir = new File(path)
    dir.mkdirs()
    val jobId = java.util.UUID.randomUUID.toString.take(8)
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      val tmp = new File(dir, f".part-$idx%05d-$jobId.thrift.inprogress")
      val fin = new File(dir, f"part-$idx%05d-$jobId.thrift")
      val out = new DataOutputStream(
        new BufferedOutputStream(new FileOutputStream(tmp), 1 << 16))
      var n = 0L
      rows.foreach { r => encode(out, r, schema, compact); n += 1 }
      out.close()
      if (!tmp.renameTo(fin))
        throw new java.io.IOException(s"commit rename failed for $fin")
      Iterator.single(n)
    }.sum()
    new File(dir, "_SUCCESS").createNewFile()
  }

  /** Read back with a caller-declared schema (thrift carries no schema in
    * the file; the reference takes the generated class for the same
    * reason) via the graft-thrift DSv2 source, one file per task. */
  def read(spark: SparkSession, path: String, schema: StructType,
      protocol: String = "compact"): DataFrame =
    spark.read.format("graft-thrift").schema(schema)
      .option("path", path).option("protocol", protocol).load()

  private[thrift] def isCompact(protocol: String): Boolean =
    protocol.toLowerCase match {
      case "compact" => true
      case "binary" => false
      case other => throw new IllegalArgumentException(
        s"thrift: protocol must be 'compact' or 'binary', got '$other'")
    }
}

class ThriftProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-thrift"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-thrift: a read schema is required (thrift files carry no schema) — " +
        "use spark.read.format(\"graft-thrift\").schema(...)")
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ThriftTable(properties.get("path"), schema,
      Option(properties.get("protocol")).getOrElse("compact"))
}

class ThriftTable(path: String, readSchema: StructType, protocol: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft_thrift($path)"
  override def schema(): StructType = readSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ThriftScan(path, readSchema, ThriftIO.isCompact(protocol))
}

case class ThriftFilePartition(file: String, compact: Boolean) extends InputPartition

class ThriftScan(path: String, schema: StructType, compact: Boolean)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val f = new File(path)
    val all = if (f.isDirectory) f.listFiles() else Array(f)
    all.filter(x => x.isFile && x.getName.endsWith(".thrift")).sortBy(_.getName)
      .map(x => ThriftFilePartition(x.getPath, compact): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    ThriftReaderFactory(schema)
}

case class ThriftReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[ThriftFilePartition]
    new PartitionReader[InternalRow] {
      private val in = new DataInputStream(
        new BufferedInputStream(new FileInputStream(part.file), 1 << 16))
      private var row: Array[Any] = _
      override def next(): Boolean =
        ThriftIO.decode(in, schema, part.compact) match {
          case Some(vals) => row = vals; true
          case None => false
        }
      override def get(): InternalRow = InternalRow.fromSeq(row.toIndexedSeq)
      override def close(): Unit = in.close()
    }
  }
}
