package graft.sources.avro

import java.io.File
import java.nio.ByteBuffer
import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Avro container-file IO (reference io/AvroIO.java:186 read,
  * AvroIO.java:1135 write; schema resolution per the Avro spec) as a
  * DataSource V2 provider plus a sharded write helper — implemented on the
  * Avro core library because this environment ships no spark-avro module.
  *
  * Scale design:
  *  - Reads are SPLITTABLE WITHIN A FILE: an Avro container is a sequence
  *    of sync-marker-delimited blocks, so each InputPartition is a
  *    (file, start, end) byte range; the reader seeks to the first sync
  *    past `start` and stops at the first block past `end` (the same
  *    contract as the reference's AvroSource block ranges,
  *    io/AvroSource.java:115). One 100 GB file fans out to
  *    ceil(bytes / splitSize) tasks instead of one.
  *  - Schema evolution: pass `avroSchema` (reader schema JSON) and each
  *    file's writer schema is resolved against it per Avro resolution
  *    rules (new fields take defaults, removed fields are skipped) —
  *    AvroIO.java's readerSchema contract.
  *  - Writes shard per input partition (control shards with
  *    `repartition(n)`), committing each shard via temp-file rename, and
  *    finish with a _SUCCESS marker — the temp-then-rename protocol of
  *    io/WriteFiles.java:122.
  *
  * Types covered both directions: null/boolean/int/long/float/double/
  * string/binary, timestamp-micros, date, arrays, string-keyed maps and
  * nested records; nullability maps to union(null, T).
  */
object AvroIO {

  // ---------- schema: Spark -> Avro ----------

  def avroSchemaFor(st: StructType, recordName: String = "graft_record"): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, fieldSchema(f.dataType, f.nullable, f.name),
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(recordName, null, "graft.avro", false, fields.toList.asJava)
  }

  private def fieldSchema(dt: DataType, nullable: Boolean, name: String): Schema = {
    val base = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case TimestampNTZType =>
        LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case DateType => LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case ArrayType(e, containsNull) =>
        Schema.createArray(fieldSchema(e, containsNull, name + "_item"))
      case MapType(StringType, v, valueContainsNull) =>
        Schema.createMap(fieldSchema(v, valueContainsNull, name + "_value"))
      case st: StructType => avroSchemaFor(st, name + "_record")
      case other => throw new IllegalArgumentException(
        s"AvroIO cannot map Spark type $other (column $name)")
    }
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
  }

  // ---------- schema: Avro -> Spark ----------

  def sparkTypeFor(schema: Schema): (DataType, Boolean) = schema.getType match {
    case Schema.Type.UNION =>
      val branches = schema.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1, s"only union(null, T) supported, got $schema")
      (sparkTypeFor(branches.head)._1, true)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      if (schema.getLogicalType.isInstanceOf[LogicalTypes.Date]) (DateType, false)
      else (IntegerType, false)
    case Schema.Type.LONG =>
      schema.getLogicalType match {
        case _: LogicalTypes.TimestampMicros | _: LogicalTypes.TimestampMillis =>
          (TimestampType, false)
        case _: LogicalTypes.LocalTimestampMicros | _: LogicalTypes.LocalTimestampMillis =>
          (TimestampNTZType, false)
        case _ => (LongType, false)
      }
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING | Schema.Type.ENUM => (StringType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED => (BinaryType, false)
    case Schema.Type.ARRAY =>
      val (e, n) = sparkTypeFor(schema.getElementType)
      (ArrayType(e, n), false)
    case Schema.Type.MAP =>
      val (v, n) = sparkTypeFor(schema.getValueType)
      (MapType(StringType, v, n), false)
    case Schema.Type.RECORD =>
      val fields = schema.getFields.asScala.map { f =>
        val (dt, n) = sparkTypeFor(f.schema())
        StructField(f.name(), dt, n)
      }
      (StructType(fields.toSeq), false)
    case other => throw new IllegalArgumentException(s"unsupported Avro type $other")
  }

  def sparkSchemaFor(schema: Schema): StructType =
    sparkTypeFor(schema)._1.asInstanceOf[StructType]

  // ---------- values: Row -> GenericRecord ----------

  private def toAvroValue(v: Any, dt: DataType, schema: Schema): Any = {
    if (v == null) return null
    val target = if (schema.getType == Schema.Type.UNION)
      schema.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else schema
    (dt, v) match {
      case (ByteType, b: Byte) => b.toInt
      case (ShortType, s: Short) => s.toInt
      case (TimestampType, t: java.sql.Timestamp) =>
        t.getTime * 1000L + (t.getNanos / 1000) % 1000
      case (TimestampType, t: java.time.Instant) =>
        t.getEpochSecond * 1000000L + t.getNano / 1000
      case (TimestampNTZType, t: java.time.LocalDateTime) =>
        t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000
      case (DateType, d: java.sql.Date) => d.toLocalDate.toEpochDay.toInt
      case (DateType, d: java.time.LocalDate) => d.toEpochDay.toInt
      case (BinaryType, b: Array[Byte]) => ByteBuffer.wrap(b)
      case (ArrayType(e, _), seq: scala.collection.Seq[_]) =>
        val out = new util.ArrayList[Any](seq.size)
        seq.foreach(x => out.add(toAvroValue(x, e, target.getElementType)))
        out
      case (MapType(StringType, vt, _), m: scala.collection.Map[_, _]) =>
        val out = new util.HashMap[String, Any](m.size)
        m.foreach { case (k, x) =>
          out.put(k.toString, toAvroValue(x, vt, target.getValueType)) }
        out
      case (st: StructType, r: Row) => rowToRecord(r, st, target)
      case (_, other) => other
    }
  }

  def rowToRecord(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < st.fields.length) {
      val f = st.fields(i)
      rec.put(f.name, toAvroValue(row.get(i), f.dataType, schema.getField(f.name).schema()))
      i += 1
    }
    rec
  }

  // ---------- values: GenericRecord -> InternalRow ----------

  private def toCatalyst(v: Any, dt: DataType): Any = {
    if (v == null) return null
    dt match {
      case StringType => UTF8String.fromString(v.toString)
      case BinaryType => v match {
        case bb: ByteBuffer =>
          val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
        case fixed: org.apache.avro.generic.GenericFixed => fixed.bytes()
        case a: Array[Byte] => a
      }
      case TimestampType | TimestampNTZType => v match { // micros pass through
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      case DateType => v.asInstanceOf[java.lang.Integer].intValue()
      case IntegerType => v.asInstanceOf[java.lang.Integer].intValue()
      case LongType => v.asInstanceOf[java.lang.Long].longValue()
      case ArrayType(e, _) =>
        val in = v.asInstanceOf[java.util.Collection[_]].asScala
        new GenericArrayData(in.map(toCatalyst(_, e)).toArray)
      case MapType(StringType, vt, _) =>
        val in = v.asInstanceOf[java.util.Map[_, _]].asScala
        val ks = in.keys.map(k => UTF8String.fromString(k.toString)).toArray[Any]
        val vs = in.values.map(toCatalyst(_, vt)).toArray[Any]
        new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
      case st: StructType => recordToInternal(v.asInstanceOf[GenericRecord], st)
      case _ => v
    }
  }

  def recordToInternal(rec: GenericRecord, st: StructType): InternalRow = {
    val vals = new Array[Any](st.fields.length)
    var i = 0
    while (i < st.fields.length) {
      val f = st.fields(i)
      val field = rec.getSchema.getField(f.name)
      vals(i) = if (field == null) null else toCatalyst(rec.get(field.pos()), f.dataType)
      i += 1
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  // ---------- write path ----------

  /** Sharded Avro write: one container file per input partition, each
    * committed via temp-file rename; `repartition(n)` upstream controls
    * shard count (≙ AvroIO.write().withNumShards). */
  def write(df: DataFrame, path: String, codec: String = "snappy"): Unit = {
    val st = df.schema
    val schemaJson = avroSchemaFor(st).toString
    val dir = new File(path)
    dir.mkdirs()
    val jobId = java.util.UUID.randomUUID.toString.take(8)
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val tmp = new File(dir, f".part-$idx%05d-$jobId.avro.inprogress")
      val fin = new File(dir, f"part-$idx%05d-$jobId.avro")
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.setCodec(org.apache.avro.file.CodecFactory.fromString(codec))
      w.create(schema, tmp)
      var n = 0L
      rows.foreach { r => w.append(rowToRecord(r, st, schema)); n += 1 }
      w.close()
      if (!tmp.renameTo(fin))
        throw new java.io.IOException(s"commit rename failed for $fin")
      Iterator.single(n)
    }.sum() // action: materialize the write
    new File(dir, "_SUCCESS").createNewFile()
  }

  /** Read via the splittable DSv2 source registered as `graft-avro`. */
  def read(spark: SparkSession, path: String,
      readerSchemaJson: Option[String] = None,
      splitSizeBytes: Long = 128L * 1024 * 1024): DataFrame = {
    val r = spark.read.format("graft-avro")
      .option("path", path).option("splitSize", splitSizeBytes)
    readerSchemaJson.fold(r)(s => r.option("avroSchema", s)).load()
  }
}

/** DSv2 provider: `spark.read.format("graft-avro").option("path", p)`. */
class AvroProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val readerSchema = Option(options.get("avroSchema"))
      .map(new Schema.Parser().parse(_))
      .getOrElse {
        val files = AvroTable.listFiles(options.get("path"))
        require(files.nonEmpty, s"no .avro files under ${options.get("path")}")
        val r = new DataFileReader[GenericRecord](files.head,
          new GenericDatumReader[GenericRecord]())
        try r.getSchema finally r.close()
      }
    AvroIO.sparkSchemaFor(readerSchema)
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AvroTable(schema, properties.get("path"),
      Option(properties.get("avroSchema")),
      Option(properties.get("splitSize")).map(_.toLong).getOrElse(128L * 1024 * 1024))
}

object AvroTable {
  def listFiles(path: String): Array[File] = {
    val f = new File(path)
    val all = if (f.isDirectory) f.listFiles() else Array(f)
    all.filter(x => x.isFile && x.getName.endsWith(".avro")).sortBy(_.getName)
  }
}

class AvroTable(sparkSchema: StructType, path: String,
    readerSchemaJson: Option[String], splitSize: Long) extends Table with SupportsRead {
  override def name(): String = s"graft_avro($path)"
  override def schema(): StructType = sparkSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScan(sparkSchema, path, readerSchemaJson, splitSize)
}

/** One partition = a byte range of one container file; block-aligned via
  * sync markers at read time, so ranges need not align to records. */
case class AvroSplit(file: String, start: Long, end: Long,
    readerSchemaJson: Option[String]) extends InputPartition

class AvroScan(sparkSchema: StructType, path: String,
    readerSchemaJson: Option[String], splitSize: Long)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = sparkSchema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    AvroTable.listFiles(path).flatMap { f =>
      val len = f.length()
      (0L until len by splitSize).map { start =>
        AvroSplit(f.getPath, start, math.min(len, start + splitSize), readerSchemaJson)
      }
    }.map(p => p: InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(sparkSchema)
}

class AvroReaderFactory(sparkSchema: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val s = p.asInstanceOf[AvroSplit]
    new PartitionReader[InternalRow] {
      private val datumReader = s.readerSchemaJson match {
        case Some(json) => // writer schema from file, explicit reader schema
          new GenericDatumReader[GenericRecord](null, new Schema.Parser().parse(json))
        case None => new GenericDatumReader[GenericRecord]()
      }
      private val reader =
        new DataFileReader[GenericRecord](new File(s.file), datumReader)
      reader.sync(s.start) // first block at/after start; prior split covers the rest
      private var rec: GenericRecord = _
      override def next(): Boolean =
        if (reader.hasNext && !reader.pastSync(s.end)) { rec = reader.next(); true }
        else false
      override def get(): InternalRow = AvroIO.recordToInternal(rec, sparkSchema)
      override def close(): Unit = reader.close()
    }
  }
}
