package graft.sources.seqgen

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Deterministic sequence-generator source as a full DataSource V2
  * provider — the reference's `seqgen` SQL table provider
  * (extensions/sql/.../meta/provider/seqgen) and, structurally, its
  * Splittable-DoFn source contract (transforms/splittabledofn/
  * OffsetRangeTracker.java): a source is a set of offset ranges that can
  * be split and read independently; unbounded reads advance a tracked
  * offset frontier.
  *
  *  - Batch: the [from, from+count) range splits into `partitions`
  *    InputPartitions (≙ initial restriction splitting).
  *  - Streaming: MICRO_BATCH_READ advances `rowsPerBatch` offsets per
  *    trigger (≙ a growable offset range with a watermark estimator; the
  *    event-time column makes the stream watermark-capable).
  *
  * Usage: `spark.read.format("graft-seqgen").option("count", n).load()`
  * or `spark.readStream.format("graft-seqgen")...`.
  */
class SeqGenProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-seqgen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SeqGen.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new SeqGenTable
}

object SeqGen {
  val schema: StructType = StructType(Seq(
    StructField("value", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false)))
  /** 2024-01-01T00:00:00Z in micros; rows tick 10ms of virtual time. */
  val EpochMicros = 1704067200000000L
  val TickMicros = 10000L
}

class SeqGenTable extends Table with SupportsRead {
  override def name(): String = "graft_seqgen"
  override def schema(): StructType = SeqGen.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqGenScan(
      options.getLong("from", 0L),
      options.getLong("count", 1000L),
      options.getInt("partitions", 4),
      options.getLong("rowsPerBatch", 100L))
}

class SeqGenScan(from: Long, count: Long, partitions: Int, rowsPerBatch: Long)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = SeqGen.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // split the restriction into ~equal offset ranges (SDF initial split)
    val step = math.max(1L, math.ceil(count.toDouble / partitions).toLong)
    (0 until partitions).iterator
      .map(i => SeqGenRange(from + i * step, math.min(from + count, from + (i + 1) * step)))
      .filter(r => r.end > r.start)
      .map(r => r: InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = SeqGenReaderFactory

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SeqGenMicroBatch(from, count, rowsPerBatch)
}

case class SeqGenRange(start: Long, end: Long) extends InputPartition

object SeqGenReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[SeqGenRange]
    new PartitionReader[InternalRow] {
      private var cur = r.start - 1
      override def next(): Boolean = { cur += 1; cur < r.end }
      override def get(): InternalRow =
        InternalRow(cur, SeqGen.EpochMicros + cur * SeqGen.TickMicros)
      override def close(): Unit = ()
    }
  }
}

case class SeqGenOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

/** Offset frontier: each trigger exposes up to `rowsPerBatch` more rows
  * until `from + count` (a bounded unbounded-source, handy for tests;
  * set count = Long.MaxValue/TickMicros for an endless tick stream). */
class SeqGenMicroBatch(from: Long, count: Long, rowsPerBatch: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private var planned = from
  override def initialOffset(): Offset = SeqGenOffset(from)
  override def latestOffset(): Offset = synchronized {
    planned = math.min(from + count, planned + rowsPerBatch)
    SeqGenOffset(planned)
  }
  // Trigger.AvailableNow (SupportsAdmissionControl): drain
  // [start, from+count) in rowsPerBatch micro-batches, then let the
  // query stop once the end offset reported below is reached.
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def reportLatestOffset(): Offset = SeqGenOffset(from + count)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = synchronized {
    planned = math.max(planned, start.asInstanceOf[SeqGenOffset].pos)
    planned = math.min(from + count, planned + rowsPerBatch)
    SeqGenOffset(planned)
  }
  // On checkpoint recovery the engine replays offsets through here before
  // asking for latestOffset; clamping the frontier up to every offset we
  // see keeps latestOffset from falling below the restored commit and
  // re-planning (duplicating) rows already emitted before the restart.
  override def deserializeOffset(json: String): Offset = synchronized {
    val pos = json.toLong
    planned = math.max(planned, pos)
    SeqGenOffset(pos)
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SeqGenOffset].pos
    val e = end.asInstanceOf[SeqGenOffset].pos
    if (e > s) Array(SeqGenRange(s, e)) else Array.empty
  }
  override def createReaderFactory(): PartitionReaderFactory = SeqGenReaderFactory
  override def commit(end: Offset): Unit = synchronized {
    planned = math.max(planned, end.asInstanceOf[SeqGenOffset].pos)
  }
  override def stop(): Unit = ()
}
