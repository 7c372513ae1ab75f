package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A minimal but complete DataSourceV2 connector — SURVEY.md §2.I8.
  *
  * The reference ingests by paging a REST API (statsapi `schedule` /
  * `people` pulls, function.py:72-346). At 100 TB that shape becomes a
  * custom Spark connector: the driver plans PARTITIONS of the keyspace
  * (here: disjoint id ranges, in production: date ranges / page cursors),
  * and each executor task pulls and decodes its own slice in parallel —
  * no driver-side download loop, no single-machine bottleneck.
  *
  * The "API" here is a deterministic generator (no network in this
  * container): row i carries a Knuth-hash bucket and a quantized LCG
  * score, so the whole source replays exactly in SQL from `range(N)` —
  * the connector machinery (TableProvider → Table → ScanBuilder → Batch
  * → InputPartition → PartitionReader emitting InternalRows) is the real
  * thing, driven through `spark.read.format(...)`.
  */
class RangeStatsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeStatsSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RangeStatsTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(100000L),
      Option(properties.get("slices")).map(_.toInt).getOrElse(8))
}

object RangeStatsSource {
  val schema: StructType = new StructType()
    .add("id", LongType).add("bucket", IntegerType).add("score", DoubleType)

  /** The generator contract, shared by every reader task and the SQL
    * replay: bucket = (i·2654435761) mod 16, score = ((i·1103515245 +
    * 12345) mod 10⁶) / 10⁶ — exact integer arithmetic, one exact binary
    * division.
    */
  def bucketOf(i: Long): Int = ((i * 2654435761L) % 16L).toInt
  def scoreOf(i: Long): Double = ((i * 1103515245L + 12345L) % 1000000L) / 1000000.0
}

private class RangeStatsTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"range_stats($rows)"
  override def schema(): StructType = RangeStatsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = RangeStatsSource.schema
        override def toBatch: Batch = new RangeStatsBatch(rows, slices)
      }
    }
}

private case class RangeSlice(start: Long, end: Long) extends InputPartition

private class RangeStatsBatch(rows: Long, slices: Int) extends Batch {
  /** Disjoint id ranges — the partition-planning step that makes the
    * pull parallel: one task per slice, no shared cursor.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = (rows + slices - 1) / slices
    (0 until slices).map { s =>
      RangeSlice(s * per, math.min((s + 1) * per, rows))
    }.filter(p => p.start < p.end).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val slice = partition.asInstanceOf[RangeSlice]
        new PartitionReader[InternalRow] {
          private var i = slice.start - 1
          override def next(): Boolean = { i += 1; i < slice.end }
          override def get(): InternalRow =
            InternalRow(i, RangeStatsSource.bucketOf(i), RangeStatsSource.scoreOf(i))
          override def close(): Unit = ()
        }
      }
    }
}
