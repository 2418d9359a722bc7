package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 reader for TFRecord shard files (the read side of W1):
  *
  *   spark.read.format("graft.sources.TFRecordDataSource")
  *     .load("/path/to/shards")  →  DataFrame(path STRING, record BINARY)
  *
  * One input partition per shard file — TFRecord has no sync markers so
  * files are not splittable, which is exactly why the sink bounds shards to
  * ~1000 records: shard count, not file size, is the parallelism unit.
  * Every record's CRCs are validated on read.
  */
class TFRecordDataSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TFRecordDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TFRecordTable(properties.get("path"))
}

object TFRecordDataSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("record", BinaryType, nullable = false)))

  /** List the .tfrecord files under a path (or the path itself). */
  def listShardFiles(path: String,
      conf: Configuration = Sinks.hadoopConf()): Seq[String] = {
    val fs = FileSystem.get(new java.net.URI(path), conf)
    val p = new Path(path)
    if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).filter(s => s.isFile
          && s.getPath.getName.endsWith(".tfrecord"))
        .map(_.getPath.toString).sorted.toSeq
    else Seq(path)
  }
}

class TFRecordTable(path: String) extends Table with SupportsRead {
  require(path != null, "TFRecordDataSource requires a path")
  override def name(): String = s"tfrecord:$path"
  override def schema(): StructType = TFRecordDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    () => new TFRecordScan(path)
}

class TFRecordScan(path: String) extends Scan with Batch {
  // session Hadoop conf captured on the driver, shipped to executors
  private val serConf = new SerializableConfiguration(Sinks.hadoopConf())

  override def readSchema(): StructType = TFRecordDataSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    TFRecordDataSource.listShardFiles(path, serConf.value)
      .map(f => TFRecordInputPartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new TFRecordReaderFactory(serConf)
}

case class TFRecordInputPartition(file: String) extends InputPartition

class TFRecordReaderFactory(serConf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[TFRecordInputPartition].file
    new TFRecordPartitionReader(file, serConf.value)
  }
}

/** Streams one shard file, validating CRCs record by record. */
class TFRecordPartitionReader(file: String, conf: Configuration)
    extends PartitionReader[InternalRow] {
  private val fs = FileSystem.get(new java.net.URI(file), conf)
  private val in = fs.open(new Path(file))
  private val fileUtf8 =
    org.apache.spark.unsafe.types.UTF8String.fromString(file)
  private var current: Array[Byte] = _

  override def next(): Boolean = {
    // EOF probe: a clean end-of-file is only legal BETWEEN records. A short
    // read mid-stream (block boundary on HDFS/s3a) must not be mistaken for
    // truncation, so probe one byte then readFully the rest.
    val first = in.read()
    if (first < 0) return false
    val lenBuf = new Array[Byte](8)
    lenBuf(0) = first.toByte
    in.readFully(lenBuf, 1, 7)
    val lenCrc = readInt()
    require(lenCrc == TFRecord.maskedCrc32c(lenBuf),
      s"length CRC mismatch in $file")
    val len = java.nio.ByteBuffer.wrap(lenBuf)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong().toInt
    val data = new Array[Byte](len)
    in.readFully(data)
    val dataCrc = readInt()
    require(dataCrc == TFRecord.maskedCrc32c(data),
      s"data CRC mismatch in $file")
    current = data
    true
  }

  private def readInt(): Int = {
    val b = new Array[Byte](4)
    in.readFully(b)
    java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt()
  }

  override def get(): InternalRow =
    new GenericInternalRow(Array[Any](fileUtf8, current))

  override def close(): Unit = in.close()
}
