package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.SerializableConfiguration

/** Sharded TFRecord dataset sink (SURVEY.md W1): each row's byte payload is
  * framed into TFRecord entries, round-robined across `n/shardSize + 1`
  * shard files (the reference's formula, `jigsaw/write_dataset.py:185,196`),
  * plus a `.numexamples` count sidecar.
  *
  * Scale: one `repartition(numShards)` round-robin shuffle, then every task
  * streams its shard straight to the (distributed) filesystem — no driver
  * collection, no per-row small files.
  */
object Sinks {
  /** Spark's Hadoop configuration when a session is active (carries
    * spark.hadoop.* object-store credentials/endpoints), else a default.
    */
  private[sources] def hadoopConf(): Configuration =
    SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /** Run `f` against a PRIVATE FileSystem handle with CRC sidecar files
    * disabled (the Hadoop local FS otherwise litters every write with
    * .name.crc files), closed afterwards. `FileSystem.newInstance`, not
    * `get`: `get` returns the JVM-cached shared instance per
    * scheme/authority, so `setWriteChecksum(false)` on it would leak to
    * every other writer in the process for the rest of the JVM's life —
    * the checksum opt-out must stay scoped to graft's own sinks.
    */
  private[sources] def withFs[A](uri: String,
      conf: Configuration = hadoopConf())(f: FileSystem => A): A = {
    val fs = FileSystem.newInstance(new java.net.URI(uri), conf)
    try {
      fs.setWriteChecksum(false)
      f(fs)
    } finally fs.close()
  }

  /** Write a small text file (driver-side sidecars: manifests, label maps,
    * counts, key orders).
    */
  def writeTextFile(path: String, content: String): Unit =
    TFRecordSink.writeText(path, content)
}

object TFRecordSink {

  /** Write `bytesCol` (BINARY column of serialized tf.train.Examples) under
    * `dir` as `<prefix>-SSSSS.tfrecord` shards. Returns the record count.
    */
  def writeSharded(df: DataFrame, bytesCol: String, dir: String,
      prefix: String = "shard", shardSize: Long = 1000): Long = {
    // persist: the payload is consumed twice (count, then the write) and
    // recomputing an upstream bind/export pipeline would double all I/O
    val payload = df.select(bytesCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = payload.count()
      val numShards = (n / shardSize + 1).toInt
      // Job-level overwrite: clear previous-run shards and orphaned temp
      // files ONCE on the driver, so tasks never have to delete a committed
      // file (a delete-then-rename in a task would let a killed speculative
      // attempt destroy a finished shard without replacing it).
      Sinks.withFs(dir) { driverFs =>
        val dirPath = new Path(dir)
        if (driverFs.exists(dirPath)) {
          driverFs.listStatus(dirPath).map(_.getPath).foreach { p =>
            val name = p.getName
            if ((name.startsWith(s"$prefix-") && name.endsWith(".tfrecord"))
                || (name.startsWith(s".$prefix-") && name.endsWith(".tmp")))
              driverFs.delete(p, false)
          }
        }
      }
      // executor-side FS needs the session's Hadoop conf (s3a creds etc.)
      val serConf = new SerializableConfiguration(Sinks.hadoopConf())
      payload.repartition(numShards).foreachPartition {
        (rows: Iterator[org.apache.spark.sql.Row]) =>
          val ctx = TaskContext.get()
          val shard = ctx.partitionId()
          Sinks.withFs(dir, serConf.value) { fs =>
            // write-to-temp + rename, FIRST attempt wins: rename refuses
            // an existing destination, so a committed shard is never
            // deleted; the losing attempt just discards its temp file
            val finalPath = new Path(dir, f"$prefix-$shard%05d.tfrecord")
            val tmpPath = new Path(dir,
              f".$prefix-$shard%05d.tfrecord.${ctx.taskAttemptId()}%d.tmp")
            val out = fs.create(tmpPath, true)
            try rows.foreach(r =>
              TFRecord.writeRecord(out, r.getAs[Array[Byte]](0)))
            finally out.close()
            if (!fs.rename(tmpPath, finalPath)) {
              fs.delete(tmpPath, false)
            }
          }
          ()
      }
      writeText(s"$dir/$prefix.numexamples", n.toString)
      n
    } finally payload.unpersist()
  }

  private[sources] def writeText(path: String, content: String): Unit =
    Sinks.withFs(path) { fs =>
      val out = fs.create(new Path(path), true)
      try out.write(content.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
}

/** NumPy `.npy` writer (format spec v1.0, public NumPy docs) for the
  * mean/stdev tensor sidecars (SURVEY.md W13,
  * `jigsaw/models/feature_points/model.py:103-113`).
  */
object NpyWriter {

  /** Serialize a float32 tensor (C-order) with the given shape. */
  def float32(values: Array[Float], shape: Seq[Int]): Array[Byte] = {
    require(values.length == shape.product, "shape does not match data size")
    val shapeStr = shape.mkString("(", ", ", if (shape.length == 1) ",)" else ")")
    var header = s"{'descr': '<f4', 'fortran_order': False, 'shape': $shapeStr, }"
    // pad with spaces so magic+2+2+len(header)+1 is a multiple of 64
    val unpadded = 10 + header.length + 1
    header = header + " " * ((64 - unpadded % 64) % 64) + "\n"
    val out = new ByteArrayOutputStream()
    out.write(0x93)
    out.write("NUMPY".getBytes(StandardCharsets.US_ASCII))
    out.write(1); out.write(0) // version 1.0
    val hlen = header.length
    out.write(hlen & 0xff); out.write((hlen >> 8) & 0xff)
    out.write(header.getBytes(StandardCharsets.US_ASCII))
    val data = ByteBuffer.allocate(4 * values.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    values.foreach(data.putFloat)
    out.write(data.array())
    out.toByteArray
  }

  def write(path: String, values: Array[Float], shape: Seq[Int]): Unit =
    Sinks.withFs(path) { fs =>
      val out = fs.create(new Path(path), true)
      try out.write(float32(values, shape))
      finally out.close()
    }
}

/** TF Object Detection label-map text proto (SURVEY.md W6,
  * `jigsaw/model_utils/base/mask.py:129-146`): items are 1-indexed ints in
  * dictionary order.
  */
object LabelMapSink {

  def render(labelToInt: Seq[(String, Int)]): String =
    labelToInt.sortBy(_._2).map { case (label, id) =>
      s"item {\n  id: $id\n  name: '$label'\n}\n"
    }.mkString("\n")

  def write(path: String, labelToInt: Seq[(String, Int)]): Unit =
    TFRecordSink.writeText(path, render(labelToInt))
}
