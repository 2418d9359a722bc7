package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{LabelDictionary, LabelTransform, Splits}
import graft.sources.{DatasetManifest, FilterLineage, LabelMapSink, TFRecordSink}

/** Dataset write orchestration (SURVEY.md §3.3, `jigsaw/write_dataset.py:
  * 208-237`): produce the documented output tree
  *
  *   dataset/<name>/
  *     test/                       ← shuffled test split TFRecords
  *     splits/complete/train.record-* and test.record-*
  *     label_map.pbtxt
  *     metadata.json               ← lineage manifest
  *
  * mirroring the reference's default (test/ + splits/complete/ only; the
  * fold tree exists in [[graft.operators.Splits.kfold]] for callers that
  * want it — the reference's fold writes are dead code,
  * write_dataset.py:231-237).
  */
object DatasetWriter {

  final case class WriteResult(name: String, numTest: Long, numTrainTest: Long,
      numTrain: Long)

  /** @param examples (image_id, example BINARY) — from DataModel.examples
    * @param labelDict (label, label_int) — from LabelDictionary
    */
  def write(spark: SparkSession, outRoot: String, name: String,
      examples: DataFrame, labelDict: DataFrame,
      user: String, comments: String, trainingType: String,
      filters: Seq[FilterLineage] = Seq.empty,
      transforms: Seq[LabelTransform] = Seq.empty,
      testPercent: Double = 0.2, seed: Long = 42,
      now: java.time.Instant = java.time.Instant.now()): WriteResult = {
    val base = s"$outRoot/$name"
    // W14 destructive replace = overwrite semantics of each sink below.
    val split = Splits.testDevSplit(examples, testPercent, seed, "image_id")
      .cache()
    val test = split.filter(col("split") === "test")
    val dev = split.filter(col("split") === "dev")
    // top-level test/ (write_dataset.py:229: related data for the test set)
    val numTest = TFRecordSink.writeSharded(test, "example",
      s"$base/test", prefix = "test.record")
    // splits/complete: dev re-split 80/20 into train/test records (P4).
    // A dev set of <= 1 row cannot be re-split (the reference contract only
    // errors on the OUTER split) — it all becomes train.
    val devBase = dev.drop("split")
    val devCount = devBase.count()
    val inner =
      if (devCount > 1)
        Splits.testDevSplit(devBase, testPercent, seed + 1, "image_id",
          knownCount = Some(devCount))
      else devBase.withColumn("split", lit("dev"))
    val numTrainTest = TFRecordSink.writeSharded(
      inner.filter(col("split") === "test"), "example",
      s"$base/splits/complete", prefix = "test.record")
    val numTrain = TFRecordSink.writeSharded(
      inner.filter(col("split") === "dev"), "example",
      s"$base/splits/complete", prefix = "train.record")
    // label map + lineage manifest (tiny dimension → driver collect is fine)
    val dict = labelDict.collect()
      .map(r => r.getAs[String]("label") -> r.getAs[Int]("label_int")).toSeq
    LabelMapSink.write(s"$base/label_map.pbtxt", dict)
    val ids = split.select("image_id").orderBy("image_id")
      .collect().map(_.getString(0)).toSeq
    DatasetManifest(name, now, user, comments, trainingType, ids,
      filters, transforms).write(s"$base/metadata.json")
    split.unpersist()
    WriteResult(name, numTest, numTrainTest, numTrain)
  }
}
