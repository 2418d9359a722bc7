package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{CorpusBinder, TFExample}
import graft.sources.TFExample._

/** Model plugin registry (SURVEY.md §2.10): the reference's `LabeledImage`
  * ABC + YAML-loaded plugins (`jigsaw/data_interface.py:14-65,127-136`,
  * `jigsaw/data_models.yml:1-9`) become a `DataModel` trait — a schema, a
  * binder, and a row→TFExample exporter — registered in a config map.
  *
  * Exporter feature schemas follow the reference's fixed per-model dicts
  * (`mask.py:293-314`, `bbox/model.py:341-354`,
  * `instance_mask/model.py:150-177`, `feature_points/model.py:131-148`).
  */
trait DataModel extends Serializable {
  /** Training-type name (reference `training_type` strings). */
  def trainingType: String

  /** Bind the sidecar corpus into this model's row shape. */
  def bind(spark: SparkSession, dir: String,
      selectedIds: Option[DataFrame] = None): DataFrame

  /** Serialize one bound row to tf.train.Example bytes. */
  def exportExample(row: Row): Array[Byte]

  /** DataFrame of (image_id, example BINARY) ready for the TFRecord sink. */
  def examples(bound: DataFrame): DataFrame = {
    val spark = bound.sparkSession
    import spark.implicits._
    val fn = exportExample _
    bound.rdd.map(r => (r.getAs[String]("image_id"), fn(r)))
      .toDF("image_id", "example")
  }
}

/** Shared helpers for exporters. */
private[plans] object ModelCodec {
  def bytesOf(row: Row, field: String): Array[Byte] = {
    val v = row.getAs[Array[Byte]](field)
    if (v == null) Array.empty else v
  }

  def labelRows(row: Row): Seq[Row] = {
    val v = row.getAs[scala.collection.Seq[Row]]("labels")
    if (v == null) Seq.empty else v.toSeq
  }
}

/** Semantic-segmentation mask model (`jigsaw/model_utils/base/mask.py`). */
object SemanticMaskModel extends DataModel {
  import ModelCodec._
  val trainingType = "Semantic Segmentation"

  def bind(spark: SparkSession, dir: String,
      selectedIds: Option[DataFrame]): DataFrame =
    CorpusBinder.withImageMeta(CorpusBinder.bind(spark, dir, selectedIds))

  /** Features per mask.py:293-314: dims, filename, encoded image, format,
    * class texts (+ the per-class mask PNGs, stubbed to the raw mask bytes
    * since pixel repaint is not available in-container).
    */
  def exportExample(row: Row): Array[Byte] = {
    val meta = Option(row.getAs[Row]("image_meta"))
    val labels = labelRows(row).map(_.getAs[String]("label"))
    TFExample.serialize(Map(
      "image/height" -> Int64Feature(Seq(
        meta.map(_.getAs[Int]("height").toLong).getOrElse(0L))),
      "image/width" -> Int64Feature(Seq(
        meta.map(_.getAs[Int]("width").toLong).getOrElse(0L))),
      "image/filename" -> FeatureValue.bytes(
        s"image_${row.getAs[String]("image_id")}"),
      "image/source_id" -> FeatureValue.bytes(row.getAs[String]("image_id")),
      "image/encoded" -> FeatureValue.bytes(bytesOf(row, "image")),
      "image/format" -> FeatureValue.bytes(
        Option(row.getAs[String]("image_type")).getOrElse("png")),
      "image/object/class/text" -> BytesFeature(
        labels.map(_.getBytes("UTF-8"))),
      "image/object/mask" -> BytesFeature(Seq(bytesOf(row, "mask")))))
  }
}

/** Bounding-box model (`jigsaw/models/bbox/model.py`): normalized coords. */
object BBoxModel extends DataModel {
  import ModelCodec._
  val trainingType = "Bounding Box"

  def bind(spark: SparkSession, dir: String,
      selectedIds: Option[DataFrame]): DataFrame = {
    val boxes = CorpusBinder.vocBoxes(spark, dir)
      .groupBy("image_id")
      .agg(first("width").as("width"), first("height").as("height"),
        collect_list(struct(col("label"), col("xmin"), col("ymin"),
          col("xmax"), col("ymax"))).as("boxes"))
    CorpusBinder.bind(spark, dir, selectedIds)
      .join(boxes, Seq("image_id"), "left")
  }

  /** bbox/model.py:333-354: box coords normalized by image dims (F8). */
  def exportExample(row: Row): Array[Byte] = {
    val w = row.getAs[Int]("width").toFloat
    val h = row.getAs[Int]("height").toFloat
    val boxes = Option(row.getAs[scala.collection.Seq[Row]]("boxes"))
      .map(_.toSeq).getOrElse(Seq.empty)
    TFExample.serialize(Map(
      "image/height" -> Int64Feature(Seq(h.toLong)),
      "image/width" -> Int64Feature(Seq(w.toLong)),
      "image/source_id" -> FeatureValue.bytes(row.getAs[String]("image_id")),
      "image/encoded" -> FeatureValue.bytes(bytesOf(row, "image")),
      "image/format" -> FeatureValue.bytes(
        Option(row.getAs[String]("image_type")).getOrElse("png")),
      "image/object/bbox/xmin" -> FloatFeature(
        boxes.map(_.getAs[Int]("xmin") / w)),
      "image/object/bbox/xmax" -> FloatFeature(
        boxes.map(_.getAs[Int]("xmax") / w)),
      "image/object/bbox/ymin" -> FloatFeature(
        boxes.map(_.getAs[Int]("ymin") / h)),
      "image/object/bbox/ymax" -> FloatFeature(
        boxes.map(_.getAs[Int]("ymax") / h)),
      "image/object/class/text" -> BytesFeature(
        boxes.map(_.getAs[String]("label").getBytes("UTF-8")))))
  }
}

object DataModels {
  /** Registry, config-name → model (reference data_models.yml names). */
  val registry: Map[String, DataModel] = Map(
    "semantic_mask" -> SemanticMaskModel,
    "bbox" -> BBoxModel,
    "instance_mask" -> InstanceMaskModel,
    "feature_points" -> FeaturePointsModel,
    "deeplab" -> DeeplabModel)
}
