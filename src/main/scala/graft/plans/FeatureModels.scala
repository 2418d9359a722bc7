package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{CorpusBinder, TFExample}
import graft.sources.TFExample._

/** Feature-points regression model (`jigsaw/models/feature_points/model.py`):
  * truth is a label→[x,y] centroid map + a pose float list in the meta
  * sidecar; export flattens centroids key-sorted, x's then y's
  * (`:127-129`), and the corpus-wide pixel mean/stdev sidecars come from
  * the Welford aggregate ([[graft.functions.WelfordAggregator]], W13).
  */
object FeaturePointsModel extends DataModel {
  import ModelCodec._
  val trainingType = "Feature Points Regression"

  private val metaSchema =
    "dataset STRING, tags ARRAY<STRING>, pose ARRAY<DOUBLE>, " +
      "truth_centroids MAP<STRING, ARRAY<BIGINT>>"

  /** Full meta read (tags + truth fields) joined with the image bytes. */
  def bind(spark: SparkSession, dir: String,
      selectedIds: Option[DataFrame]): DataFrame = {
    val meta = spark.read
      .option("multiLine", "true")
      .option("pathGlobFilter", "meta_*.json")
      .schema(metaSchema)
      .json(dir)
      .withColumn("image_id",
        regexp_extract(input_file_name(), "meta_([^/]+?)\\.json$", 1))
      .select("image_id", "pose", "truth_centroids")
    val base = selectedIds match {
      case Some(ids) => meta.join(ids, Seq("image_id"), "left_semi")
      case None => meta
    }
    CorpusBinder.withImageMeta(
      base.join(CorpusBinder.images(spark, dir), Seq("image_id"), "left"))
  }

  /** F10 schema check (`feature_points/model.py:123-126`): every image's
    * centroid key set must equal the first image's. Throws on drift.
    */
  def validateCentroidKeys(bound: DataFrame): Unit = {
    val distinctKeySets = bound
      .select(sort_array(map_keys(col("truth_centroids"))).as("ks"))
      .distinct().limit(2).collect()
    require(distinctKeySets.length <= 1,
      s"inconsistent truth_centroids keys across images: " +
        distinctKeySets.map(_.toString).mkString(" vs "))
  }

  /** W13 additional files (`feature_points/model.py:103-113`): decode each
    * image to a feature tensor (stubbed decode in-container), aggregate
    * per-element mean/stdev with the distributed Welford aggregate, and
    * write `mean.npy` + `stdev.npy` + `feature_points.json` (the sorted
    * centroid-key order used by the exporter).
    */
  def writeAdditionalFiles(bound: DataFrame, outDir: String,
      dim: Int = 64): graft.functions.WelfordResult = {
    import graft.functions.WelfordAggregator
    import graft.operators.Multimodal
    import graft.sources.NpyWriter
    val tensors = Multimodal.decodeToTensor(
      bound.select("image_id", "image"), "image", dim, "image_id")
    val res = tensors
      .agg(WelfordAggregator.of(col("tensor")).as("w"))
      .select("w.*")
      .as(org.apache.spark.sql.Encoders.product[graft.functions.WelfordResult])
      .collect().head
    NpyWriter.write(s"$outDir/mean.npy",
      res.mean.map(_.toFloat).toArray, Seq(dim))
    NpyWriter.write(s"$outDir/stdev.npy",
      res.stdev.map(_.toFloat).toArray, Seq(dim))
    val keys = bound
      .select(explode(map_keys(col("truth_centroids"))).as("k"))
      .distinct().orderBy("k")
      .collect().map(r => graft.sources.Manifest.renderJsonString(
        r.getString(0))).mkString("[", ", ", "]")
    graft.sources.Sinks.writeTextFile(s"$outDir/feature_points.json", keys)
    res
  }

  /** Features per feature_points/model.py:131-148: dims, id, image bytes,
    * format, `feature_points` = key-sorted x's then y's, pose floats.
    */
  def exportExample(row: Row): Array[Byte] = {
    val meta = Option(row.getAs[Row]("image_meta"))
    val centroids = Option(
      row.getAs[scala.collection.Map[String, scala.collection.Seq[Long]]](
        "truth_centroids")).getOrElse(Map.empty)
    val sortedKeys = centroids.keys.toSeq.sorted
    val xs = sortedKeys.map(k => centroids(k).head)
    val ys = sortedKeys.map(k => centroids(k)(1))
    val pose = Option(row.getAs[scala.collection.Seq[Double]]("pose"))
      .map(_.toSeq).getOrElse(Seq.empty)
    TFExample.serialize(Map(
      "height" -> Int64Feature(Seq(
        meta.map(_.getAs[Int]("height").toLong).getOrElse(0L))),
      "width" -> Int64Feature(Seq(
        meta.map(_.getAs[Int]("width").toLong).getOrElse(0L))),
      "image_id" -> FeatureValue.bytes(row.getAs[String]("image_id")),
      "image_data" -> FeatureValue.bytes(bytesOf(row, "image")),
      "format" -> FeatureValue.bytes(
        Option(row.getAs[String]("image_type")).getOrElse("png")),
      "feature_points" -> Int64Feature(xs ++ ys),
      "pose" -> FloatFeature(pose.map(_.toFloat))))
  }
}

/** Instance-segmentation model (`jigsaw/models/instance_mask/model.py`):
  * bbox features plus a per-instance mask list. Instance discovery on real
  * pixel grids is [[graft.operators.PixelOps.instanceBoxes]] (tolerance
  * match → connected components), fed by the real JDK decode
  * ([[graft.sources.ImageCodec]]); the exporter also accepts boxes from
  * the VOC sidecar when present and emits the raw mask bytes per instance. The reference's `panel_left/panel_right →
  * solar_panel` rewrite (F9, `:84-85`) is applied as a label transform.
  */
object InstanceMaskModel extends DataModel {
  import ModelCodec._
  val trainingType = "Instance Segmentation"

  def bind(spark: SparkSession, dir: String,
      selectedIds: Option[DataFrame]): DataFrame = {
    val bound = BBoxModel.bind(spark, dir, selectedIds)
    // F9 hard-coded rewrite, expressed as a per-box transform
    bound.withColumn("boxes",
      transform(col("boxes"), b => struct(
        when(b.getField("label").isin("panel_left", "panel_right"),
          "solar_panel").otherwise(b.getField("label")).as("label"),
        b.getField("xmin").as("xmin"), b.getField("ymin").as("ymin"),
        b.getField("xmax").as("xmax"), b.getField("ymax").as("ymax"))))
  }

  def exportExample(row: Row): Array[Byte] = {
    val base = BBoxModel.exportExample(row)
    val boxes = Option(row.getAs[scala.collection.Seq[Row]]("boxes"))
      .map(_.toSeq).getOrElse(Seq.empty)
    // re-serialize with the per-instance mask list appended
    val mask = bytesOf(row, "mask")
    val withMasks = TFExample.serialize(Map(
      "image/object/mask" -> BytesFeature(boxes.map(_ => mask))))
    base ++ withMasks // protobuf messages concatenate by field merge
  }

  /** W4's `verbose_write` debug side-output
    * (`/root/reference/jigsaw/models/instance_mask/model.py:173-175`,
    * flag prompt at `jigsaw/cli.py:100-101`): alongside the TFExample
    * export, dump each exported instance mask as its own PNG under
    * `outDir/<image_id>/<i>.png` so a human can eyeball what the model
    * will train on. Two deliberate divergences, both strict
    * improvements on a debug artifact: the destination is
    * caller-supplied (the reference hard-codes
    * `~/Desktop/jigsaw_instance_masks/`, meaningless on a cluster) and
    * files are named by instance INDEX instead of a fresh uuid, so
    * reruns overwrite rather than accumulate and tests can count them.
    * The per-instance bytes follow [[exportExample]]'s documented stub
    * (the row's mask once per box). Runs as a `foreachPartition`
    * side-write carrying the session's Hadoop configuration — any
    * Hadoop filesystem target works, and no masks ever collect to the
    * driver.
    */
  def verboseDumpMasks(df: DataFrame, outDir: String): Unit = {
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col("image_id"), col("mask"),
        size(coalesce(col("boxes"), array())).as("_nb"))
      .foreachPartition { (rows: Iterator[Row]) =>
        // newInstance, not get: FileSystem.get returns the JVM-cached
        // shared instance per scheme/authority, so setWriteChecksum
        // would leak to every other writer using that filesystem for
        // the rest of the executor's life — a debug artifact must not
        // reconfigure shared state
        val fs = org.apache.hadoop.fs.FileSystem
          .newInstance(new java.net.URI(outDir), serConf.value)
        try {
          fs.setWriteChecksum(false)
          rows.foreach { r =>
            val id = r.getString(0)
            val mask = r.getAs[Array[Byte]](1)
            // a row with no mask sidecar (null bytes) has nothing to
            // dump — skipping mirrors the export path, which emits an
            // empty mask list for it rather than failing the batch
            if (mask != null) {
              var i = 0
              while (i < r.getInt(2)) {
                val out = fs.create(
                  new org.apache.hadoop.fs.Path(s"$outDir/$id/$i.png"),
                  true)
                try out.write(mask)
                finally out.close()
                i += 1
              }
            }
          }
        } finally fs.close()
      }
  }
}

/** Deeplab semantic-segmentation model (`jigsaw/models/deeplab/model.py:
  * 17-44`): the mask becomes a grayscale class-id image via the label
  * dictionary — REAL end-to-end: [[classIdMaskPng]] decodes the color
  * mask with the JDK codec, runs
  * [[graft.operators.PixelOps.classIdImage]], and re-encodes an 8-bit
  * grayscale PNG. Run [[withClassMask]] before export to emit it.
  */
object DeeplabModel extends DataModel {
  import ModelCodec._
  val trainingType = "Deeplab Semantic Segmentation"

  def bind(spark: SparkSession, dir: String,
      selectedIds: Option[DataFrame]): DataFrame =
    SemanticMaskModel.bind(spark, dir, selectedIds)

  /** T10 realized with real codecs: decode the BGR color mask, map colors
    * → class ids ([[graft.operators.PixelOps.classIdImage]]), re-encode as
    * 8-bit grayscale PNG. None if the mask bytes don't decode.
    */
  def classIdMaskPng(maskBytes: Array[Byte],
      colorToClass: Map[(Int, Int, Int), Int]): Option[Array[Byte]] =
    graft.sources.ImageCodec.decodeBgr(maskBytes).map { case (w, h, px) =>
      graft.sources.ImageCodec.encodeGrayPng(w, h,
        graft.operators.PixelOps.classIdImage(px, w, h, colorToClass))
    }

  /** Attach the grayscale class-id mask (`class_mask` column) derived from
    * the color mask — run before [[exportExample]] so the export emits the
    * true deeplab wire format. The color→class dictionary is the corpus
    * label map (a global dimension, broadcast inside the UDF closure).
    */
  def withClassMask(df: DataFrame,
      colorToClass: Map[(Int, Int, Int), Int]): DataFrame = {
    val toClassMask = org.apache.spark.sql.functions.udf(
      (bytes: Array[Byte]) => classIdMaskPng(bytes, colorToClass).orNull)
    df.withColumn("class_mask",
      toClassMask(org.apache.spark.sql.functions.col("mask")))
  }

  def exportExample(row: Row): Array[Byte] = {
    val meta = Option(row.getAs[Row]("image_meta"))
    // emit the real class-id mask when the caller ran withClassMask. A row
    // whose class_mask is null (mask failed to decode) emits EMPTY bytes —
    // detectable by any consumer — NEVER the raw color-mask bytes, which
    // would be silently misread as class ids. Without withClassMask the
    // legacy raw-mask passthrough applies (documented weaker form).
    val hasClassMask = row.schema != null &&
      row.schema.fieldNames.contains("class_mask")
    val segMask =
      if (hasClassMask) {
        if (row.isNullAt(row.fieldIndex("class_mask"))) Array.empty[Byte]
        else row.getAs[Array[Byte]]("class_mask")
      } else bytesOf(row, "mask")
    TFExample.serialize(Map(
      "image/height" -> Int64Feature(Seq(
        meta.map(_.getAs[Int]("height").toLong).getOrElse(0L))),
      "image/width" -> Int64Feature(Seq(
        meta.map(_.getAs[Int]("width").toLong).getOrElse(0L))),
      "image/encoded" -> FeatureValue.bytes(bytesOf(row, "image")),
      "image/format" -> FeatureValue.bytes(
        Option(row.getAs[String]("image_type")).getOrElse("png")),
      "image/segmentation/class/encoded" -> FeatureValue.bytes(segMask),
      "image/segmentation/class/format" -> FeatureValue.bytes("png")))
  }
}
