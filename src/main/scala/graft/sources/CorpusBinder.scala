package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sidecar-file corpus binding (SURVEY.md S2/S8-S12/J2): assemble the
  * labeled-image "table" from per-suffix file relations joined on
  * `image_id`.
  *
  * Scale design mirrors the reference's own hand-rolled optimization
  * (metadata first, wide binary data only for surviving ids,
  * `filters.py:147,258-278`): each suffix is its OWN relation, so Catalyst's
  * column pruning skips entire file groups when a query never touches them,
  * and the binary image/mask relations can be semi-joined down to a selected
  * id set BEFORE their bytes are read into the plan.
  *
  * File-naming contract (docs/Labeled_Image_File_Structure.md:4-12):
  *   image_<id>.{png,jpg,jpeg} | mask_<id>.png | labels_<id>.csv |
  *   meta_<id>.json | bboxLabels_<id>.xml
  */
object CorpusBinder {

  private def idFromPath(prefix: String): org.apache.spark.sql.Column =
    regexp_extract(col("path"), s"$prefix" + "_([^/]+?)\\.[A-Za-z]+$$", 1)

  /** binaryFile scan of one sidecar kind; filename predicate pushed to the
    * file listing via pathGlobFilter (F3).
    */
  private def binarySidecar(spark: SparkSession, dir: String, prefix: String,
      glob: String, bytesName: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(idFromPath(prefix).as("image_id"),
        col("content").as(bytesName),
        regexp_extract(col("path"), "\\.([A-Za-z]+)$", 1)
          .as(s"${bytesName}_type"))

  def images(spark: SparkSession, dir: String): DataFrame =
    binarySidecar(spark, dir, "image", "image_*.{png,jpg,jpeg}", "image")

  def masks(spark: SparkSession, dir: String): DataFrame =
    binarySidecar(spark, dir, "mask", "mask_*.png", "mask")
      .drop("mask_type")

  /** labels_<id>.csv → (image_id, label, R, G, B) rows (S8). */
  def labels(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("pathGlobFilter", "labels_*.csv")
      .schema("label STRING, R INT, G INT, B INT")
      .csv(dir)
      .withColumn("image_id",
        regexp_extract(input_file_name(), "labels_([^/]+?)\\.csv$", 1))
      .select("image_id", "label", "R", "G", "B")

  /** bboxLabels_<id>.xml → exploded VOC boxes (S10). */
  def vocBoxes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "bboxLabels_*.xml")
      .load(dir)
      .select(idFromPath("bboxLabels").as("image_id"),
        col("content").cast("string").as("xml"))
      .as[(String, String)]
      .flatMap { case (id, xml) =>
        val a = VocXml.parse(xml)
        a.boxes.map(b => (id, a.width, a.height, b.label,
          b.xmin, b.ymin, b.xmax, b.ymax))
      }
      .toDF("image_id", "width", "height", "label",
        "xmin", "ymin", "xmax", "ymax")
  }

  /** Image-dimension metadata from real header parsing (S11 analog —
    * pixel decode is stubbed at the Multimodal layer).
    */
  def withImageMeta(imagesDf: DataFrame, bytesCol: String = "image",
      outputCol: String = "image_meta"): DataFrame = {
    val parseUdf = udf((bytes: Array[Byte]) => ImageHeaders.parse(bytes))
    imagesDf.withColumn(outputCol, parseUdf(col(bytesCol)))
  }

  /** S6 prefix (partition) discovery (`jigsaw/io_utils.py:434-442`): list
    * the immediate sub-prefixes ("folders") of a corpus root — the
    * partition-selection surface for prefix-organized corpora (local or
    * object store; Hadoop FS is URI-agnostic).
    */
  def listPrefixes(spark: SparkSession, rootDir: String): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(rootDir),
      spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(rootDir))
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .sorted.toSeq
  }

  /** Small-files consolidation (the reference's actual physical bottleneck,
    * SURVEY.md §4): snapshot the bound sidecar corpus into ONE partitioned
    * parquet table so downstream queries scan consolidated columnar data
    * instead of millions of tiny sidecar files. Binary columns ride along;
    * Catalyst prunes them when untouched.
    */
  def consolidate(spark: SparkSession, dir: String, outPath: String,
      selectedIds: Option[DataFrame] = None): Unit =
    bind(spark, dir, selectedIds)
      .write.mode("overwrite").parquet(outPath)

  def loadConsolidated(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** W8 related-data copier (`jigsaw/data_interface.py:114-124`,
    * `write_dataset.py:200-205`): copy every sidecar file of the selected
    * ids into `destDir`. Distributed: binaryFile scan semi-joined to the id
    * set, each task streams its files to the target filesystem.
    * Returns the number of files copied.
    */
  def copyRelated(spark: SparkSession, dir: String, selectedIds: DataFrame,
      destDir: String): Long = {
    val all = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*_*.*")
      .load(dir)
      .select(col("path"), col("content"),
        regexp_extract(col("path"),
          "(?:image|mask|labels|meta|bboxLabels)_([^/]+?)\\.[A-Za-z]+$", 1)
          .as("image_id"))
      .join(selectedIds.select("image_id"), Seq("image_id"), "left_semi")
    val copied = spark.sparkContext.longAccumulator("files_copied")
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    all.select("path", "content").foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        // private instance (newInstance + close), not the JVM-shared
        // FileSystem.get one: setWriteChecksum must not leak to other
        // writers in the executor — see Sinks.withFs
        val fs = org.apache.hadoop.fs.FileSystem.newInstance(
          new java.net.URI(destDir), serConf.value)
        try {
          fs.setWriteChecksum(false)
          rows.foreach { r =>
            val name = r.getString(0).split('/').last
            val out = fs.create(
              new org.apache.hadoop.fs.Path(destDir, name), true)
            try out.write(r.getAs[Array[Byte]](1))
            finally out.close()
            copied.add(1)
          }
        } finally fs.close()
    }
    copied.value
  }

  /** S12/J2: bind all sidecars for selected ids. Left joins from metadata;
    * a row with no image is an error row (`image_missing`), matching the
    * reference's construct error (`mask.py:61-113`). Pass `selectedIds` to
    * semi-join-reduce the wide binary scans first (J3).
    */
  def bind(spark: SparkSession, dir: String,
      selectedIds: Option[DataFrame] = None): DataFrame = {
    val meta = graft.operators.TagOps.loadMetadata(spark, dir)
    val base = selectedIds match {
      case Some(ids) => meta.join(ids, Seq("image_id"), "left_semi")
      case None => meta
    }
    val labelsAgg = labels(spark, dir)
      .groupBy("image_id")
      .agg(collect_list(struct(col("label"), col("R"), col("G"), col("B")))
        .as("labels"))
    base
      .join(images(spark, dir), Seq("image_id"), "left")
      .join(masks(spark, dir), Seq("image_id"), "left")
      .join(labelsAgg, Seq("image_id"), "left")
      .withColumn("image_missing", col("image").isNull)
  }
}
