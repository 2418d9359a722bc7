package graft.sources

import graft.operators.LabelTransform

/** Dataset lineage manifest (SURVEY.md W7, `jigsaw/write_dataset.py:241-277`):
  * records what went into a dataset build — named filter groups with their
  * ordered AND/OR tag filters and sampled sizes, plus the ordered label
  * transforms — as `metadata.json`. Lineage tracking is a first-class engine
  * feature, not an afterthought.
  */
final case class FilterLineage(
    setName: String,
    steps: Seq[(String, Seq[String])], // (filter type "and"/"or", tags)
    numberIncluded: Long)

final case class DatasetManifest(
    name: String,
    dateCreated: java.time.Instant,
    user: String,
    comments: String,
    trainingType: String,
    imageIds: Seq[String],
    filters: Seq[FilterLineage],
    transforms: Seq[LabelTransform]) {

  def toJson: String = {
    import Manifest.{jArr, jStr}
    val filterJson = filters.map { f =>
      s"""{"group": ${jStr(f.setName)}, "filters": ${
        jArr(f.steps.map { case (tpe, tags) =>
          s"""{"type": ${jStr(tpe)}, "tags": ${jArr(tags.map(jStr))}}"""
        })
      }, "number_included": ${f.numberIncluded}}"""
    }
    val transformJson = transforms.map(t =>
      s"""{"transform": ${jStr(t.describe)}}""")
    val ts = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
      .withZone(java.time.ZoneOffset.UTC).format(dateCreated)
    s"""{
       |  "name": ${jStr(name)},
       |  "date_created": ${jStr(ts)},
       |  "created_by": ${jStr(user)},
       |  "comments": ${jStr(comments)},
       |  "training_type": ${jStr(trainingType)},
       |  "image_ids": ${jArr(imageIds.map(jStr))},
       |  "filters": ${jArr(filterJson)},
       |  "transforms": ${jArr(transformJson)}
       |}""".stripMargin
  }

  def write(path: String): Unit = TFRecordSink.writeText(path, toJson)
}

object Manifest {
  /** JSON-escape and quote a string. */
  def renderJsonString(s: String): String = jStr(s)

  private[sources] def jStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private[sources] def jArr(items: Seq[String]): String =
    items.mkString("[", ", ", "]")
}
