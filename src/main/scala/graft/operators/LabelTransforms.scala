package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Label-space transforms (SURVEY.md §2.6) — the reference's "UPDATE"
  * operators re-expressed as pure column rewrites.
  *
  * Reference: rename (`jigsaw/model_utils/base/mask.py:149-174`), merge
  * (`:176-216`), bbox variants (`jigsaw/models/bbox/model.py:194-254`),
  * pipeline executor applying ALL transforms in one pass "to limit I/O"
  * (`jigsaw/model_utils/transforms.py:43-93`).
  *
  * The ordered transform list compiles into ONE nested `when` expression, so
  * the whole pipeline is a single projection — WholeStageCodegen fuses it;
  * the reference's hand-rolled operator fusion comes free. Rename-onto-an-
  * existing-label degrades to a merge exactly as in the reference, because
  * downstream consumers group by the rewritten label.
  */
sealed trait LabelTransform {
  def describe: String
}
final case class Rename(original: String, to: String) extends LabelTransform {
  def describe = s"rename $original -> $to"
}
final case class Merge(originals: Seq[String], to: String)
    extends LabelTransform {
  def describe = s"merge ${originals.mkString(",")} -> $to"
}

object LabelTransforms {

  /** Compile an ordered transform list into a single Column rewrite of
    * `labelCol`. Order matters: each transform sees the previous one's
    * output (transforms.py:48-51 contract).
    */
  def compile(labelCol: Column, transforms: Seq[LabelTransform]): Column =
    transforms.foldLeft(labelCol) { (acc, t) =>
      t match {
        case Rename(orig, to) => when(acc === orig, lit(to)).otherwise(acc)
        case Merge(origs, to) =>
          when(acc.isin(origs.map(_.asInstanceOf[Any]): _*), lit(to))
            .otherwise(acc)
      }
    }

  /** T1/T3/T5: apply the compiled rewrite to a label column. */
  def applyTo(df: DataFrame, labelCol: String,
      transforms: Seq[LabelTransform]): DataFrame =
    df.withColumn(labelCol, compile(col(labelCol), transforms))

  /** T4/A4: after a merge, collapse each (key, label) group's boxes into one
    * envelope box — (min xmin, max xmax, min ymin, max ymax)
    * (`jigsaw/models/bbox/model.py:231-252`; the reference version crashes on
    * a bare `cls` at :252 — not replicated).
    */
  def mergeEnvelope(boxes: DataFrame, key: String = "image_id",
      labelCol: String = "label"): DataFrame =
    boxes.groupBy(col(key), col(labelCol))
      .agg(
        min("xmin").as("xmin"), max("xmax").as("xmax"),
        min("ymin").as("ymin"), max("ymax").as("ymax"))
}

/** T7: label→int dictionary as a derived dimension instead of mutable global
  * state (`jigsaw/model_utils/base/mask.py:319-338`). Ints are 1..N in
  * first-appearance order (insertion order in the reference; here defined by
  * the minimum of `orderCol`, which is deterministic under parallelism).
  * Renumbering after add/delete is automatic — the dimension is recomputed
  * from the data. Broadcast-join it wherever `label_int` is needed.
  */
object LabelDictionary {

  def fromLabels(df: DataFrame, labelCol: String = "label",
      orderCol: String = "image_id"): DataFrame = {
    val firstSeen = df.groupBy(col(labelCol))
      .agg(min(col(orderCol)).as("_first_seen"))
    // |labels| is small (a dimension): single-partition numbering is the
    // right plan. An unpartitioned window would emit the same plan but
    // with WindowExec's no-partition warning (a constant partitionBy(lit)
    // doesn't help — ConstantFolding erases it); instead shuffle the tiny
    // agg result to one partition, sort it there, and number rows with
    // monotonically_increasing_id (= the in-partition row offset).
    firstSeen
      .repartition(1)
      .sortWithinPartitions(col("_first_seen"), col(labelCol))
      .withColumn("label_int",
        (monotonically_increasing_id() + 1).cast("int"))
      .select(col(labelCol), col("label_int"))
  }
}
