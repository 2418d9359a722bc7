package graft.sources

import scala.xml.{Elem, XML}

/** PASCAL VOC annotation XML codec (SURVEY.md S10/W11; read at
  * `jigsaw/models/bbox/model.py:173-191`, written at `:256-306`). Uses
  * scala-xml (ships with Spark). Codec is row-level: parse/render one
  * annotation string — used inside a UDF or a mapPartitions over
  * binaryFile-scanned sidecars.
  */
final case class VocBox(label: String, xmin: Int, ymin: Int, xmax: Int,
    ymax: Int)

final case class VocAnnotation(filename: String, width: Int, height: Int,
    depth: Int, boxes: Seq[VocBox])

object VocXml {

  def parse(xml: String): VocAnnotation = {
    val root = XML.loadString(xml)
    val size = root \ "size"
    VocAnnotation(
      filename = (root \ "filename").text,
      width = (size \ "width").text.trim.toInt,
      height = (size \ "height").text.trim.toInt,
      depth = (size \ "depth").text.trim.toIntOption.getOrElse(3),
      boxes = (root \ "object").map { o =>
        val b = o \ "bndbox"
        VocBox(
          label = (o \ "name").text,
          xmin = (b \ "xmin").text.trim.toDouble.toInt,
          ymin = (b \ "ymin").text.trim.toDouble.toInt,
          xmax = (b \ "xmax").text.trim.toDouble.toInt,
          ymax = (b \ "ymax").text.trim.toDouble.toInt)
      })
  }

  def render(a: VocAnnotation): String = {
    val elem: Elem =
      <annotation verified="yes">
        <folder>images</folder>
        <filename>{a.filename}</filename>
        <path>{a.filename}</path>
        <source><database>Unknown</database></source>
        <size>
          <width>{a.width}</width>
          <height>{a.height}</height>
          <depth>{a.depth}</depth>
        </size>
        <segmented>0</segmented>
        {a.boxes.map(b =>
          <object>
            <name>{b.label}</name>
            <pose>Unspecified</pose>
            <truncated>0</truncated>
            <difficult>0</difficult>
            <bndbox>
              <xmin>{b.xmin}</xmin>
              <ymin>{b.ymin}</ymin>
              <xmax>{b.xmax}</xmax>
              <ymax>{b.ymax}</ymax>
            </bndbox>
          </object>)}
      </annotation>
    val printer = new scala.xml.PrettyPrinter(120, 2)
    printer.format(elem)
  }
}
