package graft

import graft.operators._

class LabelTransformsSpec extends SparkTestBase {
  import spark.implicits._

  test("rename and merge rewrite labels; order of transforms matters") {
    val df = Seq("a", "b", "c", "d").toDF("label")
    val out = LabelTransforms.applyTo(df, "label",
        Seq(Rename("a", "b"), Merge(Seq("b", "c"), "m")))
      .as[String].collect().toList
    // a→b (rename) then b,c→m (merge): a,b,c all end at m
    assert(out == List("m", "m", "m", "d"))
    // reversed order: merge first (b,c→m), then a→b stays b
    val out2 = LabelTransforms.applyTo(df, "label",
        Seq(Merge(Seq("b", "c"), "m"), Rename("a", "b")))
      .as[String].collect().toList
    assert(out2 == List("b", "m", "m", "d"))
  }

  test("rename onto an existing label behaves as a merge after groupBy") {
    val df = Seq(("i1", "a"), ("i1", "b"), ("i2", "a"))
      .toDF("image_id", "label")
    val renamed = LabelTransforms.applyTo(df, "label", Seq(Rename("a", "b")))
    val grouped = renamed.groupBy("image_id", "label").count()
    assert(grouped.filter($"image_id" === "i1").count() == 1) // collapsed
  }

  test("mergeEnvelope collapses boxes to (min xmin, max xmax, min ymin, max ymax)") {
    val boxes = Seq(
      ("i1", "car", 10, 20, 5, 15),
      ("i1", "car", 12, 30, 2, 10),
      ("i1", "tree", 0, 1, 0, 1))
      .toDF("image_id", "label", "xmin", "xmax", "ymin", "ymax")
    val env = LabelTransforms.mergeEnvelope(boxes)
    val car = env.filter($"label" === "car").collect().head
    assert(car.getAs[Int]("xmin") == 10 && car.getAs[Int]("xmax") == 30)
    assert(car.getAs[Int]("ymin") == 2 && car.getAs[Int]("ymax") == 15)
    assert(env.count() == 2)
  }

  test("LabelDictionary numbers labels 1..N in first-appearance order") {
    val df = Seq(("i3", "zebra"), ("i1", "apple"), ("i2", "mango"),
      ("i4", "apple")).toDF("image_id", "label")
    val dict = LabelDictionary.fromLabels(df)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // first-seen by min(image_id): apple@i1, mango@i2, zebra@i3
    assert(dict == Map("apple" -> 1, "mango" -> 2, "zebra" -> 3))
  }
}
