package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityModel

class QualityModelSpec extends SparkTestBase {
  import spark.implicits._

  // two disjoint token spaces: "prose" drawn from a 30-word vocabulary,
  // "gibberish" from a disjoint one — linearly separable by
  // construction, so a trained filter that fails the floors below is
  // broken, not unlucky
  private val proseVocab = (1 to 30).map(i => s"word$i")
  private val junkVocab = (1 to 30).map(i => s"zx$i")
  private def doc(vocab: Seq[String], seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
  }

  test("quality classifier separates reference prose from gibberish on " +
      "held-out docs, survives a save/load round-trip, and scores " +
      "map-only") {
    val train = ((1 to 200).map(i => (doc(proseVocab, i), 1)) ++
      (1 to 200).map(i => (doc(junkVocab, 1000 + i), 0)))
      .toDF("text", "label")
    val heldOut = ((1 to 50).map(i => (5000L + i, doc(proseVocab,
        5000 + i), 1)) ++
      (1 to 50).map(i => (6000L + i, doc(junkVocab, 6000 + i), 0)))
      .toDF("doc_id", "text", "truth")
    val clf = QualityModel.train(train, "text", "label",
      numFeatures = 1 << 12)
    assert(clf.numFeatures == (1 << 12))

    val scored = QualityModel.score(heldOut, clf, "text")
    assert(scored.columns.toSeq ==
      Seq("doc_id", "text", "truth", "quality_prob"))
    val rows = scored.select("truth", "quality_prob")
      .as[(Int, Double)].collect()
    val acc = rows.count { case (t, p) =>
      (p >= 0.5) == (t == 1) }.toDouble / rows.length
    assert(acc >= 0.95, s"held-out accuracy $acc under the 0.95 floor")
    val meanGood = rows.filter(_._1 == 1).map(_._2).sum / 50
    val meanJunk = rows.filter(_._1 == 0).map(_._2).sum / 50
    assert(meanGood > 0.9 && meanJunk < 0.1,
      s"prose $meanGood vs junk $meanJunk must separate cleanly")

    // null/empty text scores (intercept-only), never throws
    val edge = QualityModel.score(
      Seq((1L, null.asInstanceOf[String]), (2L, ""))
        .toDF("doc_id", "text"), clf, "text")
      .select("quality_prob").as[Double].collect()
    assert(edge.length == 2 && edge.forall(p => p >= 0.0 && p <= 1.0))

    // persistence round-trip reproduces the scores exactly (same
    // coefficients, same kernel)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-quality-clf").toString
    QualityModel.save(clf, dir)
    val re = QualityModel.load(spark, dir)
    assert(re.numFeatures == clf.numFeatures)
    val reScores = QualityModel.score(heldOut, re, "text")
      .select("doc_id", "quality_prob").as[(Long, Double)]
      .collect().toMap
    val orig = scored.select("doc_id", "quality_prob")
      .as[(Long, Double)].collect().toMap
    assert(orig.keySet == reScores.keySet &&
      orig.forall { case (k, v) => v == reScores(k) })

    // scoring is map-only: featurize + model transform fuse into the
    // scan, no Exchange — the 100 TB filter shape
    val plan = QualityModel.score(heldOut, clf, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"quality scoring must stay map-only:\n$plan")

    // re-scoring an already-scored frame fails loud (a duplicate
    // quality_prob column would make downstream references ambiguous)
    val reScore = intercept[IllegalArgumentException] {
      QualityModel.score(scored, clf, "text")
    }
    assert(reScore.getMessage.contains("quality_prob"),
      reScore.getMessage)

    // score() never mutates the caller's model: the internal column
    // Params are set on a copy, so the shared model's Param state is
    // untouched after every score call above (featuresCol is "_feat"
    // from TRAINING; the score-only names must never appear)
    assert(clf.model.getOrDefault(clf.model.probabilityCol) != "_prob" &&
      clf.model.getOrDefault(clf.model.predictionCol) != "_pred" &&
      clf.model.getOrDefault(clf.model.rawPredictionCol) != "_raw",
      "score must set its column names on a copy, not the shared model")
    // and concurrent scoring over the same classifier is stable
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val concurrent = Await.result(
      Future.sequence((1 to 4).toList.map(_ => Future {
        QualityModel.score(heldOut, clf, "text")
          .select("doc_id", "quality_prob").as[(Long, Double)]
          .collect().toMap
      })), 5.minutes)
    assert(concurrent.forall(_ == orig),
      "concurrent score calls must agree with the serial result")
  }
}
