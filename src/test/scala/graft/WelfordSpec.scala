package graft

import org.apache.spark.sql.functions._

import graft.functions.{WelfordAggregator, WelfordResult}

class WelfordSpec extends SparkTestBase {
  import spark.implicits._

  test("distributed Welford matches brute-force mean/stdev per element") {
    val rnd = new scala.util.Random(7)
    val tensors = Seq.fill(200)(Seq.fill(5)(rnd.nextFloat() * 10))
    val df = tensors.toDF("t").repartition(8) // force real merges
    val res = df.agg(WelfordAggregator.of($"t").as("w"))
      .select("w.*").as[WelfordResult].collect().head
    assert(res.count == 200)
    for (i <- 0 until 5) {
      val xs = tensors.map(_(i).toDouble)
      val mean = xs.sum / xs.size
      val stdev = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / xs.size)
      assert(math.abs(res.mean(i) - mean) < 1e-9,
        s"mean[$i] ${res.mean(i)} vs $mean")
      assert(math.abs(res.stdev(i) - stdev) < 1e-9)
    }
  }

  test("groupBy Welford: independent state per group") {
    val df = Seq(
      ("g1", Seq(1.0f, 10.0f)), ("g1", Seq(3.0f, 30.0f)),
      ("g2", Seq(100.0f, 0.0f)))
      .toDF("g", "t")
    val res = df.groupBy("g").agg(WelfordAggregator.of($"t").as("w"))
      .select($"g", $"w.mean"(0).as("m0"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(res("g1") == 2.0 && res("g2") == 100.0)
  }

  test("shape mismatch raises (F10 contract)") {
    val df = Seq(Seq(1.0f, 2.0f), Seq(1.0f)).toDF("t").coalesce(1)
    val e = intercept[Exception] {
      df.agg(WelfordAggregator.of($"t")).collect()
    }
    assert(e.getMessage != null)
  }
}
