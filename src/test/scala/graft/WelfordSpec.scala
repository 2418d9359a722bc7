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

  test("property: result is invariant under partitioning and row order") {
    // the Chan merge is the one numerical algorithm whose DISTRIBUTED
    // correctness the oracle exercises at a single fixed layout; this pins
    // it for arbitrary layouts — any partitioning of any permutation of
    // the input must produce the identical (count, mean, stdev)
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genCase = for {
      n <- Gen.choose(1, 60)
      d <- Gen.choose(1, 5)
      rows <- Gen.listOfN(n, Gen.listOfN(d, Gen.chooseNum(-100.0f, 100.0f)))
      k <- Gen.choose(1, 12)
      permSeed <- Gen.choose(0L, Long.MaxValue)
    } yield (rows, k, permSeed)
    def run(rows: Seq[Seq[Float]], partitions: Int): WelfordResult =
      rows.toDF("t").repartition(partitions)
        .agg(WelfordAggregator.of($"t").as("w"))
        .select("w.*").as[WelfordResult].collect().head
    def close(a: Seq[Double], b: Seq[Double]): Boolean =
      a.size == b.size && a.zip(b).forall { case (x, y) =>
        math.abs(x - y) <= 1e-9 * (1.0 + math.abs(x).max(math.abs(y)))
      }
    val prop = Prop.forAll(genCase) { case (rows, k, permSeed) =>
      val baseline = run(rows, 1)
      val repartitioned = run(rows, k)
      val permuted = run(new scala.util.Random(permSeed).shuffle(rows), k)
      Seq(repartitioned, permuted).forall { r =>
        r.count == baseline.count &&
          close(r.mean, baseline.mean) && close(r.stdev, baseline.stdev)
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, s"Welford layout-invariance: ${result.status}")
  }

  test("shape mismatch raises (F10 contract)") {
    val df = Seq(Seq(1.0f, 2.0f), Seq(1.0f)).toDF("t").coalesce(1)
    val e = intercept[Exception] {
      df.agg(WelfordAggregator.of($"t")).collect()
    }
    assert(e.getMessage != null)
  }
}
