package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewOps

class SkewOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedSumCount equals plain aggregation on skewed data") {
    // 90% of rows share one hot key
    val rows = (1 to 5000).map { i =>
      val k = if (i % 10 == 0) s"key_${i % 7}" else "HOT"
      (k, i.toDouble)
    }
    val df = rows.toDF("k", "v").repartition(16)
    val salted = SkewOps.saltedSumCount(df, Seq("k"), "v")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3))).toMap
    val plain = df.groupBy("k")
      .agg(sum("v"), count(lit(1)), avg("v"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3))).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (s, c, a)) =>
      assert(math.abs(s - plain(k)._1) < 1e-6, s"sum for $k")
      assert(c == plain(k)._2, s"count for $k")
      assert(math.abs(a - plain(k)._3) < 1e-9, s"avg for $k")
    }
  }

  test("bucketed tables join without an exchange (co-located join)") {
    // warehouse dir pinned to /tmp via build.sbt javaOptions (static conf);
    // clear any leftover table locations from prior JVMs (the in-memory
    // catalog forgets them but their files survive)
    for (t <- Seq("graft_bucket_a", "graft_bucket_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = java.nio.file.Paths.get(s"/tmp/graft-warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    val a = (1L to 2000L).map(i => (i, s"a$i")).toDF("id", "pa")
    val b = (1L to 2000L).map(i => (i, s"b$i")).toDF("id", "pb")
    a.write.mode("overwrite").bucketBy(8, "id").sortBy("id")
      .saveAsTable("graft_bucket_a")
    b.write.mode("overwrite").bucketBy(8, "id").sortBy("id")
      .saveAsTable("graft_bucket_b")
    val joined = spark.table("graft_bucket_a")
      .join(spark.table("graft_bucket_b"), "id")
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: bucket layout satisfies the join distribution, so the
    // plan contains NO shuffle exchange
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in bucketed join plan:\n$plan")
    assert(joined.count() == 2000)
  }
}
