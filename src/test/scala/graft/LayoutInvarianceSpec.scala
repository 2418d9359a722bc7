package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Partition-layout invariance: on a real cluster the same table arrives
  * with whatever partitioning the previous stage (or the scan split
  * planner) produced, so an operator whose RESULT depends on row layout is
  * broken at scale even if every small test passes. These tests pin that
  * the probabilistic/approximate operators — the ones whose internals
  * (signatures, buckets, centroid argmin, greedy survivors) could most
  * plausibly leak layout — return identical result SETS when the input is
  * re-partitioned and re-ordered.
  */
class LayoutInvarianceSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def docs: DataFrame =
    graft.core.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")

  private def embs: DataFrame =
    graft.core.Tables.load(spark, sfDir, "embeddings")

  /** The adversarial relayout: different partition count AND a different
    * row-to-partition assignment (salted hash of the leading column).
    */
  private def shuffled(df: DataFrame): DataFrame =
    df.repartition(7, xxhash64(col(df.columns.head), lit(987654321L)))

  // MULTISET compare (row → count): a set would be blind to a relayout
  // that emits the same logical row twice (e.g. a dropped dedup step
  // duplicating a pair once per shared band)
  private def rows(df: DataFrame): Map[String, Int] =
    df.collect().groupBy(_.toString).map { case (k, v) => k -> v.length }

  test("minhash near-dup pairs are identical under relayout") {
    val base = Dedup.minhashNearDuplicates(docs, "text", "doc_id",
      threshold = 0.8)
    val moved = Dedup.minhashNearDuplicates(shuffled(docs), "text", "doc_id",
      threshold = 0.8)
    val a = rows(base)
    assert(a.nonEmpty, "fixture must produce pairs or the test is vacuous")
    assert(rows(moved) == a)
  }

  test("simhash near-dup pairs are identical under relayout") {
    val a = rows(Dedup.simhashNearDuplicates(docs, "text", "doc_id"))
    assert(a.nonEmpty)
    assert(rows(Dedup.simhashNearDuplicates(shuffled(docs), "text",
      "doc_id")) == a)
  }

  test("exactByDigest survivors are identical under relayout") {
    val a = rows(Dedup.exactByDigest(docs, Seq("text"), "doc_id"))
    assert(rows(Dedup.exactByDigest(shuffled(docs), Seq("text"),
      "doc_id")) == a)
  }

  test("ivfTopK neighbors are identical under relayout") {
    val queries = embs.filter(col("vec_id") < 3)
    val a = rows(Similarity.ivfTopK(embs, queries, "embedding", "vec_id",
      k = 5))
    assert(a.nonEmpty)
    assert(rows(Similarity.ivfTopK(shuffled(embs), shuffled(queries),
      "embedding", "vec_id", k = 5)) == a)
  }

  test("lshNeighborPairs are identical under relayout") {
    // threshold low enough that the near-orthogonal fixture yields pairs
    val dim = embs.select(size(col("embedding"))).first().getInt(0)
    val a = rows(Similarity.lshNeighborPairs(embs, "embedding", "vec_id",
      dim = dim, numBits = 8, threshold = 0.3))
    assert(a.nonEmpty)
    assert(rows(Similarity.lshNeighborPairs(shuffled(embs), "embedding",
      "vec_id", dim = dim, numBits = 8, threshold = 0.3)) == a)
  }
}
