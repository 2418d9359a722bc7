package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{LabelDictionary, LabelTransforms, Merge, Rename, Splits, TagOps}

/** The jigsaw-equivalent dataset-prep surface (SURVEY.md §2.2-2.6) exercised
  * on the harness testdata: `documents` stands in for the image corpus, with
  * a synthetic `tags` array built from its categorical columns so the real
  * TagOps/Splits/LabelTransforms code paths run under the DuckDB oracle.
  */
object JigsawSurface {

  private def docsWithTags(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")
      .withColumn("tags", array(col("lang"), col("source")))

  val all: Seq[Query] = Seq(

    // --- F1 AND filter: membership requires every tag.
    Query(
      "q15_tags_and",
      """SELECT doc_id, lang, source FROM documents
        |WHERE lang = 'en' AND source = 'src5'
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      TagOps.andFilter(docsWithTags(s, d), Seq("en", "src5"))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // --- F2 OR filter: membership requires any tag.
    Query(
      "q16_tags_or",
      """SELECT doc_id, lang, source FROM documents
        |WHERE lang IN ('de', 'fr')
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      TagOps.orFilter(docsWithTags(s, d), Seq("de", "fr"))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // --- J1 join_sets: union of named sets + dedup-keep-first.
    Query(
      "q17_join_sets",
      """SELECT DISTINCT doc_id, lang, source FROM documents
        |WHERE lang = 'en' OR lang IN ('de', 'fr')
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = docsWithTags(s, d)
      val setA = TagOps.andFilter(docs, Seq("en"))
      val setB = TagOps.orFilter(docs, Seq("de", "fr"))
      TagOps.joinSets(Seq(setA, setB), key = "doc_id")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // --- Content-hash bernoulli sample: the scale-stable sampling path
    //     (deterministic across engines, unlike seeded RNG).
    Query(
      "q18_hash_sample",
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.load(s, d, "documents")
        .filter(substring(md5(col("doc_id").cast("string")), 1, 1)
          .isin("0", "1"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // --- P1 seeded exact-n sample: self-deterministic (seeded rand), not
    //     reproducible in DuckDB → rows-only check.
    Query.noOracle("q19_seeded_sample") { (s, d) =>
      TagOps.sampleExact(docsWithTags(s, d), n = 50, seed = 42, key = "doc_id")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // --- P2 test/dev split: the count contract (max(1, floor(n*p))) is
    //     oracle-checkable even though membership is seeded.
    Query(
      "q20_split_counts",
      """WITH c AS (SELECT count(*) AS n FROM documents)
        |SELECT 'dev' AS split,
        |  CAST(n - greatest(1, CAST(floor(0.2 * n) AS BIGINT)) AS BIGINT) AS cnt
        |FROM c
        |UNION ALL
        |SELECT 'test' AS split,
        |  CAST(greatest(1, CAST(floor(0.2 * n) AS BIGINT)) AS BIGINT) AS cnt
        |FROM c
        |ORDER BY split""".stripMargin) { (s, d) =>
      Splits.testDevSplit(Tables.load(s, d, "documents"),
          testPercent = 0.2, seed = 42, key = "doc_id")
        .groupBy("split").agg(count(lit(1)).as("cnt"))
        .orderBy("split")
    },

    // --- P3 k-fold: fold sizes balanced within 1 (ntile-count contract).
    Query(
      "q21_fold_counts",
      """SELECT fold, count(*) AS cnt FROM (
        |  SELECT ntile(5) OVER (ORDER BY doc_id) AS fold FROM documents)
        |GROUP BY fold ORDER BY fold""".stripMargin) { (s, d) =>
      Splits.kfold(Tables.load(s, d, "documents"), k = 5, seed = 0,
          key = "doc_id")
        .groupBy("fold").agg(count(lit(1)).as("cnt"))
        .orderBy("fold")
    },

    // --- P5 round-robin sharding with the n/1000+1 formula, exact
    //     assignment under a defined row order.
    Query(
      "q22_shard_sizes",
      """WITH c AS (SELECT CAST(count(*) // 1000 + 1 AS BIGINT) AS ns
        |           FROM lineitem),
        |t AS (SELECT row_number() OVER (ORDER BY l_orderkey, l_linenumber)
        |        - 1 AS i FROM lineitem)
        |SELECT CAST(t.i % c.ns AS BIGINT) AS shard, count(*) AS cnt
        |FROM t, c GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      // project to the sort keys up front: the global-index path persists
      // and re-encodes every column it is given, and shard sizes only need
      // the keys (Catalyst can't prune through the RDD boundary itself)
      Splits.shardAssign(
          Tables.load(s, d, "lineitem").select("l_orderkey", "l_linenumber"),
          Seq(col("l_orderkey"), col("l_linenumber")))
        .groupBy("shard").agg(count(lit(1)).as("cnt"))
        .orderBy("shard")
    },

    // --- T1/T3/T5: ordered rename/merge pipeline compiled to one projection.
    Query(
      "q23_label_transforms",
      """SELECT CASE
        |    WHEN (CASE WHEN lang = 'es' THEN 'spanish' ELSE lang END)
        |      IN ('de', 'fr') THEN 'european'
        |    ELSE (CASE WHEN lang = 'es' THEN 'spanish' ELSE lang END)
        |  END AS label, count(*) AS cnt
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val transforms = Seq(
        Rename("es", "spanish"),
        Merge(Seq("de", "fr"), "european"))
      LabelTransforms.applyTo(
          Tables.load(s, d, "documents").withColumn("label", col("lang")),
          "label", transforms)
        .groupBy("label").agg(count(lit(1)).as("cnt"))
        .orderBy("label")
    },

    // --- T7: label→int dictionary in first-appearance order.
    Query(
      "q24_label_dict",
      """WITH f AS (SELECT lang AS label, min(doc_id) AS fs
        |           FROM documents GROUP BY lang)
        |SELECT label,
        |  CAST(row_number() OVER (ORDER BY fs, label) AS INT) AS label_int
        |FROM f ORDER BY label""".stripMargin) { (s, d) =>
      LabelDictionary.fromLabels(
          Tables.load(s, d, "documents").withColumn("label", col("lang")),
          labelCol = "label", orderCol = "doc_id")
        .orderBy("label")
    }
  )
}
