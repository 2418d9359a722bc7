package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextOps.tokens

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: exact dedup is one hash-partitioned aggregation on the
  * content key (map-side partial combine applies). Near-dup (MinHash/SimHash)
  * avoids the O(n²) all-pairs comparison by banding signatures into buckets
  * and joining within buckets — the classic LSH trick — so the shuffle is on
  * (band, bucket-hash) keys and only candidate pairs are verified exactly.
  */
object Dedup {

  /** Exact dedup: one survivor per distinct value of `contentCols`, keeping
    * the minimum `key` (deterministic "keep-first"). Returns the surviving
    * keys with their group sizes.
    */
  def exact(df: DataFrame, contentCols: Seq[String],
      key: String): DataFrame =
    df.groupBy(contentCols.map(col): _*)
      .agg(min(col(key)).as(key), count(lit(1)).as("dup_count"))
      .select((key +: contentCols :+ "dup_count").map(col): _*)

  /** Word n-gram shingles of a text column (distinct, lowercased). */
  def shingles(text: Column, n: Int = 3): Column = {
    val tk = tokens(text)
    array_distinct(
      when(size(tk) < n, array(concat_ws(" ", tk)))
        .otherwise(
          transform(sequence(lit(0), size(tk) - n),
            i => concat_ws(" ", slice(tk, i + 1, lit(n))))))
  }

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_distinct(concat(a, b))).cast("double")
    when(union === 0, 0.0).otherwise(inter / union)
  }

  /** MinHash signature (numHashes values) over a shingle array, using the
    * standard (a*x + b) mod p family over 32-bit murmur shingle hashes.
    * Deterministic for a given seed. Pure builtins — codegen'd.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int = 64,
      seed: Long = 42): Column = {
    val p = 4294967311L // smallest prime > 2^32
    val rnd = new scala.util.Random(seed)
    val coeffs = Seq.fill(numHashes)(
      (1 + rnd.nextLong().abs % (p - 1), rnd.nextLong().abs % p))
    array(coeffs.map { case (a, b) =>
      array_min(transform(shingleCol,
        s => pmod(hash(s).cast("bigint") * a + b, lit(p))))
    }: _*)
  }

  /** LSH candidate pairs: band the signature, bucket-join, verify with exact
    * Jaccard, keep pairs ≥ threshold. Output: (key_a, key_b, jaccard) with
    * key_a < key_b. `bands` must divide the signature length.
    */
  def minhashNearDuplicates(df: DataFrame, textCol: String, key: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      threshold: Double = 0.7, seed: Long = 42): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sig = df
      .select(col(key), shingles(col(textCol), shingleSize).as("_sh"))
      .withColumn("_sig", minhashSignature(col("_sh"), numHashes, seed))
    // explode into (band, bucket) — bucket is the band's signature slice
    val banded = sig.select(
      col(key), col("_sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => slice(col("_sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
      .withColumnRenamed("pos", "_band")
      .withColumnRenamed("col", "_bucket")
    val l = banded.select(col(key).as("key_a"), col("_sh").as("_sh_a"),
      col("_band"), col("_bucket"))
    val r = banded.select(col(key).as("key_b"), col("_sh").as("_sh_b"),
      col("_band"), col("_bucket"))
    l.join(r, Seq("_band", "_bucket"))
      .filter(col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"),
        jaccard(col("_sh_a"), col("_sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .dropDuplicates("key_a", "key_b")
  }

  /** 32-bit SimHash over token murmur hashes: for each bit position, sum
    * +1/-1 votes across tokens; the bit is set if the sum is positive.
    */
  def simhash(text: Column): Column = {
    val tk = array_distinct(tokens(text))
    val h = transform(tk,
      t => hash(t).cast("bigint").bitwiseAND(lit(0xffffffffL)))
    val bits = (0 until 32).map { i =>
      val vote = aggregate(h, lit(0L),
        (acc, x) => acc + when(shiftright(x, i).bitwiseAND(1) === 1, 1L)
          .otherwise(-1L))
      when(vote > 0, lit(1L << i)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Hamming distance between two simhash values. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Exact all-pairs n-gram Jaccard over a (small or pre-filtered) corpus —
    * the brute-force baseline the LSH path approximates. O(n²): only for
    * bounded subsets; at scale use [[minhashNearDuplicates]].
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, key: String,
      n: Int = 3, threshold: Double = 0.0): DataFrame = {
    val withSh = df.select(col(key), shingles(col(textCol), n).as("_sh"))
    val a = withSh.select(col(key).as("key_a"), col("_sh").as("_sh_a"))
    val b = withSh.select(col(key).as("key_b"), col("_sh").as("_sh_b"))
    a.crossJoin(b)
      .filter(col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"),
        jaccard(col("_sh_a"), col("_sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
