package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection family: word-shingles, n-gram Jaccard,
  * MinHash+LSH banding, SimHash.
  *
  * Scale design: pairwise comparison is never global — candidate pairs come
  * from equality joins on shingles (Jaccard) or band buckets (LSH), so the
  * shuffle key space is the shingle/bucket domain and AQE's skew-join
  * handling splits hot buckets. Hashes are md5-based so any SQL engine can
  * reproduce them bit-for-bit (no engine-private hash functions).
  */
object NearDup {

  /** Explode distinct word-k-grams: (id, gram). */
  def wordShingles(df: DataFrame, idCol: Column, textCol: Column, k: Int): DataFrame = {
    val words = split(textCol, " ")
    // guard: ANSI mode makes element_at fail on the descending sequence a
    // short doc would produce, so docs with < k words yield no shingles
    val grams = when(size(words) >= k,
      transform(
        sequence(lit(0), size(words) - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(words, (i + j + 1).cast("int"))): _*)))
      .otherwise(array().cast("array<string>"))
    df.select(idCol.as("id"), explode(array_distinct(grams)).as("gram"))
  }

  /** Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard ≥ threshold).
    * |A∩B| via equality join on shingles, |A∪B| = |A|+|B|−|A∩B|. */
  def ngramJaccardPairs(df: DataFrame, idCol: Column, textCol: Column,
                        k: Int, threshold: Double): DataFrame = {
    val sh = wordShingles(df, idCol, textCol, k).cache()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_grams"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_grams", "na"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_grams", "nb"), "id_b")
      .withColumn("jaccard", round(col("n_inter") / (col("na") + col("nb") - col("n_inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signatures: numHashes md5-derived min-hashes per id.
    * Result: (id, i, mh) with i in [0, numHashes). */
  def minHashSignatures(shingles: DataFrame, numHashes: Int): DataFrame =
    shingles
      .select(col("id"), explode(sequence(lit(0), lit(numHashes - 1))).as("i"), col("gram"))
      .groupBy("id", "i")
      .agg(min(md5(concat(col("i").cast("string"), lit(":"), col("gram")))).as("mh"))

  /** LSH candidate pairs: band the signature (rowsPerBand hashes per band),
    * bucket-join on (band, band-hash), emit distinct candidate id pairs. */
  def lshCandidates(signatures: DataFrame, rowsPerBand: Int): DataFrame = {
    val banded = signatures
      .withColumn("band", (col("i") / rowsPerBand).cast("int"))
      .groupBy("id", "band")
      // within a band, order hashes by zero-padded i so the band key is
      // deterministic and lexicographic order == numeric order
      .agg(md5(concat_ws("|", array_sort(collect_list(concat(lpad(col("i").cast("string"), 2, "0"), lit("="), col("mh")))))).as("bucket"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup: candidates from banding, verified with exact
    * shingle Jaccard ≥ threshold. */
  def minHashLshPairs(df: DataFrame, idCol: Column, textCol: Column,
                      k: Int, numHashes: Int, rowsPerBand: Int, threshold: Double): DataFrame = {
    val sh = wordShingles(df, idCol, textCol, k).cache()
    val cand = lshCandidates(minHashSignatures(sh, numHashes), rowsPerBand)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_grams"))
    val inter = cand
      .join(sh.toDF("id_a", "gram"), Seq("id_a"))
      .join(sh.toDF("id_b", "gram"), Seq("id_b", "gram"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.toDF("id_a", "na"), Seq("id_a"))
      .join(sizes.toDF("id_b", "nb"), Seq("id_b"))
      .withColumn("jaccard", round(col("n_inter") / (col("na") + col("nb") - col("n_inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash: 64-bit fingerprint over distinct words, md5-derived bits,
    * rendered as a 64-char '0'/'1' string (engine-portable, no uint64). */
  def simHash(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val words = df.select(idCol.as("id"), explode(array_distinct(split(lower(textCol), " "))).as("w"))
      .filter(col("w") =!= "")
    val h = md5(col("w"))
    // bit b of the 64-bit prefix: hex digit d = b/4, bit-in-digit = 3-(b%4)
    val bits = words
      .select(col("id"), h.as("h"), explode(sequence(lit(0), lit(63))).as("b"))
      .withColumn("digit", expr("instr('0123456789abcdef', substr(h, CAST(b / 4 AS INT) + 1, 1)) - 1"))
      .withColumn("bit", expr("CAST(floor(digit / power(2, 3 - b % 4)) AS INT) % 2"))
      .withColumn("vote", when(col("bit") === 1, 1).otherwise(-1))
    bits.groupBy("id", "b")
      .agg(sum("vote").as("v"))
      .groupBy("id")
      .agg(concat_ws("", array_sort(collect_list(
        struct(col("b"), when(col("v") >= 0, lit("1")).otherwise(lit("0")).as("s")))).getField("s")).as("simhash"))
  }
}
