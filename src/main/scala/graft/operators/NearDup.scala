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
    // Deliberately NOT cached: the shingle explosion is larger than the
    // input corpus, so pinning it in memory is a scale bug at 100 TB.
    // Shingling is narrow (split+explode over the scan) — recompute is the
    // right trade.
    val sh = wordShingles(df, idCol, textCol, k)
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

  /** MinHash signatures, wide form: one groupBy(id) computing all
    * `numHashes` md5-min-hashes as columns `mh_0..mh_{n-1}` — a single
    * shuffle with map-side partial mins, instead of exploding the shingle
    * set numHashes× and aggregating the blown-up set. */
  def minHashSignatures(shingles: DataFrame, numHashes: Int): DataFrame =
    shingles.groupBy("id").agg(
      min(md5(concat(lit("0:"), col("gram")))).as("mh_0"),
      (1 until numHashes).map(i =>
        min(md5(concat(lit(s"$i:"), col("gram")))).as(s"mh_$i")): _*)

  /** LSH candidate pairs: band the wide signature (rowsPerBand hashes per
    * band; bucket key "00=<mh0>|01=<mh1>"), self-join on (band, bucket),
    * emit distinct candidate id pairs. */
  def lshCandidates(signatures: DataFrame, rowsPerBand: Int): DataFrame = {
    val numHashes = signatures.columns.count(_.startsWith("mh_"))
    val bands = numHashes / rowsPerBand
    val bandStructs = (0 until bands).map { j =>
      val key = md5(concat_ws("|",
        (0 until rowsPerBand).map { r =>
          val i = j * rowsPerBand + r
          concat(lit(f"$i%02d="), col(s"mh_$i"))
        }: _*))
      struct(lit(j).as("band"), key.as("bucket"))
    }
    val banded = signatures
      .select(col("id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Full MinHash-LSH near-dup: candidates from banding, verified with exact
    * shingle Jaccard ≥ threshold.
    *
    * @param broadcastCandidateLimit broadcast the candidate-pair set for the
    *   verification probe only when its measured row count is at or below
    *   this limit. Banding usually keeps candidates tiny, but a
    *   duplicate-heavy corpus can put O(n²) pairs in one hot bucket, and an
    *   unconditional broadcast of that would OOM the driver — so the hint is
    *   gated on the real count (one extra cheap job) and AQE handles the
    *   shuffle-join path otherwise. */
  def minHashLshPairs(df: DataFrame, idCol: Column, textCol: Column,
                      k: Int, numHashes: Int, rowsPerBand: Int, threshold: Double,
                      broadcastCandidateLimit: Long = 5000000L): DataFrame = {
    // NOT cached — see ngramJaccardPairs; the shingle set outgrows the input.
    val sh = wordShingles(df, idCol, textCol, k)
    val candUnhinted = lshCandidates(minHashSignatures(sh, numHashes), rowsPerBand)
    // MEMORY_AND_DISK persist (spill-safe) only for the duration of the gate
    // count + verification join; released via unpersist below.
    val candPersisted = candUnhinted.persist()
    val candCount = candPersisted.count()
    val cand =
      if (candCount <= broadcastCandidateLimit) broadcast(candPersisted) else candPersisted
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_grams"))
    val inter = sh.toDF("id_a", "gram")
      .join(cand, Seq("id_a"))
      .join(sh.toDF("id_b", "gram"), Seq("id_b", "gram"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_inter"))
    val verified = inter
      .join(sizes.toDF("id_a", "na"), Seq("id_a"))
      .join(sizes.toDF("id_b", "nb"), Seq("id_b"))
      .withColumn("jaccard", round(col("n_inter") / (col("na") + col("nb") - col("n_inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
    // Materialize the verified pairs (tiny relative to the corpus) so the
    // candidate persist can be released deterministically instead of leaking
    // until session end; checkpoint blocks are GC-cleaned with the frame.
    val out = verified.localCheckpoint(true)
    candPersisted.unpersist(false)
    out
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
