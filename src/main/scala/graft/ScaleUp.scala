package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sf1 scale-point generator: expands the read-only sf0.1 testdata 10x for
  * the SCALING-CURVE capture (BASELINE.md's sf1 table) without touching
  * /root/testdata. Output goes under the repo (`data/sf1`, gitignored) and
  * only the tables the heavy bench family reads are written.
  *
  * Construction: 10 DISJOINT deterministic replicas, not naive row copies —
  * so the corpus's intrinsic pair structure is preserved per replica and
  * TRUE work scales exactly 10x, which is what makes an sf1/sf0.1 runtime
  * ratio interpretable (super-linear growth is then engine behavior, never
  * an artifact of cloned rows suddenly all matching each other):
  *  - documents: replica r suffixes every word ("spark" -> "sparkqa"), so
  *    replicas share no shingles/minhashes — near-dup candidate pairs are
  *    exactly 10x the sf0.1 pairs, never cross-replica.
  *  - customer: replica r appends a 3-repeated-letter tag to c_name; tags
  *    differ pairwise by 3 edits, so no cross-replica distance-1 linkage
  *    pairs and disjoint deletion-1 blocking neighborhoods.
  *  - lineitem/part: keys shift by r*10^7 — ten disjoint co-purchase
  *    graphs, each isomorphic to sf0.1's (q109's node%100 seed predicate
  *    survives because the shift is divisible by 100).
  * All transforms are column algebra over the source parquet — no
  * randomness, so the generated data is bit-reproducible.
  */
object ScaleUp {

  private val Shift = 10000000L

  /** Replica word-suffix, pairwise-distinct and alphabetic: r 1..24 →
    * one letter after the 'q' marker, r 25.. → two letters (sf10 needs
    * 100 replicas — round-16 task). The letter alphabet EXCLUDES 'q'
    * (round-16 review): with 'q' admitted, a two-letter code could start
    * with it ("qqa") and w+"qqa" == (w+"q")+"qa" collides replica tokens
    * through a word boundary; with every non-marker letter != 'q', the
    * marker position is unambiguous and suffixed tokens can only be equal
    * when base word and suffix both match. */
  private val SuffixAlpha = "abcdefghijklmnoprstuvwxy" // a..y minus q (24)
  private[graft] def wordSuffix(r: Int): String =
    if (r <= 24) "q" + SuffixAlpha(r - 1)
    else "q" + SuffixAlpha((r - 25) / 24) + SuffixAlpha((r - 25) % 24)

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "data/sf1"
    val replicas = if (args.length > 2) args(2).toInt else 10
    require(replicas >= 1 && replicas <= 601, "replicas in 1..601 (1 base + 24 one-letter + 576 two-letter suffixes)")
    // Optional 4th arg: comma-separated table subset (sf10 generates only
    // what its scale-point queries read — 100 replicas of every table is
    // pointless disk).
    val tables: String => Boolean =
      if (args.length > 3) { val s = args(3).split(",").toSet; s.contains(_) }
      else _ => true
    val spark = GraftSession.local("graft-scaleup")
    spark.sparkContext.setLogLevel("WARN")

    def replicate(name: String)(xform: (DataFrame, Int) => DataFrame): Unit =
      if (tables(name)) {
        val base = spark.read.parquet(s"$src/$name.parquet")
        // unionByName: the r>0 branches select in hardcoded order; never let a
        // source-parquet column-order difference mis-align same-typed columns
        val all = (0 until replicas).map(r => xform(base, r)).reduce(_ unionByName _)
        all.repartition(32).write.mode("overwrite").parquet(s"$out/$name.parquet")
        System.err.println(s"[scaleup] $name -> $out/$name.parquet")
      }

    replicate("documents") { (df, r) =>
      if (r == 0) df
      else {
        val sfx = wordSuffix(r)
        val txt = array_join(
          transform(split(col("text"), " "), w => concat(w, lit(sfx))), " ")
        df.select((col("doc_id") + r * Shift).as("doc_id"), txt.as("text"),
          col("lang"), col("source"), length(txt).cast("long").as("n_chars"))
      }
    }

    replicate("customer") { (df, r) =>
      if (r == 0) df
      else {
        // r<=24: one letter ×3 (pairwise edit distance 3). r>=25: the
        // two-letter suffix code ×3 (distinct codes differ in >=1 letter ->
        // >=3 edits across the repeats; 6-char vs 3-char tags differ by
        // length alone).
        val tag = wordSuffix(r).drop(1) * 3
        df.select((col("c_custkey") + r * Shift).as("c_custkey"),
          concat(col("c_name"), lit(" " + tag)).as("c_name"),
          col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      }
    }

    replicate("lineitem") { (df, r) =>
      // EVERY foreign key shifts in lockstep (l_suppkey included, so a
      // future lineitem-supplier join at sf1 measures 10 disjoint
      // universes, not a 10x fanout into replica-0's suppliers)
      df.withColumn("l_orderkey", col("l_orderkey") + r * Shift)
        .withColumn("l_partkey", col("l_partkey") + r * Shift)
        .withColumn("l_suppkey", col("l_suppkey") + r * Shift)
    }

    replicate("part") { (df, r) =>
      df.withColumn("p_partkey", col("p_partkey") + r * Shift)
    }

    // Round-12 widening (VERDICT task 2): the windowed/join/funnel/
    // governance families need the rest of the schema at sf1. Same
    // disjoint-replica discipline — keys shift in lockstep with their
    // foreign keys (orders.o_custkey moves WITH customer.c_custkey, so
    // every replica is a self-contained, sf0.1-isomorphic universe), and
    // event time is untouched: the time-window count stays the sf0.1
    // window count with 10x rows per window, which is exactly how a 10x
    // corpus over the same wall-clock behaves in production.
    replicate("orders") { (df, r) =>
      df.withColumn("o_orderkey", col("o_orderkey") + r * Shift)
        .withColumn("o_custkey", col("o_custkey") + r * Shift)
    }

    replicate("events") { (df, r) =>
      df.withColumn("event_id", col("event_id") + r * Shift)
        .withColumn("user_id", col("user_id") + r * Shift)
    }

    replicate("supplier") { (df, r) =>
      df.withColumn("s_suppkey", col("s_suppkey") + r * Shift)
    }

    // embeddings: ids shift; each replica's vectors CYCLE by 7r positions
    // so replicas do not stack 10 exact copies onto every ANN bucket
    // (norms and pairwise structure within a replica are preserved —
    // rotation is an isometry of the coordinate permutation group)
    replicate("embeddings") { (df, r) =>
      if (r == 0) df
      else {
        val dim = size(col("embedding"))
        val rot = transform(sequence(lit(0), dim - 1),
          i => element_at(col("embedding"), (i + lit(7 * r)) % dim + 1))
        df.select((col("vec_id") + r * Shift).as("vec_id"),
          rot.as("embedding"), col("label"))
      }
    }

    // fixed-domain dims are SHARED, not replicated: nation/region are the
    // same 25/5 rows at any scale factor, so every replica joins the one
    // copy (the realistic 100 TB shape: facts grow, enums don't)
    Seq("nation", "region").foreach { name =>
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      System.err.println(s"[scaleup] $name -> $out/$name.parquet (shared dim)")
    }

    spark.stop()
  }
}
