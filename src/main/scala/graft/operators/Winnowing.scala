package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
  * algorithm): hash every positional word-k-gram, slide a window of `w`
  * consecutive hashes, select each window's minimum — the selected set is
  * the document's fingerprint. The guarantee that makes it the standard
  * over naive "keep every j-th hash": any shared run of at least w+k−1
  * tokens between two documents shares at least one selected fingerprint
  * (detection is position-independent), while storage shrinks ~2/(w+1).
  * Fingerprint-equality join over the output is the near-dup candidate
  * generator for plagiarism/boilerplate detection.
  *
  * Engine-portable: hashes are the first 16 hex chars of md5 (string
  * min/compare is plain ASCII ordering in any engine), POSITIONAL grams
  * (not the distinct-gram shingle used by the Jaccard family — winnowing
  * needs every occurrence), window min per starting position, distinct
  * (doc, hash) at the end.
  *
  * Scale shape: one narrow projection builds positional grams in-row
  * (`transform(sequence)`), one hash-partition by doc + in-partition sort
  * by position for the window min, one distinct. Window state is w rows;
  * no joins, no driver work.
  */
object Winnowing {

  /** (doc_id, fp) — the distinct selected fingerprints per document.
    * Documents with fewer than k+w−1 tokens emit nothing (no full
    * window). */
  def fingerprints(df: DataFrame, idCol: Column, textCol: Column,
                   k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
    val toks = filter(split(textCol, " "), t => t =!= "")
    // filter BEFORE building grams: sequence(0, n-k) with n < k descends
    // into negatives; n >= k+w-1 also guarantees at least one full window.
    // __n (the gram count) is DERIVED ARITHMETICALLY from the token count,
    // never as size(<the transform>): CollapseProject inlines a projected
    // expression into post-explode consumers, and size-of-transform would
    // re-build the whole gram array once per exploded row (measured 15 s
    // on 5000 docs vs ~1 s total for the arithmetic form).
    val base = df.select(idCol.as("doc_id"), toks.as("__t"))
      .where(size(col("__t")) >= k + w - 1)
      .select(col("doc_id"), col("__t"), (size(col("__t")) - (k - 1)).as("__n"))
    val grams = transform(
      sequence(lit(0), size(col("__t")) - k),
      i => concat_ws(" ", slice(col("__t"), i + lit(1), lit(k))))
    val hashed = base
      .select(col("doc_id"), col("__n"), posexplode(grams).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("__n"), col("pos"),
        substring(md5(col("gram")), 1, 16).as("h"))
    hashed
      .withColumn("fp", min(col("h")).over(
        Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.currentRow, w - 1)))
      .where(col("pos") <= col("__n") - w) // full windows only
      .select("doc_id", "fp").distinct()
  }
}
