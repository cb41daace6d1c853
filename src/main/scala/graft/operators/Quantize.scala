package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 embedding quantization + integer-exact quantized ANN — the
  * standard memory-compression path for similarity search at corpus scale
  * (4 bytes/dim float32 → 1 byte/dim code ⇒ 4× more vectors per executor,
  * and the distance kernel becomes integer arithmetic).
  *
  * Two stages, mirroring the FAISS scalar-quantizer design:
  *  1. per-dimension (min, max) over the corpus — ONE map-side-combinable
  *     aggregation over `posexplode`d elements (d groups out per task, so
  *     the shuffle is d·tasks rows, not N·d);
  *  2. in-row encode `floor((v − mn) · 255 / (mx − mn))` clamped to
  *     [0, 255] — the per-dim params are bounded driver metadata (d ≤ a
  *     few thousand, same footprint class as k-means centroids) inlined
  *     as array literals, so encoding is a narrow projection: no second
  *     shuffle, no join.
  *
  * Determinism: min/max of floats involve no arithmetic; the encode
  * expression is one fixed left-associated IEEE shape (exact float→double
  * widening first), so codes are bit-identical across engines — and every
  * DOWNSTREAM distance over codes is pure integer math, which is why
  * [[quantizedTopK]] can be hash-oracle-checked while float ANN needs
  * rounding guards.
  */
object Quantize {

  /** Per-dimension corpus stats: (i, mn, mx), 0-based dim index. */
  def dimStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(expr(s"transform($vecCol, x -> cast(x as double))")).as(Seq("i", "val")))
      .groupBy("i")
      .agg(min("val").as("mn"), max("val").as("mx"))

  /** (id, codes array<bigint> of [0,255]) — constant dims collapse to 0.
    * Codes are BIGINT, not TINYINT, because every consumer immediately
    * does arithmetic; the 1-byte layout is a storage-format concern
    * ([[graft.sinks.LakeSink]] writes them as parquet INT32-dict pages
    * either way). */
  def scalarQuantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val st = dimStats(df, vecCol).orderBy("i").collect()
    val mn = array(st.map(r => lit(r.getDouble(1))): _*)
    val mx = array(st.map(r => lit(r.getDouble(2))): _*)
    df.select(col(idCol), transform(
      expr(s"transform($vecCol, x -> cast(x as double))"),
      (x, i) => {
        val lo = element_at(mn, i + 1)
        val hi = element_at(mx, i + 1)
        when(hi === lo, 0L).otherwise(
          least(lit(255L), greatest(lit(0L),
            floor((x - lo) * lit(255.0) / (hi - lo)).cast("long"))))
      }).as("codes"))
  }

  /** Signed random projection (Achlioptas 2003 / the JL-lemma ±1 variant)
    * over int8 codes: `y_j = Σ_i sign(i,j)·code_i` with signs drawn from
    * the md5 parity of `"i:j"` — deterministic across runs AND engines
    * (the oracle re-derives them from the same md5), and the projection
    * stays pure integer (|y| ≤ 255·d), so it is hash-checkable end to
    * end, unlike Gaussian projections. This is the cheap dimensionality
    * crush before indexing: d dims → `outDims` at one in-row multiply-add
    * per cell, distances approximately preserved (JL), then IVF/LSH
    * build their buckets over 4-16 ints instead of hundreds of floats.
    *
    * The d×outDims sign matrix is bounded driver metadata inlined as
    * array literals (the centroid/min-max pattern above) — projection is
    * a narrow map, no shuffle, no join. Output: (id, proj array<bigint>). */
  def signedProjection(df: DataFrame, idCol: String, vecCol: String,
                       outDims: Int): DataFrame = {
    require(outDims >= 1, "outDims >= 1")
    // Contract (shared with scalarQuantize): a fixed-dimension corpus.
    // The dimension is read from one NON-NULL row (a null vector makes
    // size() return -1, which would silently poison d); an empty frame
    // short-circuits to an empty result instead of head() throwing.
    val first = df.where(col(vecCol).isNotNull)
      .select(size(col(vecCol))).head(1)
    if (first.isEmpty)
      return df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(idCol,
            df.schema(idCol).dataType),
          org.apache.spark.sql.types.StructField("proj",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.LongType)))))
    val d = first.head.getInt(0)
    require(d >= 1, s"signedProjection: $vecCol must have >= 1 dimension")
    val codes = scalarQuantize(df, idCol, vecCol)
    val projCols = (0 until outDims).map { j =>
      val sgnRow = array((0 until d).map(i => lit(signOf(i, j))): _*)
      aggregate(zip_with(col("codes"), sgnRow, (a, b) => a * b),
        lit(0L), (acc, v) => acc + v)
    }
    codes.select(col(idCol), array(projCols: _*).as("proj"))
  }

  /** ±1 from the md5 parity of "i:j" — bit 0 of the 6th digest byte,
    * i.e. the parity of the 12th hex digit the SQL side reads. */
  private[operators] def signOf(i: Int, j: Int): Long = {
    val dgst = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:$j".getBytes("UTF-8"))
    if ((dgst(5) & 1) == 0) 1L else -1L
  }

  /** Brute-force top-k neighbors by INTEGER code dot product for rows
    * matching `queryPred`: (qid, nid, dot, rank), self excluded, ties by
    * ascending neighbor id. The quantized sibling of
    * [[Similarity.cosineTopK]]: queries broadcast against the encoded
    * corpus, the kernel is `Σ codeA·codeB` (≤ 255²·d per pair — long-safe
    * to 10⁸ dims), and the C2 optimizer rule turns the rank filter into
    * the bounded-heap native top-k, so no per-query sort materializes. */
  def quantizedTopK(df: DataFrame, idCol: String, vecCol: String,
                    queryPred: Column, k: Int): DataFrame = {
    val codes = scalarQuantize(df, idCol, vecCol)
    val queries = codes.where(queryPred)
      .select(col(idCol).as("qid"), col("codes").as("qcodes"))
    val dots = codes.join(broadcast(queries), col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol).as("nid"),
        aggregate(zip_with(col("qcodes"), col("codes"), (a, b) => a * b),
          lit(0L), (acc, v) => acc + v).as("dot"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("nid").asc)
    dots.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
