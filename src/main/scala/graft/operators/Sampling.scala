package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling & split assignment for
  * training-data pipelines.
  *
  * Everything is keyed on `md5(id)` so the SAME row lands in the SAME
  * split/sample on every engine and every run — no RNG, no seed plumbing,
  * no shuffle (pure narrow projection over the scan). That determinism is
  * what makes 100 TB dataset builds reproducible: re-running a failed
  * partition reproduces identical splits, and a DuckDB/Spark pair agrees
  * bit-for-bit (the correctness gate relies on it).
  */
object Sampling {

  /** 0..255 bucket from the first two hex chars of `md5(idCol)`. */
  def hashBucket(idCol: Column): Column = {
    def hexVal(i: Int) =
      (instr(lit("0123456789abcdef"), substring(md5(idCol.cast("string")), i, 1)) - 1)
    (hexVal(1) * 16 + hexVal(2)).cast("int")
  }

  /** Keep ~`pct`% of rows, deterministically (bucket < pct·2.56). */
  def hashSample(df: DataFrame, idCol: Column, pct: Int): DataFrame =
    df.filter(hashBucket(idCol) < (pct * 256 + 50) / 100)

  /** Stratified deterministic sample: at most `perStratum` rows from each
    * stratum (class/language/source), chosen by md5(id) order — every
    * engine and every run picks the same rows, and the per-stratum quota
    * balances skewed class distributions. Runs through the custom
    * [[graft.plans.TopKPerKey]] plan: bounded heaps, survivors-only
    * shuffle, no sort of the corpus. */
  def stratifiedSample(df: DataFrame, stratumCol: Column, idCol: Column,
                       perStratum: Int): DataFrame =
    TopK.topKPerKeyNative(df, Seq(stratumCol),
      Seq(md5(idCol.cast("string")).asc, idCol.asc), perStratum)

  /** train/valid/test assignment by bucket range: `trainPct`% → train, next
    * `validPct`% → valid, rest → test. Duplicate ids always co-assign, so
    * near-dup leakage across splits can be controlled upstream by splitting
    * on a canonical (deduped) id. */
  def withSplit(df: DataFrame, idCol: Column, trainPct: Int, validPct: Int,
                splitName: String = "split"): DataFrame = {
    val b = hashBucket(idCol)
    val trainHi = trainPct * 256 / 100
    val validHi = (trainPct + validPct) * 256 / 100
    df.withColumn(splitName,
      when(b < trainHi, "train").when(b < validHi, "valid").otherwise("test"))
  }

  /** Data-mixing under a token budget: within each group (language, domain,
    * source), admit documents best-first — ordered by `priorityCol` desc
    * with the usual md5(id) deterministic tiebreak — while the running
    * token total stays within `budgetPerGroup`. Prefix semantics: the
    * first document that would overflow the budget closes the group (no
    * knapsack back-fill), which keeps the result a pure function of the
    * ordering — reproducible and SQL-oracle-checkable.
    *
    * This is the exact path: one hash-partition by group + per-group sort
    * for the running-sum window (a per-group ordered prefix is inherently
    * sequential). For corpora where a single group is shuffle-partition-
    * sized or larger, use [[tokenBudgetCutoffs]] to resolve a per-group
    * admission threshold at histogram granularity instead — no per-doc
    * sort anywhere. */
  def tokenBudgetSample(df: DataFrame, groupCol: Column, idCol: Column,
                        tokensCol: Column, priorityCol: Column,
                        budgetPerGroup: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(priorityCol.desc, md5(idCol.cast("string")), idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("cum_tokens", sum(tokensCol).over(w))
      .filter(col("cum_tokens") <= budgetPerGroup)
  }

  /** Scale path for [[tokenBudgetSample]]: per-group admission THRESHOLD
    * from a priority histogram. One map-side-combinable aggregation over
    * (group, floor(priority/bucketWidth)) — shuffle carries one row per
    * occupied bucket, not per document — then a running sum over each
    * group's few-hundred-row bucket frame picks the lowest bucket whose
    * cumulative tokens still fit the budget. Returns `(group,
    * cutoff_priority, admitted_tokens)`; admission is then a broadcast
    * join + narrow `priority >= cutoff_priority` filter over the corpus
    * ([[admitByCutoff]]) — no per-document sort at any point. Granularity
    * trade: the budget is honored at bucket resolution (over-admission
    * bounded by one bucket's tokens). If a group's single highest-priority
    * bucket already exceeds the budget, that bucket is still admitted (the
    * cutoff pins to the top bucket) — a group is never silently emptied by
    * a coarse `bucketWidth`, mirroring the exact path, which always admits
    * a fitting prefix when one exists. */
  def tokenBudgetCutoffs(df: DataFrame, groupCol: Column, tokensCol: Column,
                         priorityCol: Column, budgetPerGroup: Long,
                         bucketWidth: Long = 100L): DataFrame = {
    val bucket = floor(priorityCol / bucketWidth).cast("long")
    val hist = df.groupBy(groupCol.as("group"), bucket.as("__bucket"))
      .agg(sum(tokensCol).as("__btokens"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("group"))
      .orderBy(col("__bucket").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // `__cum = __btokens` identifies the top of the desc-ordered frame (any
    // zero-token buckets above it fit trivially), so the highest-priority
    // bucket survives even when it alone blows the budget — total dropout
    // would admit zero documents where the exact path admits a prefix.
    hist.withColumn("__cum", sum(col("__btokens")).over(w))
      .filter(col("__cum") <= budgetPerGroup || col("__cum") === col("__btokens"))
      .groupBy(col("group"))
      .agg((min(col("__bucket")) * bucketWidth).as("cutoff_priority"),
        max(col("__cum")).as("admitted_tokens"))
  }

  /** Admit every row whose priority clears its group's cutoff (see
    * [[tokenBudgetCutoffs]]); cutoff frame is groups×1 rows → broadcast. */
  def admitByCutoff(df: DataFrame, cutoffs: DataFrame, groupCol: Column,
                    priorityCol: Column): DataFrame =
    df.join(broadcast(cutoffs), groupCol === cutoffs("group"))
      .filter(priorityCol >= cutoffs("cutoff_priority"))
      .drop("group", "cutoff_priority", "admitted_tokens")

  /** Training-sequence packing, concat-then-chunk (the GPT-style packer):
    * within each group, documents in `idCol` order form one contiguous
    * token stream that is cut into sequences of `capacity` tokens —
    * documents SPAN sequence boundaries (zero padding waste; the packer
    * that instead starts a fresh bin on overflow trades waste for
    * boundary purity and is inherently sequential — not offered here).
    * Emits per doc: `seq_id` = the sequence its first token lands in,
    * `seq_off` = offset within that sequence, `n_seqs_spanned` = how many
    * sequences the document crosses. All integer math over the running
    * token sum ⇒ exact-SQL-oracle-checkable.
    *
    * Scale shape: ONE hash-partition by group + per-group sort for the
    * prefix-sum window (the same inherently-sequential-prefix trade as
    * [[tokenBudgetSample]], and the same remedy if a single group
    * outgrows a partition: split the group key, e.g. by date, and pack
    * per shard). */
  def packSequences(df: DataFrame, groupCol: Column, idCol: Column,
                    tokensCol: Column, capacity: Long): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // `div` (integer division), not `/`-then-floor: the double detour
    // loses exactness past 2^53 cumulative tokens
    df.withColumn("__start", sum(tokensCol).over(w) - tokensCol)
      .withColumn("__last", col("__start") + greatest(tokensCol, lit(1L)) - 1)
      .select(groupCol.as("group"), idCol.as("id"), tokensCol.as("n_tokens"),
        expr(s"__start div ${capacity}L").as("seq_id"),
        pmod(col("__start"), lit(capacity)).as("seq_off"),
        (expr(s"__last div ${capacity}L") - expr(s"__start div ${capacity}L") + 1)
          .as("n_seqs_spanned"))
  }

  /** Priority sampling (Duffield, Lund, Thorup — JACM 2007): a weighted
    * k-sample whose per-item estimates `max(w_i, τ)` give UNBIASED subset-
    * sum estimates with near-optimal variance — the principled way to keep
    * a k-row sketch of a 100 TB corpus that still answers "how many tokens
    * does slice X hold" (uniform sampling misses heavy items; keep-top-k
    * biases every subset sum).
    *
    * Each item gets priority `q_i = w_i / u_i` with `u_i` a deterministic
    * md5-derived uniform in (0, 1]; the sample is the top k by priority and
    * τ is the (k+1)-th priority. Engine-portable by construction: u comes
    * from the first 8 md5 hex digits (the [[Profiler.tableFingerprint]]
    * idiom), priority is ⌊w·2³²/(h+1)⌋ — one fixed IEEE double expression
    * over exactly-representable integers, floored to BIGINT.
    *
    * Scale shape: one narrow priority projection, then global top-(k+1)
    * through the bounded-heap [[graft.plans.TopKPerKey]] plan (AllTuples
    * mode — map-side heaps, survivors-only exchange, no corpus sort); τ
    * rides back as a broadcast 1-row aggregate over the k+1 survivors.
    * When the corpus has ≤ k rows every row is kept and τ = 0, so the
    * estimator degenerates to the exact weights — the paper's contract. */
  def prioritySample(df: DataFrame, idCol: Column, weightCol: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    graft.plans.GraftExtensions.register(df.sparkSession)
    // First 8 hex digits of md5 = first 4 bytes = top 32 bits of the
    // native 48-bit fold; identical to the instr/substr digit fold the
    // q98 oracle still spells out.
    val h32 = shiftright(
      call_function("graft_md5_fold48", idCol.cast("string")), 16)
    val base = df.select(idCol.as("id"), weightCol.cast("long").as("weight"),
      floor(weightCol.cast("long") * lit(4294967296.0) / (h32 + lit(1L)).cast("double"))
        .cast("long").as("priority_q"))
    val top = TopK.topKPerKeyNative(base, Seq(),
      Seq(col("priority_q").desc, col("id").asc), k + 1)
    // rank the k+1 survivors (tiny) to split sample vs threshold row
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("priority_q").desc, col("id").asc)
    val ranked = top.withColumn("__rn", row_number().over(w))
    val tau = ranked.agg(
      coalesce(max(when(col("__rn") === k + 1, col("priority_q"))), lit(0L)).as("tau_q"))
    ranked.filter(col("__rn") <= k).drop("__rn")
      .crossJoin(broadcast(tau))
      .withColumn("est_q", greatest(col("weight"), col("tau_q")))
  }
}
