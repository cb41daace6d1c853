package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[IncrementalDedup.admit]] — store-probe rejection, intra-batch
  * min-id clustering, incremental == one-shot equivalence, and the
  * token-less pass-through contract. */
class IncrementalDedupSpec extends SparkSpec {
  import ss.implicits._

  private val K = 3
  private val NumHashes = 16
  private val RowsPerBand = 2
  private val MinAgree = 12 // targets Jaccard ~0.75

  private val base = "the quick brown fox jumps over the lazy dog while the " +
    "cat watches from the warm stone wall near the old oak tree by the river"
  private val nearCopy = base.replace("watches", "stares")
  private val other = "entirely different content about distributed query " +
    "engines shuffling partitioned columnar data across a thousand executors " +
    "with adaptive plans and broadcast hash joins at petabyte scale"

  private def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")

  private def admit(batch: DataFrame, store: DataFrame) =
    IncrementalDedup.admit(batch, col("doc_id"), col("text"), store,
      K, NumHashes, RowsPerBand, MinAgree)

  private def empty = IncrementalDedup.emptyStore(ss, K, NumHashes)

  private def ids(df: DataFrame): Set[Long] =
    df.select(col("doc_id")).as[Long].collect().toSet
  private def storeIds(df: DataFrame): Set[Long] =
    df.select(col("id").cast("long")).as[Long].collect().toSet

  test("bootstrap batch: intra-batch dups collapse to the min id, store grows") {
    val a = admit(docs(10L -> base, 11L -> nearCopy, 12L -> other), empty)
    assert(ids(a.admitted) == Set(10L, 12L))
    assert(storeIds(a.store) == Set(10L, 12L))
    assert(a.rejectedByStore.count() == 0L)
    assert(a.rejectedIntraBatch.as[(Long, Long)].collect().toSeq == Seq((11L, 10L)))
  }

  test("a later batch's near-copy of stored content is rejected, history wins") {
    val a1 = admit(docs(10L -> base), empty)
    val a2 = admit(docs(20L -> nearCopy, 21L -> other), a1.store)
    assert(ids(a2.admitted) == Set(21L))
    assert(a2.rejectedByStore.as[(Long, Long)].collect().toSeq == Seq((20L, 10L)))
    assert(storeIds(a2.store) == Set(10L, 21L))
  }

  test("incremental admission over two batches equals one-shot admission") {
    val oneShot = admit(docs(1L -> base, 2L -> nearCopy, 3L -> other), empty)
    val b1 = admit(docs(1L -> base, 2L -> nearCopy), empty)
    val b2 = admit(docs(3L -> other), b1.store)
    assert(storeIds(b2.store) == storeIds(oneShot.store))
    assert(ids(b1.admitted) ++ ids(b2.admitted) == ids(oneShot.admitted))
  }

  test("dissimilar documents all pass at the agreement threshold") {
    val a = admit(docs(1L -> base, 2L -> other), empty)
    assert(ids(a.admitted) == Set(1L, 2L))
  }

  test("token-less documents are admitted unchanged and kept out of the store") {
    val a = admit(docs(1L -> base, 2L -> "", 3L -> "ab"), empty)
    assert(ids(a.admitted) == Set(1L, 2L, 3L))
    assert(storeIds(a.store) == Set(1L))
  }

  test("the store never re-reads text: probing works from signatures alone") {
    // build a store, then admit against a re-created frame of ONLY signatures
    val a1 = admit(docs(10L -> base), empty)
    val sigOnly = a1.store.localCheckpoint(true) // no text column anywhere
    assert(!sigOnly.columns.contains("text"))
    val a2 = admit(docs(20L -> nearCopy), sigOnly)
    assert(ids(a2.admitted).isEmpty && a2.rejectedByStore.count() == 1L)
  }

  test("argument validation") {
    intercept[IllegalArgumentException] {
      admit(docs(1L -> base), empty).copy() // fine
      IncrementalDedup.admit(docs(1L -> base), col("doc_id"), col("text"), empty,
        K, NumHashes, RowsPerBand, minAgree = 0)
    }
    intercept[IllegalArgumentException] {
      IncrementalDedup.admit(docs(1L -> base), col("doc_id"), col("text"), empty,
        K, NumHashes, rowsPerBand = 3, minAgree = 8) // 3 does not divide 16
    }
  }
}
