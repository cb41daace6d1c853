package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closes the loop between the L81 S-curve PLANNER (`NearDup.lshTuning`)
  * and the L62 measurement HARNESS (`DedupEval.pairSetMetrics`), VERDICT
  * r11 task 6: on a corpus of planted near-dup pairs with a known Jaccard,
  * the recall the planner predicts for a banding config must match the
  * recall the harness measures — including a deliberately LOSSY config
  * (one band of 8 rows), proving the harness can detect recall loss and
  * the planner quantifies it in advance (q150's shipped config measures
  * 1.0/1.0, an uninformative boundary point on its own).
  */
class LshPlannerLoopSpec extends SparkSpec {
  import ss.implicits._

  private val NumHashes = 8
  private val Pairs = 500

  // Pairs docs (2i, 2i+1) share their first 26 of 30 all-distinct tokens:
  // 28 k=3 grams each, 24 shared -> J = 24/32 = 0.75 exactly, every pair.
  // Tokens are namespaced per pair, so no accidental cross-pair overlap.
  private lazy val docs = (0 until Pairs).flatMap { i =>
    val tok = (0 until 34).map(t => s"p${i}t$t")
    Seq((2L * i, tok.take(26) ++ tok.slice(26, 30)),
        (2L * i + 1, tok.take(26) ++ tok.slice(30, 34)))
  }.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text")

  private lazy val exact = NearDup.weightedJaccardPairs(docs, col("doc_id"),
    col("text"), k = 3, threshold = 0.5, tfCap = 4)
    .select("id_a", "id_b", "jw_ppm").persist()

  /** Planner prediction for (r, b) at the corpus's true pair Jaccard,
    * read off the SAME lshTuning table an engineer would. */
  private def predictedRecallPpm(r: Int, jPct: Int): Long =
    NearDup.lshTuning(ss, NumHashes)
      .filter(col("rows_per_band") === r && col("j_pct") === jPct)
      .select("p_cand_ppm").as[Long].head()

  private def measuredRecallPpm(rowsPerBand: Int): Long = {
    val approx = NearDup.weightedMinHashLshPairs(docs, col("doc_id"),
      col("text"), k = 3, numHashes = NumHashes, rowsPerBand = rowsPerBand,
      threshold = 0.5, tfCap = 4)
    DedupEval.pairSetMetrics(approx.select("id_a", "id_b"),
      exact.select("id_a", "id_b"))
      .select("recall_ppm").as[Long].head()
  }

  test("planted corpus has the designed exact pair set at J=0.75") {
    val rows = exact.collect()
    assert(rows.length == Pairs)
    assert(rows.forall(_.getLong(2) == 750000L),
      s"every planted pair must sit at exactly 750000 ppm, got ${rows.take(3).toSeq}")
  }

  test("measured recall matches the S-curve prediction, healthy AND lossy config") {
    // healthy config (q149's dial): r=2, b=4 -> p = 1-(1-0.75^2)^4 ~ 0.963
    val predHealthy = predictedRecallPpm(r = 2, jPct = 75)
    val measHealthy = measuredRecallPpm(rowsPerBand = 2)
    // lossy config: one band of 8 rows -> p = 0.75^8 ~ 0.100
    val predLossy = predictedRecallPpm(r = 8, jPct = 75)
    val measLossy = measuredRecallPpm(rowsPerBand = 8)

    assert(math.abs(predHealthy - 963000L) < 2000, s"planner sanity: $predHealthy")
    assert(math.abs(predLossy - 100000L) < 2000, s"planner sanity: $predLossy")

    // 500 Bernoulli trials per config: +/-50000 ppm is ~4 sigma at either p
    assert(math.abs(measHealthy - predHealthy) < 50000,
      s"healthy config: measured $measHealthy vs predicted $predHealthy ppm")
    assert(math.abs(measLossy - predLossy) < 50000,
      s"lossy config: measured $measLossy vs predicted $predLossy ppm")

    // the headline the harness exists for: it DETECTS the predicted loss
    assert(measHealthy - measLossy > 500000,
      s"recall drop not detected: healthy $measHealthy vs lossy $measLossy")
  }
}
