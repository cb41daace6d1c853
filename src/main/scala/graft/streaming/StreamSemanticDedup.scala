package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming semantic dedup (SURVEY §2b S11) — the streaming sibling of
  * [[graft.operators.KMeans.semanticPrune]]: vectors arrive continuously,
  * each is assigned to its nearest (static, broadcast-with-the-task)
  * centroid, and within each cluster a vector is admitted only when no
  * ALREADY-ADMITTED cluster-mate has quantized cosine ≥ τ — the greedy
  * keep-first gate every online dedup runs (MinHash-LSH admission works
  * the same way).
  *
  * Semantics vs the batch rule: batch SemDeDup drops a vector when ANY
  * lower-id mate is similar (kept or not), the stream compares only
  * against KEPT mates — a chain a~b~c (a~c dissimilar) keeps {a, c} here
  * but {a} there. Arrival-order-greedy is the only causal choice online
  * (a dropped vector cannot veto later arrivals it was never stored
  * for); the spec pins both the agreement case and this divergence, and
  * batch [[graft.operators.KMeans.semanticPrune]] over the settled
  * corpus is the replay/repair path — the [[StreamFunnel]] contract.
  *
  * State is the kept vectors themselves, per cluster — O(Σ kept·dim),
  * capped at `maxKept` per cluster: a cluster whose kept-set is full
  * DROPS further arrivals (emits nothing for them; `kept_full` would be
  * the monitoring counter a production sink adds). That is the
  * conservative choice — the admitted stream stays dup-free under the
  * documented bound; admit-without-recording would silently stop
  * deduplicating. Within a micro-batch, rows are processed in id order
  * (deterministic replay).
  *
  * Scale shape: centroid assignment is a pure per-row fold over the
  * centroid array (no shuffle, no state); the only shuffle is the
  * groupByKey on cid, and each cluster's comparison work is bounded by
  * `maxKept`, not stream length.
  */
object StreamSemanticDedup {

  final case class Vec(id: Long, vec: Array[Double])
  final case class Admitted(id: Long, cid: Long)

  /** Nearest centroid by the [[graft.operators.KMeans.assign]] metric:
    * quantized `floor(100·‖x−c‖²)` (saturated), ties to the lower cid.
    * The distance is the SAME `x·x − 2·x·c + c·c` three-fold expansion
    * assign evaluates — not the algebraically-equal direct `Σ(vᵢ−cᵢ)²`,
    * whose different rounding could flip the floor at a quantization
    * boundary and assign a batch/stream pair to different clusters. */
  private[streaming] def nearestCid(v: Array[Double],
                                    centroids: Array[(Long, Array[Double])]): Long = {
    val DistCap = 1L << 22
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val vv = dot(v, v)
    var bestCid = Long.MaxValue
    var bestD = Long.MaxValue
    centroids.foreach { case (cid, c) =>
      val d = vv - 2.0 * dot(v, c) + dot(c, c)
      val dq = math.min(math.floor(d * 100).toLong, DistCap)
      if (dq < bestD || (dq == bestD && cid < bestCid)) { bestD = dq; bestCid = cid }
    }
    bestCid
  }

  private[streaming] def cosQ(a: Array[Double], b: Array[Double]): Long = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) Long.MinValue
    else math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 10000).toLong
  }

  /** Admit a batch of one cluster's vectors (id order) against the kept
    * set; returns (admitted this batch, next kept state). */
  private[streaming] def admit(kept: IndexedSeq[Vec], batch: Seq[Vec],
                               simThresholdQ: Long, maxKept: Int): (Seq[Vec], IndexedSeq[Vec]) = {
    var st = kept
    val out = Seq.newBuilder[Vec]
    batch.sortBy(_.id).foreach { v =>
      if (st.length < maxKept && !st.exists(k => cosQ(k.vec, v.vec) >= simThresholdQ)) {
        st = st :+ v
        out += v
      }
    }
    (out.result(), st)
  }

  /** Start-to-end gate: assign → per-cluster greedy admission.
    * `centroids` is the static, already-trained set ([[graft.operators.KMeans.seeds]]
    * or `lloyd`'s output) — small by contract, serialized with the task.
    * Works on streaming and batch Datasets alike. */
  def admitStream(vectors: Dataset[Vec], centroids: Array[(Long, Array[Double])],
                  simThresholdQ: Long, maxKept: Int = 10000,
                  idleTimeout: Option[String] = None): Dataset[Admitted] = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    require(maxKept >= 1, s"maxKept must be >= 1, got $maxKept")
    implicit val stateEnc = Encoders.kryo[IndexedSeq[Vec]]
    implicit val outEnc = Encoders.product[Admitted]
    import vectors.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    vectors.groupByKey(v => nearestCid(v.vec, centroids))
      .flatMapGroupsWithState[IndexedSeq[Vec], Admitted](
        OutputMode.Update(), timeoutConf) {
        (cid, rows, state: GroupState[IndexedSeq[Vec]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(IndexedSeq.empty[Vec])
            val (admitted, next) = admit(prev, rows.toSeq, simThresholdQ, maxKept)
            if (next.length != prev.length) state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            admitted.map(v => Admitted(v.id, cid)).iterator
          }
      }
  }
}
