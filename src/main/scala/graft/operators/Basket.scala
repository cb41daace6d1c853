package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket association rules: pairwise support / confidence / lift
  * over (basket, item) co-occurrence — the classic "customers who bought X
  * also bought Y" analytics view (ref: the reference's ranked-enrichment
  * stage, `/root/reference/src/processing_pipeline.py`, is the per-key
  * top-k half of this; rules add the corpus-level conditional stats).
  *
  * Apriori pruning, Spark-shaped: item supports are ONE map-side-combinable
  * count; only items with support ≥ `minSupport` enter the pair join
  * (downward closure: a pair can't be frequent if a member isn't), so the
  * within-basket self-join runs over the frequent-item projection only.
  * `maxBasketSize` caps pathological baskets the same way the dedup
  * family caps shingle buckets — a crawler basket with 10⁵ items would
  * otherwise contribute C(10⁵,2) pairs.
  *
  * All metrics are integer-exact: `conf_ppm = (10⁶·n_pair) div n_ante`,
  * `lift_ppm = (10⁶·n_pair·N) div (n_ante·n_cons)` with the triple
  * product computed in DECIMAL(38,0), which holds to N = 10¹⁵ baskets —
  * comfortably past a 100 TB lake — where BIGINT would overflow at ~10⁹.
  *
  * Output: both rule directions (antecedent, consequent), n_pair, n_ante,
  * conf_ppm, lift_ppm for pairs with n_pair ≥ `minPairSupport`.
  */
object Basket {

  def associationRules(df: DataFrame, basketCol: Column, itemCol: Column,
                       minSupport: Long, minPairSupport: Long,
                       maxBasketSize: Int = 1000): DataFrame = {
    require(minSupport >= 1 && minPairSupport >= 1, "supports >= 1")
    // ONE grouping shuffle builds the per-basket item-set frame
    // (collect_set dedups in-row — no separate distinct pass), then every
    // downstream consumer (basket total, item marginals, pair expansion)
    // reads the materialized sets instead of re-running the input scan —
    // the frame has 3 consumers, so without the checkpoint the source
    // scan+join would execute three times.
    val sets = df.select(basketCol.as("bk"), itemCol.as("item"))
      .groupBy("bk").agg(sort_array(collect_set(col("item"))).as("items0"))
      .localCheckpoint(true)
    val nBaskets = sets.select(count(lit(1)).as("nb"))
    val itemN = sets.select(explode(col("items0")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("n_item"))
      .where(col("n_item") >= minSupport)
      .localCheckpoint(true) // vocab-sized; consumers: prune array + 2 marginal joins
    // Apriori prune IN-ROW: the frequent-item list is a 1-row broadcast
    // array (item vocabularies — brands, categories — are bounded
    // metadata; a million-item vocab should swap this for an exploded
    // equi-join), re-capped AFTER the prune so the cap is deterministic
    // on the surviving items (ordered by item id).
    val freqArr = itemN.agg(sort_array(collect_list(col("item"))).as("__freq"))
    val capped = sets.crossJoin(broadcast(freqArr))
      .select(slice(array_intersect(col("items0"), col("__freq")), 1, maxBasketSize).as("items"))
      .where(size(col("items")) >= 2)
    // Ordered pairs u < v from the in-row item array: no self-join shuffle,
    // one explode over C(|basket|,2) with |basket| ≤ cap.
    val pairs = capped.select(explode(expr(
      """flatten(transform(items, (x, i) ->
        |  transform(slice(items, i + 2, size(items)), y -> struct(x AS u, y AS v))))"""
        .stripMargin)).as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minPairSupport)
    // Both directions, then attach marginals + total for conf/lift.
    val directed = pairs.select(col("u").as("antecedent"), col("v").as("consequent"), col("n_pair"))
      .unionByName(pairs.select(col("v").as("antecedent"), col("u").as("consequent"), col("n_pair")))
    val withA = directed
      .join(itemN.select(col("item").as("antecedent"), col("n_item").as("n_ante")), "antecedent")
      .join(itemN.select(col("item").as("consequent"), col("n_item").as("n_cons")), "consequent")
      .crossJoin(broadcast(nBaskets))
    withA.select(
      col("antecedent"), col("consequent"), col("n_pair"), col("n_ante"),
      expr("(1000000 * n_pair) div n_ante").as("conf_ppm"),
      expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * n_pair * nb)
             |  div (CAST(n_ante AS DECIMAL(38,0)) * n_cons) AS BIGINT)"""
        .stripMargin).as("lift_ppm"))
  }
}
