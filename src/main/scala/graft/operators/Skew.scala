package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated joins: salt the hot side, replicate the small side.
  *
  * AQE's skew-join splitting handles most skew at runtime; explicit salting
  * remains necessary when a single join KEY is hot (AQE can only split
  * partitions, not keys) — e.g. the null/default customer id owning 5% of a
  * 100 TB fact table. The fact side gets a uniform random-ish salt derived
  * from a row hash (deterministic — no rand(), so retries/replays agree);
  * the dimension side is exploded `saltBuckets`× and the join key becomes
  * (key, salt). */
object Skew {

  /** Inner-join `fact` with (much smaller) `dim` on `factKey === dimKey`,
    * spreading each hot key over `saltBuckets` shuffle partitions.
    * `factSaltSource` should be any column(s) roughly unique per row
    * (a row id); the salt is `pmod(hash(source), saltBuckets)`. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: Column, dimKey: Column,
                 factSaltSource: Column, saltBuckets: Int): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(hash(factSaltSource), lit(saltBuckets)))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted
      .join(replicated, factKey === dimKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
