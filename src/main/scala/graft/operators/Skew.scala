package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew mitigation for heavy-hitter keys. AQE's skew-join handles most
  * cases at runtime (enabled in the session configs); explicit salting is
  * the deterministic fallback when one key dominates a shuffle so heavily
  * that a single task would own it.
  */
object Skew {

  /** Salted aggregation: groupBy(keys) where one key may dominate.
    * Two-phase: group on (key, salt) — spreading a hot key over
    * `saltBuckets` tasks — then merge the partials per key. The partial
    * aggregates must be re-aggregatable (sum/count/min/max).
    */
  def saltedCount(df: DataFrame, key: Column, saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("key"))
      .agg(sum(col("partial")).as("n"))
  }

  /** Salted join of a skewed fact against a dimension: the fact side gets a
    * random salt in [0, saltBuckets); the dimension side is exploded
    * `saltBuckets`× so every (key, salt) pair finds its match. Join key
    * becomes (key, salt) → the hot key's rows spread over saltBuckets tasks.
    * Dimension replication cost = |dim| × saltBuckets, so this is for
    * dim-sized build sides only (the same regime as a broadcast, but usable
    * when the dim is too big to broadcast yet small enough to replicate).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                 saltBuckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)).cast("int"))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(explodedDim,
      saltedFact(factKey) === explodedDim(dimKey) &&
        saltedFact("__salt") === explodedDim("__salt"))
      .drop("__salt")
  }
}
