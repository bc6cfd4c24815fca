package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation rewrites. On a 1000-executor cluster one hot key turns a
  * shuffle into a single straggler task; these rewrites spread the hot key
  * across partitions and re-combine, trading one extra (cheap, spread)
  * stage for the straggler. AQE's skew-join splitting covers sort-merge
  * joins at runtime; these cover the aggregation-side cases it does not.
  *
  * Every rewrite is result-identical to its naive form (SaltingSpec
  * asserts equivalence) — only the physical distribution changes.
  */
object Salting {

  /** Exact distinct-count per key, skew-resistant: shuffle on (key, value)
    * — the hot key's values spread over all partitions — dedupe there, then
    * count per key. The second shuffle carries one row per DISTINCT pair,
    * which is the minimum possible. (`countDistinct` in one stage hashes
    * the whole hot key's value set into one task's aggregation state.)
    *
    * NULL handling matches `count(DISTINCT value)` exactly (ADVICE r2 +
    * review): `count(value)` over the distinct (key, value) pairs skips
    * NULL values — so a surviving (key, NULL) pair contributes 0 instead
    * of inflating the count — while the key group itself survives, so an
    * all-NULL key reports 0, and a NULL key groups like any other key (no
    * join, so no null-safe-equality trap). ScaleSpec pins the equivalence
    * including null values, all-null keys, and NULL keys.
    */
  def skewResistantDistinctCount(df: DataFrame, key: String, value: String): DataFrame =
    df.select(col(key), col(value)).distinct()
      .groupBy(col(key)).agg(count(col(value)).as("n_distinct"))

  /** Salted aggregation: partial aggregate on (key, salt) — S-way spread of
    * every key — then final combine on key. For algebraic aggregates
    * (count/sum/min/max) this is exactly the partial+final split, made
    * explicit so the spread factor is under the caller's control rather
    * than the map-partition layout's.
    */
  def saltedSum(df: DataFrame, key: String, valueCol: Column, salts: Int): DataFrame = {
    require(salts > 1)
    df.withColumn("__salt", pmod(xxhash64(valueCol), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("total"), sum(col("__n")).as("n"))
  }

  /** Salted broadcast-free join for a skewed LEFT key: left rows get a
    * deterministic salt in [0, S); the (small) right side is replicated S
    * times; the join key becomes (key, salt), so a hot left key's rows land
    * on S partitions instead of one. Result-identical to the plain join.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 1)
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val replicatedRight = right
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
