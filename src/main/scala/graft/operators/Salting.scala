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
    * NULL values are dropped before the dedup so the result is identical to
    * `count(DISTINCT value)`, which never counts NULL (ADVICE r2) — without
    * the filter, a surviving (key, NULL) pair would inflate the count by 1.
    * A key whose values are ALL null must still appear with count 0 (as it
    * does under `groupBy(key).agg(countDistinct(value))`), so the counts
    * are left-joined back onto the distinct key set — one extra aggregation
    * over keys only, which shuffles one row per distinct key per partition.
    * ScaleSpec pins the equivalence including null rows and all-null keys.
    */
  def skewResistantDistinctCount(df: DataFrame, key: String, value: String): DataFrame = {
    val keys = df.select(col(key)).distinct()
    val counts = df.select(col(key), col(value)).where(col(value).isNotNull).distinct()
      .groupBy(col(key)).agg(count(lit(1)).as("nd"))
    keys.join(counts, Seq(key), "left")
      .select(col(key), coalesce(col("nd"), lit(0L)).as("n_distinct"))
  }

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
