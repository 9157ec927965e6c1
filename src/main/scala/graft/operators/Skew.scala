package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §5).
  *
  * AQE's skew-join handling covers sort-merge joins; for the cases it
  * can't (aggregations on a hot key, non-SMJ joins), salting is the
  * standard manual tool: spread one hot key over N subkeys, join
  * against an exploded small side, and the hot partition becomes N
  * even partitions.
  */
object Skew {

  /** Join `large ⋈ small` on `key`, salting the large side into
    * `buckets` deterministic subkeys (derived from `entropy`, any
    * column that varies within a key) and exploding the small side
    * `buckets`×. Result is identical to the plain join; the shuffle
    * is even. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      entropy: Column, buckets: Int): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(xxhash64(col(key), entropy), lit(buckets)))
    val exploded = small.withColumn("__salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for a skewed group key:
    * aggregate per (key, salt) first, then merge per key. For
    * algebraic aggregates Spark's hash aggregate already does
    * map-side partials; this helper is for when the *reduce* side of
    * one key overflows a task (extreme hot keys). */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      entropy: Column, buckets: Int): DataFrame = {
    df.withColumn("__salt", pmod(xxhash64(col(key), entropy), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }
}
