package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (builder brief: "skewed keys → salting or
  * AQE skew-join"). AQE rebalances *post-shuffle partitions*, but two
  * shapes stay skewed at the operator level and need explicit salt:
  *
  *  - exact `countDistinct` per key: every distinct value of a hot key
  *    lands on one reducer. [[countDistinctSalted]] splits each key's
  *    value space across `nSalts` reducers by value-hash (a value's salt
  *    is a function of the value, so no value is double-counted), then
  *    sums the per-salt distinct counts.
  *  - non-broadcastable joins with hot keys: [[saltedJoin]] spreads each
  *    big-side hot row over `nSalts` reducers and replicates the small
  *    side `nSalts`× — the classic replicate-salt join, for when the
  *    small side exceeds the broadcast threshold but skew would serialize
  *    a sort-merge partition.
  *
  * Both are semantically transparent (specs assert equality with the
  * unsalted form) and deterministic — the salt is content-derived
  * (xxhash64 of the value/row), never `rand()`, so task retries can't
  * double-count.
  */
object Skew {

  /** Exact distinct-`value` count per key, value-hash-salted across
    * `nSalts` reducers per key. One extra (tiny) shuffle of
    * |keys|·nSalts partial counts. */
  def countDistinctSalted(df: DataFrame, keys: Seq[String], value: Column,
      nSalts: Int, out: String = "n_distinct"): DataFrame = {
    require(nSalts >= 1)
    val salt = pmod(xxhash64(value.cast("string")), lit(nSalts))
    df.groupBy((keys.map(col) :+ salt.as("__salt")): _*)
      .agg(count_distinct(value).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__partial").as(out))
  }

  /** Replicate-salt equi-join: `big ⋈ small` on `keys`, with the big side
    * salted by content hash and the small side replicated `nSalts`×.
    * Inner join only (replication breaks outer semantics on the small
    * side). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      nSalts: Int): DataFrame = {
    require(nSalts >= 1)
    // salt from the whole big-side row content: uncorrelated with the key,
    // deterministic under retries (never rand())
    val rowHash = xxhash64(big.columns.toIndexedSeq.map(c => col(c).cast("string")): _*)
    val bigS = big.withColumn("__salt", pmod(rowHash, lit(nSalts)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(nSalts - 1L))))
    bigS.join(smallS, keys :+ "__salt").drop("__salt")
  }
}
