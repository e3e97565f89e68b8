package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-aware joins the built-in equi-join surface doesn't cover: as-of
  * (point-in-time) join and point-in-interval range join.
  *
  * Both are composed from existing operators (the preferred path per the
  * build brief §custom-operators: compose before custom plans), with plan
  * shapes chosen for the 100 TB case:
  *
  *  - [[asofJoin]] is NOT a join at all: it unions the two streams, tags
  *    the side, and carries the latest right-side payload forward with one
  *    `last(_, ignoreNulls)` running window per key. ONE shuffle on the
  *    key, no point-in-time cross product, no per-row probe. Hot keys
  *    skew the per-key sort — mitigate upstream with key salting only if
  *    a single key's history exceeds a partition (the payload struct is
  *    narrow, so billions of rows per key fit a window sort).
  *
  *  - [[rangeJoin]] buckets interval and point timestamps into fixed-width
  *    bins and equi-joins on the bin before applying the exact containment
  *    predicate. Each point lands in exactly ONE bin and an interval is
  *    exploded into the bins it overlaps, so no pair is produced twice and
  *    no dedup pass is needed. Cost scales with `interval_len / binWidth`
  *    replicas per interval instead of |points|×|intervals|; AQE's skew
  *    split handles a pathological hot bin.
  */
object Joins {

  /** Backward as-of join: for every left row, attach the payload of the
    * latest right row with the same key and `right.time <= left.time`
    * (or `< ` when `exactMatch=false`). Left rows with no prior right row
    * keep a null payload (left-outer semantics).
    *
    * @param right      build side; (key, time) need not be unique — ties
    *                   on time are broken by latest-wins only if the caller
    *                   pre-deduplicates; do that for deterministic output.
    * @param payload    right-side columns to carry (names must not collide
    *                   with left's).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      exactMatch: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    // One struct per right row keeps intra-payload nulls carryable: the
    // struct itself is non-null exactly when the row came from the right.
    // Keep the native time type for ordering: epoch-nanos longs don't fit
    // exactly in a double, and an approximate sort key would disagree with
    // an exact-comparison oracle on sub-microsecond neighbors.
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(right.select(payload.map(col): _*).schema))
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__side"),
        struct(payload.map(col): _*).as("__p")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(l.schema(c).dataType).as(c)): _*)
    // At equal time the right row must be visible iff exactMatch: sort the
    // right row before (exact) or after (strict) the left row.
    val sideOrder = if (exactMatch) col("__side").asc else col("__side").desc
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__t").asc, sideOrder)
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col(s"__m.$p").as(p)): _*)
  }

  /** Point-in-interval join: rows of `points` paired with every interval
    * `[lo, hi)` of `intervals` containing them (inner semantics — empty
    * intervals drop out). Times are compared as doubles.
    *
    * `binWidth` trades interval replication (≈ len/binWidth copies) against
    * bin selectivity; pick ≈ the typical interval length.
    */
  def rangeJoin(points: DataFrame, pointTime: String, intervals: DataFrame,
      lo: String, hi: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(pointTime).cast("double") / binWidth))
    val iv = intervals.withColumn("__bin",
      explode(sequence(floor(col(lo).cast("double") / binWidth),
        floor(col(hi).cast("double") / binWidth))))
    // Bin assignment may round at double precision, but rounding-to-nearest
    // is monotone, so a point inside [lo, hi) always lands inside the
    // interval's exploded bin range; the exact predicate below uses the
    // native (e.g. long-nanos) types.
    p.join(iv, "__bin")
      .where(col(pointTime) >= col(lo) && col(pointTime) < col(hi))
      .drop("__bin")
  }

  /** Interval-overlap join: pairs (a, b) whose intervals intersect —
    * `a.lo < b.hi AND b.lo < a.hi` (half-open intervals). Completes the
    * temporal-join family (as-of = point-to-latest, range = point-in-
    * interval, this = interval-to-interval).
    *
    * Both sides explode into the fixed-width bins they span; the bin
    * equi-join bounds candidates to co-binned intervals. A pair
    * overlapping N shared bins would be produced N times, so the
    * dedup-free trick assigns each candidate pair to exactly ONE bin —
    * the bin of `greatest(a.lo, b.lo)` (the first bin where both are
    * present) — instead of a distinct pass over the join output.
    * Cost scales with span/binWidth replicas per interval. */
  def overlapJoin(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      binWidth: Double, keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("__bin", explode(sequence(
        floor(col(lo).cast("double") / binWidth),
        floor(col(hi).cast("double") / binWidth))))
    binned(left, lLo, lHi).join(binned(right, rLo, rHi), "__bin" +: keys)
      .where(col(lLo) < col(rHi) && col(rLo) < col(lHi) &&
        col("__bin") === floor(greatest(col(lLo), col(rLo)).cast("double") / binWidth))
      .drop("__bin")
  }

  /** Bloom-filtered join: the middle path between broadcast-hash (small
    * side fits in executor memory) and plain sort-merge (shuffle both
    * sides in full). A Bloom filter of the small side's keys is built
    * driver-side and broadcast — ~1.2 MB per million keys at 1% fpp,
    * ~100× smaller than the equivalent hash relation — and the big side
    * is pre-filtered BEFORE its shuffle, so the exchange carries only
    * (matches + fpp·misses) rows. The subsequent exact join removes the
    * false positives, making the result BYTE-IDENTICAL to the unfiltered
    * join (spec + oracle-enforced).
    *
    * Use when the join is selective (most big-side rows don't match) and
    * the small side exceeds the broadcast threshold. The membership probe
    * is a scalar UDF — off the codegen path, but one hash per row against
    * a shuffle of the untouched big side is the winning trade whenever
    * selectivity < ~50%. (Spark's own runtime bloom injection —
    * `spark.sql.optimizer.runtime.bloomFilter.enabled` — does this
    * adaptively; this operator is the explicit form for when the planner
    * can't see the selectivity, e.g. a filter applied by a previous
    * pipeline stage.) */
  def bloomFilteredJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    val supported = Set[DataType](LongType, IntegerType, ShortType, ByteType, StringType)
    for ((df, k) <- Seq((big, bigKey), (small, smallKey));
         dt = df.schema(k).dataType if !supported(dt))
      throw new IllegalArgumentException(s"bloomFilteredJoin: unsupported key type $dt")
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    val keep = big.schema(bigKey).dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        val f = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
        f(col(bigKey).cast("long"))
      case StringType =>
        val f = udf((k: String) => k != null && bc.value.mightContainString(k))
        f(col(bigKey))
      case dt => throw new IllegalArgumentException(
        s"bloomFilteredJoin: unsupported key type $dt")
    }
    big.where(keep).join(small, big(bigKey) === small(smallKey))
  }
}
