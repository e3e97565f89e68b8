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

  /** Z-order (Morton) interleaving key over integer dimension columns —
    * the multi-dimensional data-layout primitive: sorting/range-
    * partitioning 100 TB of parquet by this key keeps the per-file
    * min/max footer ranges tight on EVERY dimension at once, so a scan
    * filtered on any single dimension prunes most files (a single-column
    * sort only prunes on that column). This is the layout trick behind
    * Delta/Iceberg `ZORDER BY`, expressed as a plain deterministic
    * column: bit j of dimension i lands at interleaved position
    * `j * dims + i`.
    *
    * Each dimension is masked to its low `bits` bits first (callers
    * rank/bucket raw values into [0, 2^bits) — e.g.
    * `ntile`/[[Stats.applyQuantileBins]] for continuous columns; the
    * mask keeps negative/overflowing inputs well-defined: two's-
    * complement low bits, identical across engines). The expression is
    * a pure `bits × dims`-term shift/AND/OR sum — codegen'd, no UDF,
    * and with an exact DuckDB twin ([[zorderKeySql]], oracle
    * `layout_zorder`). `bits × dims` must fit a signed long (≤ 62). */
  def zorderKey(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty && bits >= 1 && bits * dims.size <= 62,
      "need >= 1 dims and bits * dims <= 62")
    val k = dims.size
    val terms = for {
      j <- 0 until bits
      i <- dims.indices
    } yield shiftleft(
      shiftright(dims(i).cast("long"), j).bitwiseAND(lit(1L)),
      j * k + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** DuckDB twin of [[zorderKey]]: the same shift/AND/OR sum as SQL text
    * over per-dimension expressions. */
  def zorderKeySql(dims: Seq[String], bits: Int): String = {
    require(dims.nonEmpty && bits >= 1 && bits * dims.size <= 62,
      "need >= 1 dims and bits * dims <= 62")
    val k = dims.size
    val terms = for {
      j <- 0 until bits
      i <- dims.indices
    } yield s"(((CAST(${dims(i)} AS BIGINT) >> $j) & 1) << ${j * k + i})"
    terms.mkString("(", " | ", ")")
  }

  /** Write `df` as parquet z-ordered on `dims`: range-partition by the
    * Morton key into `numFiles` tasks, sort within each, one file per
    * task. Every output file then covers a compact hyper-rectangle-ish
    * region of the dim space — its parquet column min/max footers are
    * tight on all dims, which is what downstream scan pruning reads.
    * (The ZOrderLayoutSpec asserts the locality property directly on the
    * partition ranges.) */
  def writeZOrdered(df: DataFrame, path: String, dims: Seq[Column],
      bits: Int, numFiles: Int): Unit = {
    require(numFiles >= 1, "numFiles must be >= 1")
    val keyed = df.withColumn("__z", zorderKey(dims, bits))
    keyed.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Pre-join cardinality audit — predict the equi-join's output WITHOUT
    * running it: |a ⋈ b| = Σ_k n_a(k)·n_b(k) over the two per-key count
    * tables (bounded by distinct keys, not rows). The "will this join
    * explode" check that pairs with [[skewReport]]: a 100 TB join is
    * cheap to predict and expensive to discover, and the per-key product
    * also surfaces the hot key AQE will fight with. One groupBy per
    * side + one count-table join; exact integers throughout. Returns one
    * row: rows_a/b, output_rows, n_keys_joined, max_key_output,
    * top1_key, and amplification = output / max(rows_a, rows_b). */
  def joinCardinality(a: DataFrame, b: DataFrame, keyA: Column,
      keyB: Column): DataFrame = {
    val ca = a.groupBy(keyA.cast("string").as("__k"))
      .agg(count(lit(1)).as("__na"))
    val cb = b.groupBy(keyB.cast("string").as("__k"))
      .agg(count(lit(1)).as("__nb"))
    val prod = ca.join(cb, "__k")
      .select(col("__k"), (col("__na") * col("__nb")).as("__p"))
    val joined = prod.agg(
      coalesce(sum(col("__p")), lit(0L)).cast("long").as("output_rows"),
      count(lit(1)).as("n_keys_joined"),
      coalesce(max(col("__p")), lit(0L)).cast("long").as("max_key_output"),
      min(struct((-col("__p")).as("neg"), col("__k").as("k")))
        .getField("k").as("top1_key"))
    val na = a.agg(count(lit(1)).as("rows_a"))
    val nb = b.agg(count(lit(1)).as("rows_b"))
    na.crossJoin(nb).crossJoin(joined).select(
      col("rows_a"), col("rows_b"), col("output_rows"),
      col("n_keys_joined"), col("max_key_output"), col("top1_key"),
      round(col("output_rows").cast("double")
        / greatest(col("rows_a"), col("rows_b")).cast("double"), 6)
        .as("amplification"))
  }

  /** Key-skew diagnosis report — the measurement that decides BETWEEN
    * this file's remedies (plain shuffle vs [[saltedJoin]] vs AQE skew
    * handling) before a 100 TB join/groupBy is launched. One map-side-
    * combined key count, then one aggregation over the (bounded-by-
    * distinct-keys) count table:
    *
    *  - `n_rows`, `n_keys`, `max_key_rows`, `max_share` — the heaviest
    *    key's fraction of all rows,
    *  - `skew_ratio` — max key count over the MEAN key count (1 =
    *    uniform; a shuffle partition is only as balanced as this allows),
    *  - `top1_key` — the heaviest key (max-count, ties to the smallest
    *    key string — deterministic),
    *  - `suggested_salt` — ⌈max_key_rows / (n_rows / parallelism)⌉
    *    clipped to ≥ 1: the replication factor that levels the heaviest
    *    key across `parallelism` ideal partitions (the factor
    *    [[saltedJoin]] takes).
    *
    * All released numbers are exact-integer counts or single divisions
    * of them — engine-portable. */
  def skewReport(df: DataFrame, key: Column, parallelism: Int): DataFrame = {
    require(parallelism >= 1, "parallelism must be >= 1")
    val counts = df.groupBy(key.cast("string").as("__k"))
      .agg(count(lit(1)).as("__n"))
    counts.agg(
        sum(col("__n")).cast("long").as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("__n")).cast("long").as("max_key_rows"),
        min(struct((-col("__n")).as("neg"), col("__k").as("k")))
          .getField("k").as("top1_key"))
      .select(col("n_rows"), col("n_keys"), col("max_key_rows"),
        col("top1_key"),
        round(col("max_key_rows").cast("double")
          / col("n_rows").cast("double"), 6).as("max_share"),
        round(col("max_key_rows").cast("double")
          / (col("n_rows").cast("double") / col("n_keys").cast("double")),
          6).as("skew_ratio"),
        greatest(lit(1L), ceil(col("max_key_rows").cast("double")
          / (col("n_rows").cast("double") / parallelism)).cast("long"))
          .as("suggested_salt"))
  }
}
