package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W1/W2 — sliding sequence windower (SURVEY §2.6), the reference's
  * signature operator.
  *
  * Reference: `make_sequences_from_df_single_class`
  * (func_aux/func_preproc.py:206-247): over the globally time-sorted split,
  * emit windows `rows[start, start+seq_len)` for `start = 0, step, 2·step…`;
  * the label / episode id / per-window Attack/State come from the window's
  * LAST row (func_preproc.py:235-237; W2 at func_preproc.py:458-475).
  * Window-count law: `n_windows = 1 + (n − seq_len) / step`
  * (pipeline_tests_power.py:154). Windows deliberately cross attack/state
  * boundaries — they slide over the concatenated sorted split (SURVEY §7.4.2).
  *
  * Spark-first design: a rows-between window frame
  * `rowsBetween(-(seqLen-1), 0)` + `collect_list`, then keep only rows where
  * `rn >= seqLen && (rn - seqLen) % step == 0`. The current row IS the
  * window end, so label/episode/state columns ride along for free.
  *
  * Scale note (SURVEY §4.2): the reference's order is GLOBAL per split, and
  * `Window.orderBy` without `partitionBy` is a single partition — correct
  * but serial. [[slideGlobal]] therefore accepts partition columns when the
  * caller's semantics allow (per-entity series — the common case at 100 TB:
  * partition by device/user, order by time, windows never cross entities,
  * full parallelism). For the reference's truly-global variant at bench
  * scale, [[slideGlobalChunked]] range-partitions on the order column with
  * `seqLen-1` rows of overlap replicated between adjacent chunks via a
  * bounded self-union, so no single-partition bottleneck.
  */
object SlidingWindows {

  /** Sliding windows per partition group (the scalable form).
    *
    * Adds: `win_id` (window end's row_number within the group, 1-based),
    * `window` = array of the last `seqLen` values of `features` (oldest
    * first). Rows that are not a window end are dropped.
    */
  def slide(
      df: DataFrame,
      partitionCols: Seq[String],
      orderCols: Seq[Column],
      features: Column,
      seqLen: Int,
      step: Int): DataFrame = {
    require(seqLen >= 1 && step >= 1, "seqLen and step must be >= 1")
    val part =
      if (partitionCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(partitionCols.map(col): _*)
    val w = part.orderBy(orderCols: _*)
    val frame = w.rowsBetween(-(seqLen - 1), 0)
    df.withColumn("win_id", row_number().over(w))
      .withColumn("window", collect_list(features).over(frame))
      .where(col("win_id") >= seqLen &&
        pmod(col("win_id") - seqLen, lit(step)) === 0)
  }

  /** Reference-exact global sliding windows (single total order, one
    * logical sequence). Correct at any scale but serializes the window
    * stage through one partition — use [[slide]] with partition columns or
    * [[slideGlobalChunked]] when the data is large. */
  def slideGlobal(df: DataFrame, orderCols: Seq[Column], features: Column,
      seqLen: Int, step: Int): DataFrame =
    slide(df, Seq.empty, orderCols, features, seqLen, step)

  /** Global sliding windows without the single-partition cliff.
    *
    * Plan: rank rows globally once (one pass), assign each row to a chunk
    * of `chunkSize` window-ends, and replicate the `seqLen-1` rows that
    * each chunk needs from its predecessor's tail. Each chunk then builds
    * its windows independently with an ordinary partitioned window frame.
    * Cost: one global rank + one narrow duplication of a `(seqLen-1) /
    * chunkSize` fraction of rows — embarrassingly parallel afterwards.
    */
  def slideGlobalChunked(
      df: DataFrame,
      orderCols: Seq[Column],
      features: Column,
      seqLen: Int,
      step: Int,
      chunkSize: Int = 65536): DataFrame = {
    require(chunkSize >= seqLen, "chunkSize must be >= seqLen")
    val ranked = df
      .withColumn("__rn", row_number().over(Window.orderBy(orderCols: _*)))
    // Home chunk of each row, plus a copy into the NEXT chunk for rows in
    // the trailing seqLen-1 positions (they seed the next chunk's frames).
    val home = ranked.withColumn("__chunk", ((col("__rn") - 1) / chunkSize).cast("long"))
    val tail = ranked
      .where(pmod(col("__rn") - 1, lit(chunkSize)) >= chunkSize - (seqLen - 1))
      .withColumn("__chunk", ((col("__rn") - 1) / chunkSize).cast("long") + 1)
    val chunked = if (seqLen == 1) home else home.unionByName(tail)
    val w = Window.partitionBy(col("__chunk")).orderBy(col("__rn"))
    chunked
      .withColumn("window", collect_list(features).over(w.rowsBetween(-(seqLen - 1), 0)))
      // A row is a real window end only in its HOME chunk, with a full frame
      // behind it and on the step grid (global __rn = win end position).
      .where(((col("__rn") - 1) / chunkSize).cast("long") === col("__chunk") &&
        col("__rn") >= seqLen &&
        pmod(col("__rn") - seqLen, lit(step)) === 0)
      .withColumnRenamed("__rn", "win_id")
      .drop("__chunk")
  }

  /** Distributed global row index: range-repartition on the order
    * columns, sort within partitions, then add partition-offset +
    * local-position — the classic parallel zipWithIndex. Two passes over
    * the data (per-partition counts, then indexing), both fully
    * parallel — this removes the single-partition `row_number` from the
    * global-order path entirely. RDD used deliberately: per-partition
    * imperative logic is the documented exception (builder brief). */
  def withGlobalIndex(df: DataFrame, orderCols: Seq[Column], out: String,
      numPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    // NOT cached: both jobs share the RDD lineage, so the range-exchange
    // map stage is skipped on the second job (shuffle-file reuse); only
    // the in-partition sort re-runs. Caching here would pin a full copy
    // of the dataset with no unpersist point (the caller owns the
    // returned plan's lifetime).
    val rdd = sorted.rdd
    val counts = rdd.mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
      .collect().sortBy(_._1).map(_._2.toLong)
    val offsets = counts.scanLeft(0L)(_ + _)
    val indexed = rdd.mapPartitionsWithIndex { (i, it) =>
      var k = offsets(i)
      it.map { r => k += 1; Row.fromSeq(r.toSeq :+ k) }
    }
    val schema = StructType(sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    df.sparkSession.createDataFrame(indexed, schema)
  }

  /** Distributed running total of `value` in global `orderCols` order —
    * the prefix-sum companion of [[withGlobalIndex]]: range-repartition +
    * in-partition sort, per-partition totals collected once, then one
    * parallel pass adds the partition offset to the local running sum.
    * No single-partition cumulative window anywhere. */
  def withRunningTotal(df: DataFrame, orderCols: Seq[Column], value: Column,
      out: String, numPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val prepped = df.withColumn("__rt_v", value.cast("long"))
    val sorted = prepped.repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val rdd = sorted.rdd
    val vIdx = sorted.schema.fieldIndex("__rt_v")
    val sums = rdd.mapPartitionsWithIndex((i, it) =>
        Iterator((i, it.map(_.getLong(vIdx)).sum)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(0L)(_ + _)
    val withTotal = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { r => acc += r.getLong(vIdx); Row.fromSeq(r.toSeq :+ acc) }
    }
    val schema = StructType(sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    df.sparkSession.createDataFrame(withTotal, schema).drop("__rt_v")
  }

  /** The fully-parallel physical form of [[slideGlobal]] for long windows
    * and large data: global index via [[withGlobalIndex]] (no
    * single-partition stage anywhere), chunk assignment with `seqLen−1`
    * overlap, then an iterator ring buffer per chunk — O(n + windows·T)
    * work instead of collect_list's O(n·T) frame materialization, and no
    * per-row array allocation for rows that aren't window ends.
    * Byte-equal to [[slideGlobal]] (spec-enforced). */
  def slideGlobalStreaming(df: DataFrame, orderCols: Seq[Column], features: Column,
      seqLen: Int, step: Int, chunkSize: Int = 65536, rangePartitions: Int = 0): DataFrame = {
    require(chunkSize >= seqLen, "chunkSize must be >= seqLen")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}
    val spark = df.sparkSession
    val withFeat = df.withColumn("__feat", features)
    val indexed = withGlobalIndex(withFeat, orderCols, "__rn", rangePartitions)
    val home = indexed.withColumn("__chunk", ((col("__rn") - 1) / chunkSize).cast("long"))
    val tail = indexed
      .where(pmod(col("__rn") - 1, lit(chunkSize)) >= chunkSize - (seqLen - 1))
      .withColumn("__chunk", ((col("__rn") - 1) / chunkSize).cast("long") + 1)
    val chunked = (if (seqLen == 1) home else home.unionByName(tail))
      .repartition(col("__chunk"))
      .sortWithinPartitions(col("__chunk"), col("__rn"))
    val inSchema = chunked.schema
    val featIdx = inSchema.fieldIndex("__feat")
    val rnIdx = inSchema.fieldIndex("__rn")
    val chunkIdx = inSchema.fieldIndex("__chunk")
    val keepIdx = inSchema.fields.indices
      .filterNot(i => i == featIdx || i == rnIdx || i == chunkIdx)
    val outSchema = StructType(
      keepIdx.map(inSchema.fields).toArray :+
        StructField("win_id", LongType, nullable = false) :+
        StructField("window", ArrayType(inSchema.fields(featIdx).dataType), nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val cs = chunkSize.toLong
    chunked.mapPartitions { it =>
      var curChunk = Long.MinValue
      val buf = new scala.collection.mutable.ArrayDeque[Any](seqLen)
      it.flatMap { r =>
        val chunk = r.getLong(chunkIdx)
        if (chunk != curChunk) { curChunk = chunk; buf.clear() }
        val rn = r.getLong(rnIdx)
        buf.append(r.get(featIdx))
        if (buf.size > seqLen) buf.removeHead()
        val isHome = (rn - 1) / cs == chunk
        if (isHome && rn >= seqLen && (rn - seqLen) % step == 0)
          Some(Row.fromSeq(keepIdx.map(r.get) :+ rn :+ buf.toSeq))
        else None
      }
    }(enc)
  }

  /** G6 — per-window summary stats over the window array, computed with
    * array expressions (no shuffle, no explode): for feature j of an
    * `array<array<double>>` window, mean/std(population)/min/max across the
    * time axis. Ref: summarize_windows_stats, func_aux/func_models.py:351-391. */
  def windowFeatureStats(window: Column, featureIdx: Int): Map[String, Column] = {
    val series = transform(window, r => element_at(r, featureIdx + 1))
    val n = size(window).cast("double")
    val mean = aggregate(series, lit(0.0), (a, x) => a + x) / n
    val var0 = aggregate(series, lit(0.0), (a, x) => a + (x - mean) * (x - mean)) / n
    Map(
      "mean" -> mean,
      "std" -> sqrt(var0),
      "min" -> array_min(series),
      "max" -> array_max(series))
  }
}
