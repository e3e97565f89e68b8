package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fitted hashed bag-of-words logistic model: sparse bucket → weight map
  * (only buckets seen in training carry weight; unseen buckets score 0),
  * a bias term, and the hash-bucket domain. A MODEL by construction —
  * bounded by `numBuckets`, never by corpus size. */
case class TextLinearModel(weights: Map[Long, Double], bias: Double,
    numBuckets: Int)

/** FastText-style linear quality classifier over hashed bag-of-words
  * features (Joulin et al. 2016, "Bag of Tricks for Efficient Text
  * Classification" — public method): logistic regression on
  * length-normalized hashed token counts, trained by full-batch gradient
  * descent, shipped as a train-once / score-forever projection column.
  * This is the quality-filter stage of a web-scale curation pipeline
  * (CCNet / FineWeb-style): fit on a labeled slice (reference corpus vs
  * crawl), then score every ingested document — batch or stream.
  *
  * Features: x_b(d) = cnt_b(d) / n(d) over `numBuckets` hash buckets of
  * the lower-cased whitespace tokens ([[IntHash.stringHash]] —
  * engine-portable, so one full training epoch has an exact DuckDB twin,
  * `quality_classifier`). Model: p(d) = σ(bias + w·x(d)).
  *
  * Distributed shape, per epoch: margins come from the SCORER-style
  * literal-map projection (the current weights interpolated as a
  * `typedLit` map, the same shipping shape as [[scorer]]) — a fully
  * NARROW pass over the cached tokenized frame, no join, no doc-keyed
  * shuffle — and the gradient is ONE map-side-combined
  * `groupBy(bucket)` over the per-token contributions err/n (the
  * partial aggregates collapse to ≤ numBuckets+1 rows per partition
  * before the exchange), collected to the driver (the model update is
  * driver-side because the model is tiny, the DATA never is). The bias
  * gradient rides the same aggregation as pseudo-bucket −1 (constant
  * feature 1.0), so each epoch is exactly one tiny shuffle + one
  * collect. (The pre-round-9 form joined a broadcast weight table and
  * re-joined per-doc errors — 2 joins + 2 wide aggregations per epoch;
  * the literal-map margin makes both joins unnecessary.) Nothing
  * quadratic, nothing single-partition; the published recipe fits on a
  * sample anyway (compose with [[Stats.stratifiedSample]]).
  *
  * Determinism: weights are rounded to 9 decimals after every update —
  * the float-summation-order noise of a distributed gradient is below
  * that, so fitted models are bit-stable across partitionings AND across
  * engines (the oracle's 1-epoch closed form lands on the same rounded
  * weights: with w = 0, σ(0) = 0.5 exactly, so the first gradient is an
  * order-free sum of exact-ratio terms).
  */
object LinearModel {

  private def round9(x: Double): Double = math.rint(x * 1e9) / 1e9

  private def toks(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** (id, __b, __x) hashed length-normalized features; docs with zero
    * tokens contribute no rows (they still train/score through the
    * bias). */
  def hashedFeatures(df: DataFrame, id: String, text: Column,
      numBuckets: Int): DataFrame = {
    require(numBuckets >= 2, "numBuckets must be >= 2")
    df.select(col(id), toks(text).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .select(col(id), col("__n"), explode(col("__toks")).as("__tk"))
      .select(col(id), col("__n"),
        pmod(IntHash.stringHash(col("__tk")), lit(numBuckets))
          .cast("long").as("__b"))
      .groupBy(col(id), col("__n"), col("__b"))
      .agg(count(lit(1)).as("__cnt"))
      .select(col(id), col("__b"), (col("__cnt") / col("__n")).as("__x"))
  }

  /** Fit by `epochs` full-batch GD steps at rate `lr` from w = 0. `label`
    * must be 0/1 (castable). Returns the fitted [[TextLinearModel]]. */
  def trainTextClassifier(df: DataFrame, id: String, text: Column,
      label: Column, numBuckets: Int = 1024, epochs: Int = 5,
      lr: Double = 1.0): TextLinearModel = {
    require(epochs >= 1 && lr > 0.0, "need epochs >= 1 and lr > 0")
    val bucketOf: Column => Column = tk =>
      pmod(IntHash.stringHash(tk), lit(numBuckets)).cast("long")
    val base = df.select(col(id).as("__id"),
        label.cast("double").as("__y"), toks(text).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .cache()
    val nDocs = base.count().toDouble
    require(nDocs > 0, "empty training frame")
    var bias = 0.0
    var w = Map.empty[Long, Double]
    for (_ <- 1 to epochs) {
      // margin via the literal-map scorer shape — narrow, no join;
      // x_b = cnt_b/n means the per-token fold of w(bucket)/n is the
      // same dot product (summation regrouped; the post-update 9-dp
      // rounding absorbs the order noise, as the partitioning-
      // determinism spec pins)
      val dot =
        if (w.isEmpty) lit(0.0)
        else {
          val wCol = typedLit(w)
          when(col("__n") === 0, lit(0.0)).otherwise(
            aggregate(col("__toks"), lit(0.0), (acc, tk) => acc +
              coalesce(element_at(wCol, bucketOf(tk)), lit(0.0)))
              / col("__n"))
        }
      val e = (sigmoid(lit(bias) + dot) - col("__y")).as("__e")
      // bias as pseudo-bucket −1 with constant feature 1.0: the bias
      // gradient rides the same aggregation as the weight gradient
      val grads = base.select(col("__n"), col("__toks"), e)
        .select(explode(concat(
          transform(col("__toks"), tk => struct(bucketOf(tk).as("__b"),
            (col("__e") / col("__n")).as("__g"))),
          array(struct(lit(-1L).as("__b"), col("__e").as("__g"))))).as("__r"))
        .groupBy(col("__r.__b").as("__b")).agg(sum(col("__r.__g")).as("__g"))
        .collect() // bounded: <= numBuckets + 1 rows (the model, not the data)
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      bias = round9(bias - lr * grads.getOrElse(-1L, 0.0) / nDocs)
      w = (w.keySet ++ (grads.keySet - (-1L))).iterator.map { b =>
        b -> round9(w.getOrElse(b, 0.0) -
          lr * grads.getOrElse(b, 0.0) / nDocs)
      }.toMap
    }
    base.unpersist()
    TextLinearModel(w, bias, numBuckets)
  }

  /** Score-forever projection for a fitted model: a stateless per-row
    * column (native tokenization → literal-map bucket lookups → in-row
    * sum), the [[TextOps.dsirScorer]] shipping shape — no join, no state,
    * applies unchanged to batch and Structured Streaming frames. Docs
    * with no tokens score σ(bias). */
  def scorer(model: TextLinearModel): Column => Column = {
    val wCol =
      if (model.weights.isEmpty) typedLit(Map(-1L -> 0.0))
      else typedLit(model.weights)
    text => {
      val t = toks(text)
      val dot = when(size(t) === 0, lit(0.0)).otherwise(
        aggregate(t, lit(0.0), (acc, tk) => acc +
          coalesce(element_at(wCol,
            pmod(IntHash.stringHash(tk), lit(model.numBuckets)).cast("long")),
            lit(0.0))) / size(t))
      sigmoid(lit(model.bias) + dot)
    }
  }

  /** Mean binary log-loss of a fitted model over a frame — the
    * convergence diagnostic (one aggregation pass with the scorer
    * column inlined; probabilities clamped away from 0/1). */
  def logLoss(df: DataFrame, text: Column, label: Column,
      model: TextLinearModel): Double = {
    val p0 = scorer(model)(text)
    val p = least(greatest(p0, lit(1e-12)), lit(1.0 - 1e-12))
    val y = label.cast("double")
    df.agg(avg(-(y * log(p) + (lit(1.0) - y) * log(lit(1.0) - p))))
      .collect()(0).getDouble(0)
  }
}
