package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Scorers, WindowScorer}
import graft.ops._

/** End-to-end experiment pipelines composing the operator library —
  * the Spark re-expression of the reference's 4-stage experiment family
  * (SURVEY §0, §3).
  *
  * Stage map (reference → here):
  *  - pipeline1 train:  pipeline_trainingmodels_power.py:78-359 → [[Pipeline1.run]]
  *  - pipeline2 surrogate: pipeline_expl_power.py:55-233 → [[Pipeline2.run]]
  *  - pipeline3A robustness: pipeline_tests_power.py:172-477 → [[Pipeline3.robustness]]
  *  - pipeline3B generalization: pipeline_tests_power.py:484-785 → [[Pipeline3.leaveOneAttackOut]]
  *
  * Every stage is ONE lazy DataFrame plan up to its sink: scan → labels →
  * split (one shuffle) → scale (one collected agg row) → windows (one
  * ordered exchange) → score → metric aggregations. Driver loops exist
  * only where the reference's semantics are inherently iterative (grid
  * cells, severity sweeps, held-out attacks) and each iteration is a
  * distributed job.
  */
object Pipeline1 {

  final case class Config(
      task: String = "binary", // binary | scenario | multiattack
      seqLen: Int = 15,
      step: Int = 1,
      fprTarget: Double = 1e-3,
      hopSeconds: Double = 1.0,
      trainFrac: Double = 0.70,
      valFrac: Double = 0.15,
      chunkSize: Int = 65536,
      // 0 = plain window G1; > 0 = the skew-immune salted split with
      // this many range buckets (ChronoSplit.withSplitSalted) — the
      // 100 TB setting when one (Attack, State) group dominates (AQE
      // splits skewed joins, not window partitions; SCALE.md chronoskew
      // row). Same rows either way — requires orderCols = (numeric ts,
      // unique tie-breakers...).
      saltedSplitBuckets: Int = 0)

  /** Wall-clock measurements the reference records into every run's
    * metrics.json (pipeline_trainingmodels_power.py:160-192,328-329;
    * func_test.py:317-327 divides predict wall-clock by n test windows;
    * latency is NaN when the test split is empty, as there). */
  final case class Timing(
      trainingTimeSeconds: Double,
      avgInferenceLatencyPerWindowSec: Double,
      nTestWindows: Long)

  final case class Result(
      windows: DataFrame,
      scored: DataFrame,
      encoder: DataFrame,
      model: graft.model.WindowModel,
      multiclass: DataFrame,
      confusion: DataFrame,
      operational: Option[BinaryOperational.OperationalMetrics],
      perState: DataFrame,
      timing: Timing,
      scaler: Map[String, (Double, Double)])

  /** Train pipeline on a labeled time series.
    *
    * @param df        input with `attackCol`, `stateCol`, feature columns,
    *                  and a total chronological order given by `orderCols`
    * @param features  numeric feature columns (scaled with train stats)
    * @param scorer    pluggable model (SURVEY §2.10)
    */
  def run(spark: SparkSession, df: DataFrame, features: Seq[String],
      attackCol: String, stateCol: String, orderCols: Seq[Column],
      scorer: WindowScorer = Scorers.Logistic(), config: Config = Config()): Result = {

    // 1. labels (P1/P2) + target per task (prepare_labels_for_task,
    //    func_preproc.py:97-125) + task filter (F3)
    val labeled = df
      .withColumn("state_bin", Labels.stateBin(col(stateCol)))
      .withColumn("attack_group", Labels.attackGroup(col(attackCol)))
      .withColumn("label_bin", Labels.binaryLabel(col(attackCol)))
      .na.drop(Seq(attackCol, stateCol))
    val (target, filtered) = config.task match {
      case "binary" => ("label_bin", labeled)
      case "scenario" => ("attack_group",
        labeled.where(lower(trim(col("attack_group"))) =!= "none"))
      case "multiattack" => (attackCol,
        labeled.where(!lower(trim(col(attackCol))).isin(Labels.BenignLike: _*)))
      case other => throw new IllegalArgumentException(s"unknown task $other")
    }

    // 2. encode y (P9, lexicographic) — broadcast joined
    val encoder = Labels.fitLabelEncoder(filtered, target)
    val encoded = Labels.encodeLabel(filtered, encoder, target, "y")

    // 3. per-(Attack, State) chronological split (G1) — one shuffle;
    //    saltedSplitBuckets > 0 swaps in the skew-immune two-phase form
    //    (row-for-row identical output, ChronoSplitSpec parity)
    val split =
      if (config.saltedSplitBuckets > 0)
        ChronoSplit.withSplitSalted(encoded, Seq(attackCol, stateCol),
          orderCols.head, orderCols.tail, config.saltedSplitBuckets,
          config.trainFrac, config.valFrac)
      else
        ChronoSplit.withSplit(encoded, Seq(attackCol, stateCol), orderCols,
          config.trainFrac, config.valFrac)

    // 4. standardize on train stats only (P10)
    val scaler = Stats.fitStandardScaler(split.where(col("split") === "train"), features)
    val scaled = Stats.applyStandardScaler(split, scaler)

    // 5. sliding windows per split (W1/W2): label/state/attack from the
    //    window's LAST row; windows slide over the concatenated sorted
    //    split (crossing attack/state boundaries — the spec, SURVEY §7.4.2)
    val featArray = array(features.map(col): _*)
    val windows = Seq("train", "val", "test").map { s =>
      SlidingWindows.slideGlobalChunked(
        scaled.where(col("split") === s), orderCols, featArray,
        config.seqLen, config.step, config.chunkSize)
        .withColumn("split", lit(s))
    }.reduce(_ unionByName _)
      .select(col("split"), col("win_id"), col("window"), col("y"),
        col(attackCol).as("attack"), col(stateCol).as("state"),
        col("state_bin").as("state_bin_last"))
      // cached: model fit + every metric aggregation below re-reads the
      // windows; the caller owns Result.windows and may unpersist when
      // done (mirrors the reference persisting windows.npz once)
      .cache()

    // 6. train + score. Force the window cache BEFORE the fit timer so
    //    training_time_seconds measures the fit alone (the reference fits
    //    on pre-materialized npz arrays, func_models.py:339).
    windows.count()
    val tTrain0 = System.nanoTime()
    val model = scorer.fit(windows.where(col("split") === "train"))
    val trainingTimeSeconds = (System.nanoTime() - tTrain0) / 1e9
    val scored = model.transform(windows)

    // 7. metrics: G9/G13 on test; G16 operational for binary; F10 per-state
    val k = encoder.count().toInt
    val test = scored.where(col("split") === "test")
    // Inference latency: wall-clock of ONE forced scoring pass over the
    // test windows / their count (func_test.py:317-327). The aggregate
    // reads proba so Catalyst cannot prune the scoring expressions away
    // (a bare count() would).
    val tPred0 = System.nanoTime()
    val nTestWindows = test
      .agg(count(lit(1)), sum(element_at(col("proba"), 1))).head().getLong(0)
    val predSeconds = (System.nanoTime() - tPred0) / 1e9
    val avgLatency =
      if (nTestWindows > 0) predSeconds / nTestWindows else Double.NaN
    val confusion = MetricsOps.confusionMatrix(test, "y", "y_pred", 0 until k)
    val multiclass = MetricsOps.multiclassMetrics(test, "y", "y_pred", 0 until k)
    val operational =
      if (config.task == "binary" && k == 2) {
        // attack-class proba: class id of "attack" under lexicographic
        // encoding ("attack" < "benign" → id 0)
        val attackId = encoder.where(col("class") === "attack")
          .head().getAs[Int]("y")
        val score = element_at(col("proba"), attackId + 1)
        Some(BinaryOperational.evaluate(
          scored.where(col("split") === "val"),
          test,
          when(col("y") === attackId, 1).otherwise(0), score,
          config.fprTarget, config.hopSeconds))
      } else None
    val perState = MetricsOps.multiclassMetricsPerGroup(
      test.withColumn("state_slice",
        when(col("state_bin_last") >= 0.5, "charging").otherwise("idle")),
      "state_slice", "y", "y_pred", 0 until k)

    Result(windows, scored, encoder, model, multiclass, confusion, operational,
      perState, Timing(trainingTimeSeconds, avgLatency, nTestWindows), scaler)
  }

  final case class GridCell(
      name: String,
      task: String,
      model: String,
      seqLen: Int,
      step: Int,
      outcome: scala.util.Try[Result])

  /** Experiment-grid driver with per-cell failure isolation — the
    * reference's entry-point loop (run_pipeline_train_network.py:48-71,
    * run_pipeline_train_power.py:36-73): iterate task × model × seq_len ×
    * step, try/except each cell so one bad config cannot kill the sweep,
    * and give every run its own artifact directory.
    *
    * Per successful cell (when `outputRoot` is set) writes
    * `<root>/<task>_<model>_seq<L>_step<S>/{metrics.json,config.json}` in
    * the `{"metrics": {...}}` / `{"config": {...}}` shape that
    * [[graft.sources.Sources.harvestJson]] + `flattenStructs` re-ingest
    * (S8/J3) — the grid's output is its own harvestable run tree.
    * metrics.json carries the multiclass row plus `training_time_seconds`
    * and `avg_inference_latency_per_window_sec` (NaN-sanitized to null).
    *
    * Memory at grid scale: each cell's window cache is released once its
    * artifacts are written (126 concurrent caches would pin the cluster);
    * a returned Result's `windows` recomputes lazily if re-used. */
  def runGrid(spark: SparkSession, df: DataFrame, features: Seq[String],
      attackCol: String, stateCol: String, orderCols: Seq[Column],
      tasks: Seq[String], scorers: Seq[(String, WindowScorer)],
      seqLens: Seq[Int], stepsFor: Int => Seq[Int] = l => Seq(1, l).distinct,
      outputRoot: Option[String] = None, base: Config = Config()): Seq[GridCell] = {
    val cells = for {
      task <- tasks
      (scorerName, scorer) <- scorers
      seqLen <- seqLens
      step <- stepsFor(seqLen)
    } yield (task, scorerName, scorer, seqLen, step)
    cells.map { case (task, scorerName, scorer, seqLen, step) =>
      val name = s"${task}_${scorerName}_seq${seqLen}_step$step"
      val outcome = scala.util.Try {
        val res = run(spark, df, features, attackCol, stateCol, orderCols,
          scorer, base.copy(task = task, seqLen = seqLen, step = step))
        outputRoot.foreach { root =>
          val runDir = java.nio.file.Paths.get(root, name)
          java.nio.file.Files.createDirectories(runDir)
          val metricsDoc = graft.sources.Sources.sanitizeDoubles(
            res.multiclass
              .withColumn("training_time_seconds",
                lit(res.timing.trainingTimeSeconds))
              .withColumn("avg_inference_latency_per_window_sec",
                lit(res.timing.avgInferenceLatencyPerWindowSec))
              .withColumn("n_test_windows", lit(res.timing.nTestWindows)))
            .toJSON.head()
          java.nio.file.Files.writeString(runDir.resolve("metrics.json"),
            s"""{"metrics": $metricsDoc}""")
          java.nio.file.Files.writeString(runDir.resolve("config.json"),
            s"""{"config": {"task": "$task", "model": "$scorerName", """ +
              s""""seq_len": $seqLen, "step": $step, """ +
              s""""fpr_target": ${base.fprTarget}}}""")
          // S7 artifacts per run (the reference persists model + encoder +
          // scaler alongside metrics); models that don't expose an MLlib
          // transformer (custom scorers) have nothing portable to save
          graft.model.ModelIO.saveEncoder(res.encoder,
            runDir.resolve("encoder").toString)
          graft.model.ModelIO.saveScaler(res.scaler,
            runDir.resolve("scaler").toString)
          if (res.model.isInstanceOf[graft.model.HasMlModel])
            graft.model.ModelIO.saveModel(res.model, runDir.resolve("model").toString)
        }
        res.windows.unpersist(blocking = false)
        res
      }
      outcome.failed.foreach { e =>
        println(s"[runGrid][error] $name failed: " +
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      GridCell(name, task, scorerName, seqLen, step, outcome)
    }
  }
}

/** Pipeline2 — surrogate explainability (pipeline_expl_power.py:55-233):
  * per-window G6 summary stats → shallow decision tree imitating the base
  * model; balanced accuracy of the imitation + exported rules. */
object Pipeline2 {
  final case class Result(stats: DataFrame, agreement: DataFrame, rules: String)

  def run(scored: DataFrame, nFeatures: Int, maxDepth: Int = 4): Result = {
    val statCols = (0 until nFeatures).flatMap { j =>
      val s = SlidingWindows.windowFeatureStats(col("window"), j)
      Seq(s("mean").as(s"mean_f$j"), s("std").as(s"std_f$j"),
        s("min").as(s"min_f$j"), s("max").as(s"max_f$j"))
    }
    val names = (0 until nFeatures).flatMap(j =>
      Seq(s"mean_f$j", s"std_f$j", s"min_f$j", s"max_f$j"))
    val stats = scored.select(
      (Seq(col("split"), col("win_id"), col("y"), col("y_pred")) ++ statCols): _*)
    val (tree, apply) = Scorers.surrogateTree(
      stats.where(col("split") === "train"), names, "y_pred", maxDepth)
    val test = apply(stats.where(col("split") === "test"))
    // agreement = surrogate vs base-model predictions (imitation quality)
    val agreement = test.agg(
      avg((col("y_pred_surrogate") === col("y_pred")).cast("double")).as("agreement"),
      avg((col("y_pred_surrogate") === col("y")).cast("double")).as("accuracy_vs_truth"))
    Result(stats, agreement, tree.toDebugString)
  }
}

/** Pipeline3 — robustness (3A) and generalization (3B). */
object Pipeline3 {

  /** 3A: severity sweep of seeded degradations over the test windows,
    * re-scored per (kind, severity, repeat); G7 mean/std across repeats.
    * The sweep is a deterministic driver loop (70 evaluations in the
    * reference, pipeline_tests_power.py:255-379); each evaluation is one
    * distributed job over the degraded windows. */
  def robustness(scored: DataFrame, model: graft.model.WindowModel,
      kinds: Seq[String] = Seq("packet_loss", "missing_variables"),
      maxSev: Double = 0.6, nSev: Int = 7, nRepeats: Int = 5,
      baseSeed: Long = 123L): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    // Every sweep evaluation re-reads the test windows; cache them for the
    // loop's lifetime (all results reduce to driver tuples → safe to
    // unpersist before returning).
    val test = scored.where(col("split") === "test")
      .select(col("win_id").cast("long").as("win_id"), col("window"), col("y"))
      .cache()
    val grid = Robustness.severityGrid(maxSev, nSev, nRepeats, baseSeed)
    val rows = for {
      kind <- kinds
      (sev, rep, seed) <- grid
    } yield {
      val degraded = kind match {
        case "packet_loss" =>
          test.withColumn("window", Robustness.packetLoss(col("window"), col("win_id"), sev, seed))
        case "missing_variables" =>
          test.withColumn("window", Robustness.missingVariables(col("window"), col("win_id"), sev, seed))
        case "clock_offset" =>
          test.withColumn("window", Robustness.clockOffset(col("window"), col("win_id"), sev, seed))
        case "drift" =>
          test.withColumn("window", Robustness.drift(col("window"), col("win_id"), sev, seed))
        case other => throw new IllegalArgumentException(s"unknown kind $other")
      }
      val rescored = model.transform(degraded)
      val acc = rescored.agg(avg((col("y_pred") === col("y")).cast("double"))).head().getDouble(0)
      (kind, sev, rep, acc)
    }
    test.unpersist(blocking = false)
    rows.toDF("kind", "severity", "rep", "accuracy")
      .groupBy("kind", "severity")
      .agg(avg("accuracy").as("accuracy_mean"),
        coalesce(stddev_samp(col("accuracy")), lit(0.0)).as("accuracy_std"))
      .orderBy("kind", "severity")
  }

  /** 3A as ONE plan (SURVEY §3.2): broadcast the (kind, severity, rep,
    * seed) grid, cross join against the test windows, degrade with
    * column-parameterized severity/seed, score once, aggregate once —
    * 2 jobs instead of kinds×severities×repeats sequential evaluations.
    * Data inflates by the grid size within the plan (the point: the
    * whole sweep parallelizes across the cluster); batch the grid if
    * windows × grid exceeds cluster memory. */
  def robustnessSweepPlan(scored: DataFrame, model: graft.model.WindowModel,
      kinds: Seq[String] = Seq("packet_loss", "missing_variables"),
      maxSev: Double = 0.6, nSev: Int = 7, nRepeats: Int = 5,
      baseSeed: Long = 123L): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val test = scored.where(col("split") === "test")
      .select(col("win_id").cast("long").as("win_id"), col("window"), col("y"))
    val grid = for {
      kind <- kinds
      (sev, rep, seed) <- Robustness.severityGrid(maxSev, nSev, nRepeats, baseSeed)
    } yield (kind, sev, rep, seed)
    val gridDf = grid.toDF("kind", "severity", "rep", "seed")
    val degraded = test.crossJoin(broadcast(gridDf))
      .withColumn("window",
        when(col("kind") === "packet_loss",
          Robustness.packetLoss(col("window"), col("win_id"), col("severity"), col("seed")))
        .when(col("kind") === "missing_variables",
          Robustness.missingVariables(col("window"), col("win_id"), col("severity"), col("seed")))
        .when(col("kind") === "clock_offset",
          Robustness.clockOffset(col("window"), col("win_id"), col("severity"), col("seed")))
        .otherwise(
          Robustness.drift(col("window"), col("win_id"), col("severity"), col("seed"))))
    model.transform(degraded)
      .groupBy("kind", "severity", "rep")
      .agg(avg((col("y_pred") === col("y")).cast("double")).as("accuracy"))
      .groupBy("kind", "severity")
      .agg(avg("accuracy").as("accuracy_mean"),
        coalesce(stddev_samp(col("accuracy")), lit(0.0)).as("accuracy_std"))
      .orderBy("kind", "severity")
  }

  /** 3B: leave-one-attack-out generalization — drop one attack from
    * train/val windows, retrain, evaluate on (a) windows of the held-out
    * attack, (b) the rest (pipeline_tests_power.py:484-785).
    *
    * `seeds` reproduces the reference's repeat loop
    * (`seeds = [seed + i for i in range(n_repeats)]`,
    * pipeline_tests_power.py:569): each held-out attack is re-trained once
    * per seed via [[graft.model.WindowScorer.seeded]] and the per-repeat
    * accuracies are aggregated mean ± std (ddof=1, 0.0 for a single
    * repeat — G7 semantics). Deterministic scorers (Logistic) make the
    * repeats identical (std 0); stochastic ones (GBT seed, future
    * stand-ins) get real error bars. */
  def leaveOneAttackOut(windows: DataFrame, scorer: WindowScorer,
      attacks: Seq[String], seeds: Seq[Long] = Seq(42L)): DataFrame = {
    val spark = windows.sparkSession
    import spark.implicits._
    require(seeds.nonEmpty, "at least one seed")
    val rows = for (held <- attacks; seed <- seeds) yield {
      val train = windows.where(col("split") === "train" && col("attack") =!= held)
      val model = scorer.seeded(seed).fit(train)
      val test = model.transform(windows.where(col("split") === "test"))
      // both slices in ONE aggregation job (conditional averages) — the
      // test windows are scored once per (held-out attack, seed), not twice
      val hit = (col("y_pred") === col("y")).cast("double")
      val r = test.agg(
        avg(when(col("attack") === held, hit)).as("held"),
        avg(when(col("attack") =!= held, hit)).as("rest")).head()
      (held, seed,
        if (r.isNullAt(0)) Double.NaN else r.getDouble(0),
        if (r.isNullAt(1)) Double.NaN else r.getDouble(1))
    }
    rows.toDF("held_out_attack", "seed", "acc_held", "acc_rest")
      .groupBy("held_out_attack")
      .agg(
        avg("acc_held").as("accuracy_on_held_out"),
        coalesce(stddev_samp(col("acc_held")), lit(0.0)).as("accuracy_on_held_out_std"),
        avg("acc_rest").as("accuracy_on_rest"),
        coalesce(stddev_samp(col("acc_rest")), lit(0.0)).as("accuracy_on_rest_std"),
        count(lit(1)).as("n_repeats"))
  }
}
