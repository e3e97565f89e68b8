package graft

import org.apache.spark.sql.functions._
import graft.model.Scorers
import graft.pipelines.{HostImportance, Pipeline1, Pipeline2, Pipeline3}

/** End-to-end pipeline1/2/3 on deterministic power-shaped synthetic data
  * (SURVEY §5.2 golden-run discipline): a separable signal so the scorer
  * must actually learn, plus full determinism across reruns. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  /** 1200 rows: two attacks × two states, attack rows have shifted
    * feature means (separable), deterministic interleaving. */
  private lazy val power = {
    val rows = (0 until 1200).map { i =>
      val attack = if ((i / 100) % 3 == 0) "syn-flood" else "none"
      val state = if (i % 2 == 0) "charging" else "idle"
      val base = if (attack == "none") 1.0 else 4.0
      (i.toLong, base + math.sin(i * 0.1) * 0.3 + (i % 7) * 0.01,
        base * 2 + math.cos(i * 0.05) * 0.2, attack, state)
    }
    rows.toDF("t", "current_ma", "power_mw", "Attack", "State")
  }

  private lazy val result = Pipeline1.run(
    spark, power, Seq("current_ma", "power_mw"), "Attack", "State",
    Seq(col("t")), Scorers.Logistic(maxIter = 30),
    Pipeline1.Config(task = "binary", seqLen = 10, step = 5, fprTarget = 0.05,
      chunkSize = 256))

  test("pipeline1: windows carry split/label/state; counts follow the window law per split") {
    val counts = result.windows.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    // per split: n_windows = 1 + (n_rows_split - seqLen) / step, with the
    // split row counts from the same chronological split the pipeline ran
    val splitRows = graft.ops.ChronoSplit
      .withSplit(power, Seq("Attack", "State"), Seq(col("t")))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (s <- Seq("train", "val", "test"))
      assert(counts(s) == 1 + (splitRows(s) - 10) / 5, s"split $s")
    assert(result.windows.where(col("y").isNull).count() == 0)
  }

  test("pipeline1: binary task learns the separable signal (accuracy > 0.9 on test)") {
    val acc = result.multiclass.head().getAs[Double]("accuracy")
    assert(acc > 0.9, s"accuracy $acc")
  }

  test("pipeline1: operational doc present for binary; threshold calibrated on val") {
    val op = result.operational.get
    assert(op.tp + op.fn + op.tn + op.fp ==
      result.scored.where(col("split") === "test").count())
    assert(op.threshold >= 0.0 && op.threshold <= 1.0)
    assert(op.fprCiCpHigh >= op.fprCiCpLow)
  }

  test("pipeline1: per-state slices cover charging and idle") {
    val slices = result.perState.select("grp").collect().map(_.getString(0)).toSet
    assert(slices == Set("charging", "idle"))
  }

  test("pipeline1 is deterministic across reruns") {
    val again = Pipeline1.run(
      spark, power, Seq("current_ma", "power_mw"), "Attack", "State",
      Seq(col("t")), Scorers.Logistic(maxIter = 30),
      Pipeline1.Config(task = "binary", seqLen = 10, step = 5, fprTarget = 0.05,
        chunkSize = 256))
    val a = result.multiclass.head().toSeq
    val b = again.multiclass.head().toSeq
    assert(a == b)
  }

  test("pipeline1 with the salted G1 split: identical metrics to the window form") {
    // saltedSplitBuckets swaps the split's physical plan only — the
    // monster-group configuration must not move a single metric
    val salted = Pipeline1.run(
      spark, power, Seq("current_ma", "power_mw"), "Attack", "State",
      Seq(col("t")), Scorers.Logistic(maxIter = 30),
      Pipeline1.Config(task = "binary", seqLen = 10, step = 5, fprTarget = 0.05,
        chunkSize = 256, saltedSplitBuckets = 8))
    assert(salted.multiclass.head().toSeq == result.multiclass.head().toSeq)
    assert(salted.confusion.collect().map(_.toSeq).toSeq ==
      result.confusion.collect().map(_.toSeq).toSeq)
  }

  test("pipeline1 timing: training time and per-window inference latency recorded") {
    val t = result.timing
    assert(t.trainingTimeSeconds >= 0.0 &&
      java.lang.Double.isFinite(t.trainingTimeSeconds))
    assert(t.avgInferenceLatencyPerWindowSec >= 0.0 &&
      java.lang.Double.isFinite(t.avgInferenceLatencyPerWindowSec))
    assert(t.nTestWindows ==
      result.windows.where(col("split") === "test").count())
  }

  test("pipeline1 grid: a poisoned cell fails in isolation; the rest complete and persist artifacts") {
    import graft.model.{WindowModel, WindowScorer}
    // Poisoned config: blows up only when fit sees seqLen-10 windows, so
    // exactly one cell of the 3x2 grid fails (mirrors the reference's
    // try/except-per-cell runner, run_pipeline_train_network.py:55-71).
    final case class PoisonAt(failLen: Int) extends WindowScorer {
      def fit(train: org.apache.spark.sql.DataFrame, wc: String, yc: String): WindowModel = {
        if (train.select(size(col(wc))).head().getInt(0) == failLen)
          throw new IllegalStateException(s"poisoned config seqLen=$failLen")
        Scorers.Logistic(maxIter = 10).fit(train, wc, yc)
      }
    }
    val root = java.nio.file.Files.createTempDirectory("graft_grid").toString
    val cells = Pipeline1.runGrid(spark, power, Seq("current_ma", "power_mw"),
      "Attack", "State", Seq(col("t")),
      tasks = Seq("binary"),
      scorers = Seq("logit" -> Scorers.Logistic(maxIter = 10), "poison" -> PoisonAt(10)),
      seqLens = Seq(8, 10, 12), stepsFor = _ => Seq(5),
      outputRoot = Some(root),
      base = Pipeline1.Config(fprTarget = 0.05, chunkSize = 256))
    assert(cells.length == 6)
    val (ok, bad) = cells.partition(_.outcome.isSuccess)
    assert(bad.map(_.name) == Seq("binary_poison_seq10_step5"))
    ok.foreach { c =>
      val dir = java.nio.file.Paths.get(root, c.name)
      assert(java.nio.file.Files.exists(dir.resolve("metrics.json")), c.name)
      assert(java.nio.file.Files.exists(dir.resolve("config.json")), c.name)
      assert(java.nio.file.Files.exists(dir.resolve("encoder")), c.name)
      assert(java.nio.file.Files.exists(dir.resolve("scaler")), c.name)
      assert(java.nio.file.Files.exists(dir.resolve("model")), c.name)
    }
    // S7 roundtrip out of a grid cell: artifacts reload and re-score
    locally {
      import graft.model.ModelIO
      val cell = java.nio.file.Paths.get(root, ok.head.name)
      val enc = ModelIO.loadEncoder(spark, cell.resolve("encoder").toString)
      assert(enc.count() == 2) // binary task: attack / benign
      val sc = ModelIO.loadScaler(cell.resolve("scaler").toString)
      assert(sc.keySet == Set("current_ma", "power_mw"))
      val m = ModelIO.loadModel(spark, cell.resolve("model").toString)
      val rescored = m.transform(
        ok.head.outcome.get.windows.where(col("split") === "test"))
      assert(rescored.where(col("y_pred").isNull).count() == 0)
    }
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "binary_poison_seq10_step5", "metrics.json")))
    // The grid's run tree is its own S8/J3 surface: harvest + flatten +
    // metrics-config join over run_dir, timing fields finite/non-negative.
    import graft.sources.Sources
    val h = Sources.flattenStructs(Sources.harvestJson(spark, root))
    val m = h.where(col("metrics_training_time_seconds").isNotNull)
      .select(col("run_dir"), col("metrics_training_time_seconds"),
        col("metrics_avg_inference_latency_per_window_sec"))
    val cfg = h.where(col("config_model").isNotNull)
      .select(col("run_dir"), col("config_model"), col("config_seq_len"))
    val joined = m.join(cfg, "run_dir").collect()
    assert(joined.length == 5)
    joined.foreach { r =>
      val t = r.getAs[Double]("metrics_training_time_seconds")
      val l = r.getAs[Double]("metrics_avg_inference_latency_per_window_sec")
      assert(t >= 0.0 && java.lang.Double.isFinite(t))
      assert(l >= 0.0 && java.lang.Double.isFinite(l))
    }
  }

  test("pipeline2: surrogate tree imitates the base model above chance") {
    val p2 = Pipeline2.run(result.scored, nFeatures = 2)
    val agreement = p2.agreement.head().getAs[Double]("agreement")
    assert(agreement > 0.8, s"agreement $agreement")
    assert(p2.rules.contains("DecisionTreeClassificationModel"))
  }

  test("pipeline3A: severity 0 matches clean accuracy; high severity degrades or holds") {
    val curves = Pipeline3.robustness(result.scored, result.model,
      kinds = Seq("packet_loss"), maxSev = 0.6, nSev = 3, nRepeats = 2)
    val rows = curves.collect().map(r =>
      (r.getDouble(1), r.getAs[Double]("accuracy_mean"))).sortBy(_._1)
    val clean = result.multiclass.head().getAs[Double]("accuracy")
    assert(approx(rows.head._2, clean, 1e-9)) // severity 0 = identity
    assert(rows.last._2 <= rows.head._2 + 1e-9)
  }

  test("pipeline3A single-plan sweep equals the driver-loop sweep exactly") {
    val loop = Pipeline3.robustness(result.scored, result.model,
      kinds = Seq("packet_loss", "missing_variables"), maxSev = 0.4, nSev = 3, nRepeats = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getAs[Double]("accuracy_mean"), r.getAs[Double]("accuracy_std"))).toMap
    val plan = Pipeline3.robustnessSweepPlan(result.scored, result.model,
      kinds = Seq("packet_loss", "missing_variables"), maxSev = 0.4, nSev = 3, nRepeats = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getAs[Double]("accuracy_mean"), r.getAs[Double]("accuracy_std"))).toMap
    assert(loop.keySet == plan.keySet)
    loop.foreach { case (k, (m, s)) =>
      assert(approx(plan(k)._1, m, 1e-12) && approx(plan(k)._2, s, 1e-12), s"$k")
    }
  }

  test("pipeline3B: leave-one-attack-out returns a row per held-out attack") {
    val out = Pipeline3.leaveOneAttackOut(result.windows, Scorers.Logistic(maxIter = 20),
      Seq("syn-flood"))
    val r = out.head()
    assert(r.getString(0) == "syn-flood")
    assert(!r.getAs[Double]("accuracy_on_rest").isNaN)
    assert(r.getAs[Long]("n_repeats") == 1L)
    assert(r.getAs[Double]("accuracy_on_rest_std") == 0.0)
  }

  test("pipeline3B seeded repeats: deterministic scorer -> std 0; stochastic -> mean±std") {
    // stochastic stand-in: predictions flip with a seed-keyed Bernoulli,
    // so each seed yields a different accuracy — the repeat loop must
    // surface that as a nonzero ddof=1 std over n_repeats runs.
    import graft.model.{WindowModel, WindowScorer}
    final case class Noisy(seed: Long = 0L) extends WindowScorer {
      override def seeded(s: Long): WindowScorer = copy(seed = s)
      def fit(train: org.apache.spark.sql.DataFrame, wc: String, yc: String): WindowModel =
        new WindowModel {
          def transform(df: org.apache.spark.sql.DataFrame, wc2: String): org.apache.spark.sql.DataFrame =
            df.withColumn("y_pred",
              when(graft.ops.Robustness.seededUniform(seed, col("win_id")) < 0.3,
                lit(1) - col("y")).otherwise(col("y")).cast("int"))
        }
    }
    val det = Pipeline3.leaveOneAttackOut(result.windows,
      Scorers.Logistic(maxIter = 20), Seq("syn-flood"), seeds = Seq(1L, 2L, 3L)).head()
    assert(det.getAs[Long]("n_repeats") == 3L)
    assert(det.getAs[Double]("accuracy_on_rest_std") == 0.0)
    val sto = Pipeline3.leaveOneAttackOut(result.windows,
      Noisy(), Seq("syn-flood"), seeds = Seq(1L, 2L, 3L)).head()
    assert(sto.getAs[Long]("n_repeats") == 3L)
    assert(sto.getAs[Double]("accuracy_on_rest_std") > 0.0)
    assert(sto.getAs[Double]("accuracy_on_rest") > 0.5) // 30% flips, mean still informative
  }

  test("corpus curation pipeline: exact dups, near-dup clusters, contamination, junk, packing") {
    import graft.pipelines.CorpusPipeline
    val prose = "the quick brown fox jumps over the lazy dog near a quiet river bank today"
    val docs = Seq(
      (1L, prose, "en"),
      (2L, prose, "en"), // exact dup of 1 → dropped at stage 1
      (3L, prose + " extra", "en"), // near-dup of 1 → same cluster, lower quality loses
      (4L, "totally unrelated words about cooking pasta with garlic and fresh basil leaves", "en"),
      (5L, "spam spam spam spam spam spam spam spam spam spam", "en"), // repetition junk
      (6L, "the secret benchmark sentence that must never leak into training data at all", "en"))
      .toDF("doc_id", "text", "lang")
    val bench = Seq("we found the secret benchmark sentence that must never leak into training data at all ok")
      .toDF("btext")
    val cfg = CorpusPipeline.CurationConfig(
      shingleWords = 3, jaccardThreshold = 0.5, decontamN = 8,
      minQuality = 0.1, maxTopWordRatio = 0.5,
      defaultSampleRate = 1.0, packBudgetTokens = 16)
    val r = CorpusPipeline.curateCounted(docs, "doc_id", "text", col("lang"), bench, "btext", cfg)
    val funnel = r.funnel.toMap
    assert(funnel("input") == 6)
    assert(funnel("exact_dedup") == 5) // doc 2 gone
    assert(funnel("near_dedup") == 4) // 1/3 collapse (longer doc 3 has higher len-based quality or 1 wins — either way ONE survives)
    assert(funnel("decontaminated") == 3) // doc 6 gone (8-gram overlap with bench)
    assert(funnel("filtered") == 2) // doc 5 gone (top_word_ratio 1.0)
    assert(funnel("sampled") == 2 && funnel("packed") == 2)
    val packed = r.packed.select("doc_id", "n_tokens", "bin", "offset").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))).sortBy(_._1)
    // budget 16: first kept doc starts at (0,0); 14-token prose doc → next starts at offset 14
    assert(packed.head._3 == 0L && packed.head._4 == 0L)
    // deterministic end to end
    val r2 = CorpusPipeline.curateCounted(docs, "doc_id", "text", col("lang"), bench, "btext", cfg)
    assert(r2.funnel == r.funnel)
  }

  test("corpus curation with containment stage: excerpt collapses into its container") {
    import graft.pipelines.CorpusPipeline
    val long = (1 to 30).map(i => s"w$i").mkString(" ")
    val excerpt = (1 to 8).map(i => s"w$i").mkString(" ") // prefix: C=1, Jaccard ~0.24
    val other = (100 to 130).map(i => s"v$i").mkString(" ")
    val docs = Seq((1L, long, "en"), (2L, excerpt, "en"), (3L, other, "en"))
      .toDF("doc_id", "text", "lang")
    val bench = Seq.empty[String].toDF("btext")
    val base = CorpusPipeline.CurationConfig(
      shingleWords = 2, jaccardThreshold = 0.5, minQuality = 0.0,
      maxTopWordRatio = 1.0, defaultSampleRate = 1.0)
    // without the stage the excerpt SURVIVES (Jaccard too low to cluster)
    val without = CorpusPipeline.curateCounted(docs, "doc_id", "text",
      col("lang"), bench, "btext", base).funnel.toMap
    assert(without("near_dedup") == 3 && !without.contains("containment_dedup"))
    // with it the excerpt collapses into doc 1
    val cfg = base.copy(containmentThreshold = Some(0.9),
      containmentShingleWords = 2)
    val r = CorpusPipeline.curateCounted(docs, "doc_id", "text",
      col("lang"), bench, "btext", cfg)
    val funnel = r.funnel.toMap
    assert(funnel("near_dedup") == 3 && funnel("containment_dedup") == 2, funnel)
    assert(r.packed.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("corpus curation with span removal: boilerplate tile deleted, packing sees shorter docs") {
    import graft.pipelines.CorpusPipeline
    val boiler = "subscribe to our newsletter for more updates today" // 8 tokens
    val docs = Seq(
      (1L, s"$boiler unique alpha content about rivers and mountains here", "en"),
      (2L, s"$boiler other beta writing about cooking and gardens there", "en"),
      (3L, "standalone gamma text with no shared spans at all present", "en"))
      .toDF("doc_id", "text", "lang")
    val cfg = CorpusPipeline.CurationConfig(
      shingleWords = 3, jaccardThreshold = 0.95, decontamN = 8,
      minQuality = 0.0, maxTopWordRatio = 1.0, defaultSampleRate = 1.0,
      packBudgetTokens = 64, spanRemovalTileWords = Some(8))
    val r = CorpusPipeline.curateCounted(docs, "doc_id", "text", col("lang"),
      Seq.empty[String].toDF("btext"), "btext", cfg)
    assert(r.funnel.map(_._1).contains("span_removed"))
    assert(r.funnel.toMap.apply("packed") == 3) // all docs survive
    val toks = r.packed.select("doc_id", "n_tokens").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // docs 1 and 2 lost the 8-token boilerplate tile; doc 3 untouched
    assert(toks(1L) == 8L && toks(2L) == 8L && toks(3L) == 10L)
  }

  test("host importance: permuting the informative feature raises loss most") {
    // weight = 1 everywhere; feature 0 and 1 both carry signal, a constant
    // third feature carries none.
    val wins = result.windows
      .withColumn("window", transform(col("window"), r => concat(r, array(lit(1.0)))))
      .withColumn("weight", lit(1.0))
      .withColumn("win_id",
        row_number().over(org.apache.spark.sql.expressions.Window.orderBy("split", "win_id"))
          .cast("long"))
    val model = Scorers.Logistic(maxIter = 30).fit(wins.where(col("split") === "train"))
    val imp = HostImportance.permutationImportance(
      wins.where(col("split") === "test"), model, nFeatures = 3, nRepeats = 2)
    val byFeature = imp.collect().map(r => r.getInt(0) -> r.getAs[Double]("mean_drop")).toMap
    // constant feature: permutation is a no-op → drop ≈ 0
    assert(math.abs(byFeature(2)) < 1e-9)
    assert(byFeature(0) > byFeature(2) || byFeature(1) > byFeature(2))
    assert(HostImportance.topK(imp, 2).toSet.subsetOf(Set(0, 1, 2)))
  }
}
