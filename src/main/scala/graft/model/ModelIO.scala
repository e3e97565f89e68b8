package graft.model

import java.nio.file.{Files, Paths}
import org.apache.spark.ml.classification.{GBTClassificationModel, LogisticRegressionModel}
import org.apache.spark.ml.util.MLWritable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S7 — model / encoder / scaler artifact sink+source (the reference's
  * joblib.dump/load + model.save/load_model,
  * pipeline_trainingmodels_power.py:314-321, pipeline_tests_power.py:199-240).
  *
  * Layout under `dir`:
  *   model/        MLlib native save (parquet + metadata)
  *   model_class   marker naming the MLlib class for load dispatch
  *   encoder/      the (class, y) label-encoder table as parquet
  *   scaler.json   per-column (mean, std)
  */
object ModelIO {

  def saveModel(model: WindowModel, dir: String): Unit = model match {
    case h: HasMlModel =>
      h.mlModel match {
        case w: MLWritable =>
          w.write.overwrite().save(s"$dir/model")
          Files.createDirectories(Paths.get(dir))
          Files.writeString(Paths.get(s"$dir/model_class"), h.mlModel.getClass.getName)
        case other =>
          throw new IllegalArgumentException(s"model ${other.getClass} is not MLWritable")
      }
    case other =>
      throw new IllegalArgumentException(
        s"${other.getClass} does not expose its MLlib model (HasMlModel)")
  }

  def loadModel(spark: SparkSession, dir: String): WindowModel = {
    val clazz = Files.readString(Paths.get(s"$dir/model_class")).trim
    val ml = clazz match {
      case c if c.contains("LogisticRegressionModel") => LogisticRegressionModel.load(s"$dir/model")
      case c if c.contains("GBTClassificationModel") => GBTClassificationModel.load(s"$dir/model")
      case other => throw new IllegalArgumentException(s"unknown model class $other")
    }
    Scorers.wrapTransformer(ml)
  }

  def saveEncoder(encoder: DataFrame, dir: String): Unit =
    encoder.coalesce(1).write.mode("overwrite").parquet(s"$dir/encoder")

  def loadEncoder(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/encoder")

  /** Scaler as a flat JSON object {"col": [mean, std], …} — the analogue
    * of the reference's scaler.joblib, but engine-portable. */
  def saveScaler(scaler: Map[String, (Double, Double)], dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    val json = scaler.toSeq.sortBy(_._1).map { case (c, (m, s)) =>
      s""""${c.replace("\"", "\\\"")}": [$m, $s]"""
    }.mkString("{", ", ", "}")
    Files.writeString(Paths.get(s"$dir/scaler.json"), json)
  }

  def loadScaler(dir: String): Map[String, (Double, Double)] = {
    val json = Files.readString(Paths.get(s"$dir/scaler.json")).trim
    // flat {"name": [m, s], ...} parser (no JSON library needed for this
    // fixed shape; names were escaped on write)
    val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*\[\s*([^,\]]+)\s*,\s*([^\]]+)\s*\]""".r
    entry.findAllMatchIn(json).map { m =>
      m.group(1).replace("\\\"", "\"") -> (m.group(2).trim.toDouble, m.group(3).trim.toDouble)
    }.toMap
  }
}
