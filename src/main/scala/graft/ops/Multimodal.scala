package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (engine extension — BASELINE.json north
  * star): image/audio/video as opaque `binary` columns + typed metadata,
  * with decode / feature-extraction as a batched per-partition transform.
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * environment — see [[FakeDecoder]]), but everything Spark-side is real:
  * the schema contract, the partition-parallel batch transform (the Scala
  * analogue of `mapInPandas`: one iterator per partition, vectorizable
  * batch shape), and the deterministic fake features used by tests.
  */
object Multimodal {

  /** Media row contract: binary payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  /** Deterministic stand-in for the real codec: features derived from the
    * raw bytes only (length, simple byte histogram moments, xxhash). A real
    * deployment swaps `decode` for an actual image/audio decode — the
    * signature (bytes in, fixed-length float vector out) is the contract. */
  object FakeDecoder {
    val featureDim = 8
    def decode(payload: Array[Byte]): Array[Float] = {
      if (payload == null || payload.isEmpty) return Array.fill(featureDim)(0f)
      val n = payload.length
      var sum = 0L; var sumSq = 0L; var mn = 255; var mx = 0
      payload.foreach { b =>
        val v = b & 0xff
        sum += v; sumSq += v.toLong * v; mn = math.min(mn, v); mx = math.max(mx, v)
      }
      val mean = sum.toDouble / n
      val variance = sumSq.toDouble / n - mean * mean
      Array(n.toFloat, mean.toFloat, math.sqrt(math.max(0, variance)).toFloat,
        mn.toFloat, mx.toFloat,
        (payload.head & 0xff).toFloat, (payload.last & 0xff).toFloat,
        (java.util.Arrays.hashCode(payload) % 1000).toFloat)
    }
  }

  /** Batched per-partition decode → feature column. Partition-parallel,
    * no shuffle; each partition streams its rows once (the `mapInPandas`
    * batch shape: iterator in, iterator out). */
  def extractFeatures(df: DataFrame, payloadCol: String, out: String = "features"): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField(out, ArrayType(FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val feats = FakeDecoder.decode(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Frame sampling contract for video-ish payloads: split the payload
    * into `nFrames` equal byte slices ("frames"), keep every `step`-th —
    * the Spark-side shape of frame-sample (explode → per-frame rows). */
  def sampleFrames(df: DataFrame, payloadCol: String, nFrames: Int, step: Int): DataFrame = {
    require(nFrames >= 1 && step >= 1)
    val frameIdx = sequence(lit(0), lit(nFrames - 1))
    df.withColumn("frame_idx", explode(filter(frameIdx, i => pmod(i, lit(step)) === 0)))
      .withColumn("frame",
        expr(s"substring($payloadCol, cast(frame_idx * (length($payloadCol) / $nFrames) + 1 as int), " +
          s"cast(greatest(length($payloadCol) / $nFrames, 1) as int))"))
  }

  /** Test/demo helper: deterministic synthetic media table derived from any
    * id column (payload = utf8 bytes of a hash chain). md5 + sha256 only —
    * both exist in DuckDB with identical hex output, so the oracle can
    * rebuild the exact payload and check feature CONTENT, not just counts. */
  def syntheticMedia(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame =
    ids.select(
      col(idCol).cast(LongType).as("media_id"),
      (when(pmod(col(idCol), lit(3)) === 0, "image")
        .when(pmod(col(idCol), lit(3)) === 1, "audio").otherwise("video")).as("kind"),
      encode(concat_ws("-", col(idCol).cast(StringType),
        md5(col(idCol).cast(StringType)),
        sha2(col(idCol).cast(StringType), 256)), "UTF-8").as("payload"),
      struct(lit(64).as("width"), lit(64).as("height"),
        lit(16000).as("sample_rate"), lit(16).as("n_frames")).as("meta"))
}
