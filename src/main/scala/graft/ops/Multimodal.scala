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

  /** Deterministic stand-in for a real image resize: nearest-neighbor
    * BYTE subsampling to `outLen` bytes (out[i] = in[⌊i·len/outLen⌋]) —
    * the contract (bytes in, target-geometry bytes out) is what a real
    * codec-backed resizer slots into. */
  object FakeResizer {
    def resize(payload: Array[Byte], outLen: Int): Array[Byte] = {
      if (payload == null || payload.isEmpty || outLen <= 0)
        return Array.emptyByteArray
      Array.tabulate(outLen)(i =>
        payload((i.toLong * payload.length / outLen).toInt))
    }
  }

  /** Batched per-partition resize → `resized` binary column + meta
    * width/height rewritten to the target geometry. Partition-parallel,
    * no shuffle — the same `mapInPandas` batch shape as
    * [[extractFeatures]]; swap [[FakeResizer]] for a real codec in
    * deployment. Requires the [[mediaSchema]] meta struct. */
  def resizeMedia(df: DataFrame, payloadCol: String, targetW: Int,
      targetH: Int, out: String = "resized"): DataFrame = {
    require(targetW >= 1 && targetH >= 1, "target geometry must be >= 1")
    val outLen = targetW * targetH
    val outSchema = StructType(df.schema.fields :+
      StructField(out, BinaryType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        Row.fromSeq(r.toSeq :+
          FakeResizer.resize(r.getAs[Array[Byte]](idx), outLen))
      }
    }(enc)
      .withColumn("meta", struct(
        lit(targetW).as("width"), lit(targetH).as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.n_frames").as("n_frames")))
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

  /** Perceptual hash over the raw payload bytes — the aHash recipe
    * (average hash: pool the signal into `nBits` blocks, set bit g when
    * block g's mean exceeds the global mean) applied to the byte stream
    * the [[FakeDecoder]] contract exposes. A real deployment pools the
    * DECODED luma grid instead of raw bytes; the pooling → threshold →
    * bit-pack shape (and everything downstream — banding, hamming
    * verify) is identical, so this is the honest Spark-side plumbing
    * with only the codec stubbed, like [[extractFeatures]].
    *
    * Runs in the same partition-parallel batched transform as
    * [[extractFeatures]] (no shuffle; one O(len) pass per payload). The
    * bit test is exact integer cross-multiplication
    * (`blockSum * n > totalSum * blockLen`), so an oracle can reproduce
    * the signature without float-comparison hazards. Block g covers byte
    * positions [g·n/nBits, (g+1)·n/nBits) (0-based, floor arithmetic —
    * every byte lands in exactly one block; blocks differ in size by at
    * most one byte). Payloads with fewer bytes than `nBits` leave the
    * high blocks empty (empty block → bit 0); null/empty payloads hash
    * to 0. */
  def perceptualHash(df: DataFrame, payloadCol: String,
      out: String = "phash", nBits: Int = 32): DataFrame = {
    require(nBits >= 1 && nBits <= 63, "nBits in [1, 63]")
    val outSchema = StructType(df.schema.fields :+
      StructField(out, LongType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]](idx)
        val sig: Long =
          if (p == null || p.isEmpty) 0L
          else {
            val n = p.length
            val blockSum = new Array[Long](nBits)
            var total = 0L
            var i = 0
            while (i < n) {
              val v = (p(i) & 0xff).toLong
              // block of position i: floor(i * nBits / n)
              blockSum((i.toLong * nBits / n).toInt) += v
              total += v
              i += 1
            }
            var s = 0L
            var g = 0
            while (g < nBits) {
              // block length: #{i : floor(i*nBits/n) = g}
              val lo = (g.toLong * n + nBits - 1) / nBits // ceil(g*n/nBits)
              val hi = ((g + 1).toLong * n + nBits - 1) / nBits
              val len = hi - lo
              // exact mean comparison: blockSum/len > total/n
              if (len > 0 && blockSum(g) * n > total * len) s |= (1L << g)
              g += 1
            }
            s
          }
        Row.fromSeq(r.toSeq :+ sig)
      }
    }(enc)
  }

  /** Near-duplicate media pairs by perceptual-hash hamming distance —
    * the multimodal twin of SimHash text dedup. Band the `nBits`
    * signature into `maxDist + 1` contiguous bands: any pair within
    * hamming distance `maxDist` has at least one band with ZERO
    * differing bits (pigeonhole), so the (band, band-bits) bucket
    * equi-join is LOSSLESS — exactly the PassJoin-style guarantee, no
    * recall knob. Quadratic work only within buckets (payloads sharing a
    * band pattern); the hamming verify on candidates is one xor +
    * bit_count. Returns (id_a, id_b, hamming), id_a < id_b, each pair
    * once (distinct across bands). */
  def phashNearDuplicates(media: DataFrame, idCol: String,
      payloadCol: String, maxDist: Int, nBits: Int = 32): DataFrame = {
    require(maxDist >= 0 && maxDist < nBits, "need 0 <= maxDist < nBits")
    val nBands = maxDist + 1
    val base = math.max(1, nBits / nBands) // band widths differ by <= 1
    val hashed = perceptualHash(
      media.select(col(idCol), col(payloadCol)), payloadCol, "__ph", nBits)
      // both banding legs read the (id, 64-bit hash) table: hash the
      // payloads once — this is the op's whole point at scale (r12)
      .localCheckpoint(false)
    val bands = (0 until nBands).map { bIdx =>
      val lo = bIdx * base
      val hi = if (bIdx == nBands - 1) nBits else (bIdx + 1) * base
      struct(lit(bIdx).as("band"),
        shiftright(col("__ph"), lo).bitwiseAND(lit((1L << (hi - lo)) - 1))
          .as("bits"))
    }
    val buckets = hashed
      .select(col(idCol), col("__ph"), explode(array(bands: _*)).as("bb"))
      .select(col(idCol), col("__ph"), col("bb.band"), col("bb.bits"))
    val a = buckets.toDF("id_a", "ph_a", "band", "bits")
    val b = buckets.toDF("id_b", "ph_b", "band", "bits")
    a.join(b, Seq("band", "bits"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Dedup.hamming64(col("ph_a"), col("ph_b")).cast(LongType).as("hamming"))
      .where(col("hamming") <= maxDist)
      .distinct()
  }
}
