package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ops.{Labels, Stats}
import graft.sources.Sources

/** Label layer (P1–P12), stats layer (P10/F6/F7/G17), sources (S1–S3, S8). */
class LabelsStatsSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("binaryLabel: benign-like spellings → benign") {
    val df = Seq("None", " BENIGN ", "none (ie. benign)", "syn-flood", null).toDF("a")
    val out = df.select(Labels.binaryLabel(col("a"))).collect().map(_.getString(0))
    assert(out.toSeq == Seq("benign", "benign", "benign", "attack", "attack"))
  }

  test("attackGroup: known names map, unknown pass through") {
    val df = Seq("SYN-Flood", "backdoor", "vuln-scan", "weird-new-attack").toDF("a")
    val out = df.select(Labels.attackGroup(col("a"))).collect().map(_.getString(0))
    assert(out.toSeq == Seq("DoS", "host-attack", "recon", "weird-new-attack"))
  }

  test("attackGroup: dataset typos, '0', _old variants, and null → reference groups") {
    val df = Seq("os-fingerpriting", "serice-detection", "upd-flood", "0",
      "icmp-fragmentation_old", "push-ack-flood", "dos", null).toDF("a")
    val out = df.select(Labels.attackGroup(col("a"))).collect().map(_.getString(0))
    // "dos" is NOT a reference spelling → passes through; null → "none"
    assert(out.toSeq == Seq("recon", "recon", "DoS", "none", "DoS", "DoS", "dos", "none"))
  }

  test("networkLabels: full chain — exact-match mapping, Benign fallback, null id") {
    val df = Seq("charging syn flood", "Charging Benign", "charging syn flood ", "idle portscan")
      .toDF("label_mul_raw")
    val out = Labels.networkLabels(df)
      .select("attack", "scenario_str", "label_mul_id", "scenario_id", "label")
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(out.toSeq == Seq(
      ("syn-flood", "DoS", 9, 2, 1),
      ("None", "Benign", 0, 0, 0),
      // trailing space: LABEL_MAPPING is exact-match → raw passes through
      ("charging syn flood ", "Benign", -1, 0, 1),
      ("TCP-port-scan", "Recon", 5, 1, 1)))
  }

  test("filenameLabel: stem tokens from the 3rd, joined; short stems fall back whole") {
    val df = Seq("/data/evseA/EVSE-A-icmp-flood-1.csv", "x/a-b-c.csv", "a-b.csv").toDF("f")
    val out = df.select(Labels.filenameLabel(col("f"))).collect().map(_.getString(0))
    // ref joins with " "; < 3 dash parts → whole stem (stripped)
    assert(out.toSeq == Seq("icmp flood 1", "c", "a-b"))
  }

  test("fitLabelEncoder is lexicographic; encodeLabel broadcasts it back") {
    val df = Seq("dog", "ant", "cat", "dog").toDF("cls")
    val enc = Labels.fitLabelEncoder(df, "cls")
    val mapping = enc.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(mapping == Map("ant" -> 0, "cat" -> 1, "dog" -> 2))
    val encoded = Labels.encodeLabel(df, enc, "cls").select("cls", "y").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(encoded == Set(("dog", 2), ("ant", 0), ("cat", 1)))
  }

  test("categoryCodes: sorted-distinct codes with null → missing") {
    val df = Seq(Some("b"), None, Some("a"), Some("b")).toDF("c")
    val out = Labels.categoryCodes(df, "c", "code").select("c", "code").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(out == Set(("a", 0), ("b", 1), ("missing", 2)))
  }

  test("standard scaler: population std, zero-variance guard, train-only fit") {
    val train = Seq((1.0, 5.0), (3.0, 5.0)).toDF("x", "c")
    val scaler = Stats.fitStandardScaler(train, Seq("x", "c"))
    assert(approx(scaler("x")._1, 2.0) && approx(scaler("x")._2, 1.0)) // pop std of {1,3}
    assert(scaler("c")._2 == 1.0) // zero-variance → scale 1
    val applied = Stats.applyStandardScaler(train, scaler).collect()
    assert(approx(applied(0).getDouble(0), -1.0) && approx(applied(1).getDouble(0), 1.0))
    assert(approx(applied(0).getDouble(1), 0.0))
  }

  test("constantColumns counts nulls as values (dropna=False parity)") {
    val df = Seq((1, Some("a"), None: Option[String]), (1, Some("a"), Some("x")))
      .toDF("const", "const2", "mixed")
    val out = Stats.constantColumns(df, Seq("const", "const2", "mixed"))
    assert(out == Seq("const", "const2"))
  }

  test("nearEmptyColumns flags > threshold null ratio") {
    val df = Seq((Some(1), None: Option[Int]), (None, None), (None, None), (None, None))
      .toDF("a", "b")
    assert(Stats.nearEmptyColumns(df, Seq("a", "b"), 0.8) == Seq("b"))
    assert(Stats.nearEmptyColumns(df, Seq("a", "b"), 0.74) == Seq("a", "b"))
  }

  test("acf: lag0 = 1, perfect alternation has acf(1) ≈ -1") {
    val df = (1 to 40).map(i => (i.toLong, if (i % 2 == 0) 1.0 else -1.0)).toDF("t", "x")
    val out = Stats.acf(df, col("t"), col("x"), 2).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(approx(out(0), 1.0))
    assert(out(1) < -0.9)
    assert(out(2) > 0.9)
  }

  test("acf: NaNs are dropped and the series compacted before centering (ref parity)") {
    // Without compaction the NaN poisons every sum; with it, the alternating
    // pattern {-1,1,...} stays perfectly anti-correlated at lag 1 because the
    // surviving neighbors remain adjacent in the compacted order.
    val df = (1 to 41).map { i =>
      (i.toLong, if (i == 21) Double.NaN else if (i % 2 == 0) 1.0 else -1.0)
    }.toDF("t", "x")
    val out = Stats.acf(df, col("t"), col("x"), 1).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(approx(out(0), 1.0))
    assert(!out(1).isNaN && out(1) < -0.85)
  }

  test("S1/S2 power+host CSV loading: schema repair, constant drop, positional event cols") {
    val dir = Files.createTempDirectory("graft_src").toFile
    val power = new java.io.File(dir, "power.csv")
    Files.writeString(power.toPath,
      """time,current_mA,bus_voltage_V,power_mW,State,Attack
        |2024-01-01 00:00:02,1.5,5.0,7.5,charging,none
        |2024-01-01 00:00:01,1.0,5.0,5.0,idle,syn-flood
        |""".stripMargin)
    val p = Sources.loadPower(spark, power.getPath)
    val rows = p.select("state_bin", "Attack").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1)) // sorted by timestamp: idle first
    val host = new java.io.File(dir, "host.csv")
    Files.writeString(host.toPath,
      """time,ev1,ev2,ev3,State,Attack
        |1,10,5,bad,Charging,none
        |2,20,5,7,Idle,none
        |3,30,5,8,Charging,dos
        |""".stripMargin)
    val (h, eventCols) = Sources.loadHost(spark, host.getPath)
    assert(eventCols == Seq("ev1", "ev3")) // ev2 constant → dropped; time excluded
    assert(h.schema.fieldNames.contains("state_bin"))
    assert(h.select("timestamp").collect().map(_.getDouble(0)).toSeq == Seq(0.0, 1.0, 2.0))
    // numeric coercion: "bad" → null
    assert(h.where(col("ev3").isNull).count() == 1)
  }

  test("S10 readJsonl: valid lines parse, malformed lines quarantine with raw text, none dropped") {
    val dir = Files.createTempDirectory("graft_jsonl").toFile
    val f = new java.io.File(dir, "docs.jsonl")
    Files.writeString(f.toPath,
      """{"id": 1, "text": "hello world"}
        |{"id": oops
        |{"id": 3, "text": "third"}
        |not json at all
        |""".stripMargin)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", org.apache.spark.sql.types.LongType)
      .add("text", org.apache.spark.sql.types.StringType)
    val got = Sources.readJsonl(spark, f.getPath, schema)
    assert(got.count() == 4) // quarantine, never drop
    val good = got.where(!col("corrupt")).orderBy("id")
      .select("id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(good.toSeq == Seq((1L, "hello world"), (3L, "third")))
    val bad = got.where(col("corrupt")).select("_corrupt_record")
      .collect().map(_.getString(0)).toSet
    assert(bad == Set("{\"id\": oops", "not json at all")) // raw lines intact
    // declaring _corrupt_record in the caller schema is a contract error
    intercept[IllegalArgumentException] {
      Sources.readJsonl(spark, f.getPath,
        schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
    }
  }

  test("S3 network merge: filename labels, evse tag, union, dropna") {
    val dir = Files.createTempDirectory("graft_net").toFile
    val a = new java.io.File(dir, "a"); a.mkdirs()
    val b = new java.io.File(dir, "b"); b.mkdirs()
    Files.writeString(new java.io.File(a, "EVSE-A-syn-flood.csv").toPath,
      "f1,f2\n1,2\n3,\n")
    Files.writeString(new java.io.File(b, "EVSE-B-benign.csv").toPath,
      "f1,f2\n5,6\n")
    val merged = Sources.mergeNetworkCsvs(spark, a.getPath, b.getPath, dropCols = Seq())
    val rows = merged.select("f1", "label_mul_raw", "evse").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set((1, "syn flood", "A"), (5, "benign", "B"))) // dropna removed (3, null)
  }

  test("S8 flattenStructs: nested → underscored; 2-elem numeric arrays → low/high") {
    val df = spark.sql(
      """SELECT named_struct('acc', CAST(0.9 AS DOUBLE),
        |         'ci', array(CAST(0.8 AS DOUBLE), CAST(0.95 AS DOUBLE))) AS metrics,
        |       'run1' AS run""".stripMargin)
    val flat = Sources.flattenStructs(df)
    assert(flat.schema.fieldNames.toSet == Set("metrics_acc", "metrics_ci_low", "metrics_ci_high", "run"))
    val r = flat.head()
    assert(r.getAs[Double]("metrics_ci_low") == 0.8 && r.getAs[Double]("metrics_ci_high") == 0.95)
  }

  test("sanitizeDoubles: NaN and ±Inf → null") {
    val df = Seq(1.0, Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity).toDF("x")
    val out = Sources.sanitizeDoubles(df).collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(Some(1.0), None, None, None))
  }

  test("G18 calculators: exact >= approx-ish, erf bridge, fph hours") {
    import graft.ops.Calculators
    // at fpr 1e-3, alpha .05: exact 2995, approx 2996
    assert(Calculators.minSamplesZeroFpExact(1e-3) == 2995L)
    assert(Calculators.minSamplesZeroFpApprox(1e-3) == 2996L)
    assert(approx(Calculators.sigmaToAlpha(1.959963985), 0.05, 1e-6))
    val h = Calculators.minBenignHoursZeroFp(fphTarget = 1.0, hopSeconds = 1.0)
    assert(h > 2.9 && h < 3.1) // ~ln(1/.05) hours = 3.0
    // window form: hours · 3600 / hop — the reference's
    // required_negatives_for_sigma_fph with sigma→alpha applied
    val w = Calculators.minBenignWindowsZeroFp(fphTarget = 1.0, hopSeconds = 60.0)
    assert(approx(w, math.log(1.0 / 0.05) * 3600.0 / 60.0, 1e-9))
  }
}
