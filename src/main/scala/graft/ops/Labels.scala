package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Label-preparation operators (SURVEY §2.2 P1–P9).
  *
  * Semantics derived from the reference's label layer:
  * `func_aux/func_preproc.py:97-151` (state_bin, binary label, attack→group,
  * LabelEncoder) and `pipelines_network/pipeline_trainingmodels_network.py:65-341`
  * (dictionary label maps, benign normalizer, filename label inference).
  *
  * All operators are pure Catalyst column expressions or broadcast lookup
  * joins — no UDFs — so they stay inside whole-stage codegen and scale
  * linearly with input partitions (no shuffle except the tiny dictionary
  * broadcast and the one `distinct` in [[fitLabelEncoder]]).
  */
object Labels {

  /** P1: state flag — 1 iff the (lower-cased, trimmed) state is "charging".
    * Ref: func_aux/func_preproc.py:134 and :583 (host lower-cases first). */
  def stateBin(state: Column): Column =
    when(lower(trim(state)) === "charging", 1).otherwise(0)

  /** Values of `Attack` that mean "no attack".
    * Ref: func_aux/func_preproc.py:104-112. */
  val BenignLike: Seq[String] = Seq("none", "benign", "none (ie. benign)")

  /** P2: binary label — "benign" iff lower(trim(attack)) is benign-like.
    * Ref: func_aux/func_preproc.py:104-112. */
  def binaryLabel(attack: Column, benignLike: Seq[String] = BenignLike): Column =
    when(lower(trim(attack)).isin(benignLike: _*), "benign").otherwise("attack")

  /** P3 mechanism with a caller-supplied mapping: normalize through a
    * literal map, pass unmapped values through (func_preproc.py:114-117). */
  def mapWithFallback(c: Column, mapping: Map[String, String]): Column =
    coalesce(element_at(typedLit(mapping), lower(trim(c))), c)

  /** P3: attack-name → attack-group normalization table.
    * Ref: map_attack_to_group, func_aux/func_preproc.py:48-94. */
  val AttackGroups: Map[String, String] = Map(
    "none" -> "none", "benign" -> "none", "none (ie. benign)" -> "none",
    "backdoor" -> "host-attack", "cryptojacking" -> "host-attack",
    "aggressive-scan" -> "recon", "vuln-scan" -> "recon",
    "tcp-port-scan" -> "recon", "udp-port-scan" -> "recon",
    "os-fingerprinting" -> "recon", "service-detection" -> "recon",
    "syn-flood" -> "DoS", "udp-flood" -> "DoS", "icmp-flood" -> "DoS",
    "icmp-fragmentation" -> "DoS", "synonymous-ip" -> "DoS",
    "slowloris" -> "DoS", "dos" -> "DoS",
  )

  /** P3 applied: map through [[AttackGroups]], pass unknown values through.
    * Ref: func_aux/func_preproc.py:114-117. */
  def attackGroup(attack: Column): Column = mapWithFallback(attack, AttackGroups)

  /** P5: any attack value containing "benign" (case-insensitive) → "None".
    * Ref: pipelines_network/pipeline_trainingmodels_network.py:319. */
  def benignNormalizer(attack: Column): Column =
    when(lower(attack).contains("benign"), "None").otherwise(attack)

  /** P6: filename → label phrase: join stem tokens from the 3rd on with " ";
    * when the stem has fewer than 3 dash-separated parts, the whole stem is
    * the label. Both branches trimmed (the reference's .strip()).
    * Ref: pipelines_network/pipeline_trainingmodels_network.py:158-164. */
  def filenameLabel(fileName: Column): Column = {
    val stem = regexp_extract(regexp_extract(fileName, "([^/]+)$", 1), "^(.*?)(\\.[^.]*)?$", 1)
    val parts = split(stem, "-")
    trim(when(size(parts) >= 3, array_join(slice(parts, 3, 1 << 20), " "))
      .otherwise(stem))
  }

  /** P9: fit a lexicographic label encoder (sklearn `LabelEncoder` parity:
    * classes sorted lexicographically, ids 0..k-1).
    * Ref: func_aux/func_preproc.py:139-151.
    *
    * Returns a tiny (#classes rows) DataFrame `(class, y)` meant to be
    * broadcast-joined onto the data (J2). The distinct+sort shuffles only
    * #classes rows; at 100 TB the distinct is the only wide dependency and
    * is partial-aggregated map-side.
    */
  def fitLabelEncoder(df: DataFrame, target: String): DataFrame = {
    val w = Window.orderBy(col("class"))
    df.select(col(target).cast("string").as("class"))
      .na.drop().distinct()
      .withColumn("y", (row_number().over(w) - 1).cast("int"))
  }

  /** P9 transform: broadcast-join the encoder onto `df`, adding `yCol`. */
  def encodeLabel(df: DataFrame, encoder: DataFrame, target: String, yCol: String = "y"): DataFrame =
    df.join(
      broadcast(encoder.withColumnRenamed("class", "__enc_class").withColumnRenamed("y", yCol)),
      df(target).cast("string") === col("__enc_class"), "left")
      .drop("__enc_class")

  /** P8: pandas `.astype("category").cat.codes` parity for string columns —
    * codes are the index of the value among the *sorted* distinct values
    * (pandas category order for strings is lexicographic); null → "missing"
    * first (fillna), matching
    * pipelines_network/pipeline_trainingmodels_network.py:399-402. */
  def categoryCodes(df: DataFrame, column: String, out: String): DataFrame = {
    val filled = df.withColumn(column, coalesce(col(column).cast("string"), lit("missing")))
    val dict = fitLabelEncoder(filled, column)
      .withColumnRenamed("class", s"__cat_$column").withColumnRenamed("y", out)
    filled.join(broadcast(dict), col(column) === col(s"__cat_$column"), "left")
      .drop(s"__cat_$column")
  }

  /** P12: tag a split literal column (for re-concat plotting unions).
    * Ref: func_aux/func_preproc.py:369-377. */
  def tagSplit(df: DataFrame, split: String): DataFrame =
    df.withColumn("split", lit(split))
}
