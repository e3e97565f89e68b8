package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-training data preparation — the SFT/RLHF layer on top of the
  * pre-training curation surface: multi-turn dialogues flattened to
  * training text, the assistant-only loss-mask spans that SFT trainers
  * consume, and chosen/rejected preference pairs for DPO/RLHF reward
  * modeling (the data-construction counterpart of
  * [[Eval.bradleyTerry]], which FITS ratings from pairs).
  *
  * All three are one key-partitioned shuffle each (the conversation /
  * prompt id); turn content rides with the row.
  *
  * Rendering contract (shared by [[flattenDialogues]] and [[lossSpans]]):
  * a turn renders as `<|role|>` + one space + `trim(content)`, turns
  * join with a single space. Because the marker is itself a whitespace-
  * delimited token and content is trimmed, the whitespace tokens of the
  * flattened text are EXACTLY the concatenation of the per-turn tokens
  * — which is what makes the span table's offsets line up with the
  * flattened text without re-tokenizing (spec-pinned).
  */
object Sft {

  private def renderTurn(role: Column, content: Column): Column =
    concat(lit("<|"), role, lit("|>"),
      when(length(trim(content)) > 0, concat(lit(" "), trim(content)))
        .otherwise(lit("")))

  private def turnTokens(content: Column): Column =
    (lit(1L) + when(length(trim(content)) > 0,
      TextOps.tokenCount(content).cast("long")).otherwise(lit(0L)))

  /** Flatten (convId, turnIdx, role, content) rows to one training text
    * per conversation: turns in `turnIdx` order, rendered per the
    * contract above. Returns (convId, text, n_turns, n_tokens); token
    * count is exact under the rendering contract (marker + content
    * tokens), no re-tokenization of the joined string. ONE groupBy on
    * the conversation key (sort_array of (idx, rendered) structs orders
    * turns inside the aggregation — no window needed). */
  def flattenDialogues(df: DataFrame, convId: String, turnIdx: String,
      role: String, content: String): DataFrame = {
    df.groupBy(col(convId))
      .agg(
        array_join(transform(
          sort_array(collect_list(struct(col(turnIdx).as("i"),
            renderTurn(col(role), col(content)).as("r")))),
          x => x.getField("r")), " ").as("text"),
        count(lit(1)).as("n_turns"),
        sum(turnTokens(col(content))).cast("long").as("n_tokens"))
  }

  /** Loss-mask span table for the flattened dialogues: one row per turn
    * with its HALF-OPEN whitespace-token span [token_start, token_end)
    * inside [[flattenDialogues]]'s text, and `mask = (role ∈
    * maskRoles)` — the assistant-only-loss convention SFT trainers
    * apply. Offsets come from one running sum over (convId, turnIdx) —
    * a single window on the same key shuffle the flattener uses.
    * Ordering matches [[flattenDialogues]]'s sort_array EXACTLY —
    * (turnIdx, rendered turn) — so duplicate turn indexes inside one
    * conversation can't order the spans differently from the flattened
    * text they index into. */
  def lossSpans(df: DataFrame, convId: String, turnIdx: String,
      role: String, content: String,
      maskRoles: Seq[String] = Seq("assistant")): DataFrame = {
    require(maskRoles.nonEmpty, "lossSpans: maskRoles must be non-empty")
    // ROWS frame, not the default RANGE: two fully identical turns are
    // RANGE peers and would BOTH get the second copy's token_end —
    // overlapping spans with an uncovered gap, and a divergence from
    // the twin's ROWS UNBOUNDED PRECEDING running sum
    val w = Window.partitionBy(col(convId))
      .orderBy(col(turnIdx), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(convId), col(turnIdx), col(role),
        renderTurn(col(role), col(content)).as("__r"),
        turnTokens(col(content)).as("__nt"))
      .withColumn("token_end", sum(col("__nt")).over(w))
      .select(col(convId), col(turnIdx), col(role),
        (col("token_end") - col("__nt")).as("token_start"),
        col("token_end"),
        col(role).isin(maskRoles: _*).as("mask"))
  }

  /** Preference-pair construction for DPO/reward modeling: per prompt,
    * chosen = the max-score response, rejected = the min-score response
    * (score ties break to the LOWER response id on both sides —
    * deterministic), emitted only when the margin `chosen − rejected`
    * is ≥ `minMargin` and the two differ (single-response prompts and
    * all-tied prompts yield nothing: a pair needs a preference). Scores
    * should be engine-portable (pre-rounded) for replayable margins.
    * ONE window pair over the prompt key. */
  def preferencePairs(df: DataFrame, promptId: String, respId: String,
      score: Column, minMargin: Double = 0.0): DataFrame = {
    require(minMargin >= 0.0, "preferencePairs: minMargin must be >= 0")
    val s = score.cast("double")
    // ONE map-side-combined aggregation (no window, no per-prompt sort):
    // struct-min argmax/argmin with the deterministic id tie-break
    df.groupBy(col(promptId))
      .agg(
        min(struct((-s).as("ns"), col(respId).as("id"), s.as("s")))
          .as("__c"),
        min(struct(s.as("s"), col(respId).as("id"))).as("__r"))
      .select(col(promptId),
        col("__c.id").as("chosen_id"),
        col("__r.id").as("rejected_id"),
        round(col("__c.s") - col("__r.s"), 9).as("margin"))
      .where(col("chosen_id") =!= col("rejected_id")
        && col("margin") >= minMargin && col("margin") > 0.0)
  }
}
