package graft

import org.apache.spark.sql.functions._
import graft.ops.{Sft, TextOps}

/** Post-training data prep: dialogue flattening, loss-mask spans, and
  * preference-pair construction. */
class SftSpec extends SparkSpec {
  import spark.implicits._

  private val turns = Seq(
    (1L, 0L, "user", "hello there"),
    (1L, 1L, "assistant", "hi  how can I help"), // double space collapses in tokens, not text
    (1L, 2L, "user", "   "),                     // blank content → marker only
    (1L, 3L, "assistant", "bye"),
    (2L, 0L, "user", "solo question")
  ).toDF("conv", "idx", "role", "content")

  test("flattenDialogues: rendering contract, order, token accounting") {
    val out = Sft.flattenDialogues(turns, "conv", "idx", "role", "content")
      .orderBy("conv").collect()
    val c1 = out(0)
    assert(c1.getAs[String]("text") ==
      "<|user|> hello there <|assistant|> hi  how can I help <|user|> <|assistant|> bye")
    assert(c1.getAs[Long]("n_turns") == 4L)
    // tokens: (1+2) + (1+5) + 1 + (1+1) = 12
    assert(c1.getAs[Long]("n_tokens") == 12L)
    assert(out(1).getAs[String]("text") == "<|user|> solo question")
  }

  test("flattenDialogues ∘ tokenCount == Σ lossSpans widths (the span contract)") {
    val flat = Sft.flattenDialogues(turns, "conv", "idx", "role", "content")
      .select(col("conv"), TextOps.tokenCount(col("text")).as("nt"),
        col("n_tokens"))
      .collect().map(r => r.getAs[Long]("conv") ->
        (r.getAs[Int]("nt").toLong, r.getAs[Long]("n_tokens"))).toMap
    // re-tokenizing the flattened text gives exactly the claimed count
    flat.values.foreach { case (retok, claimed) => assert(retok == claimed) }
    val spans = Sft.lossSpans(turns, "conv", "idx", "role", "content")
      .orderBy("conv", "idx").collect()
    // spans are contiguous half-open intervals starting at 0 per conv
    val byConv = spans.groupBy(_.getAs[Long]("conv"))
    byConv.foreach { case (conv, rows) =>
      assert(rows.head.getAs[Long]("token_start") == 0L)
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("token_end") == b.getAs[Long]("token_start"))
        case _ =>
      }
      assert(rows.last.getAs[Long]("token_end") == flat(conv)._1)
    }
    // mask only on assistant turns
    spans.foreach(r => assert(
      r.getAs[Boolean]("mask") == (r.getAs[String]("role") == "assistant")))
  }

  test("lossSpans with DUPLICATE turn indexes still aligns with the flattened text") {
    // two turns share idx 1: flattenDialogues sorts (idx, rendered), so
    // lossSpans must use the same tie-break or the offsets point at the
    // wrong tokens
    val dup = Seq(
      (1L, 0L, "user", "q one"),
      (1L, 1L, "assistant", "zz late answer"), // renders AFTER "aa early"
      (1L, 1L, "assistant", "aa early"),
      (1L, 2L, "user", "done")
    ).toDF("conv", "idx", "role", "content")
    val text = Sft.flattenDialogues(dup, "conv", "idx", "role", "content")
      .head().getAs[String]("text")
    val toks = text.trim.split("\\s+")
    val spans = Sft.lossSpans(dup, "conv", "idx", "role", "content")
      .orderBy("token_start").collect()
    // every span's first token must be its own <|role|> marker
    spans.foreach { r =>
      val start = r.getAs[Long]("token_start").toInt
      assert(toks(start) == s"<|${r.getAs[String]("role")}|>",
        s"span at $start starts with ${toks(start)}")
    }
    // the idx-1 pair orders by rendered text: "aa early" before "zz late"
    assert(toks.slice(3, 6).mkString(" ") == "<|assistant|> aa early")
    assert(spans.map(_.getAs[Long]("token_end")).last == toks.length.toLong)
  }

  test("lossSpans with fully IDENTICAL turns: contiguous non-overlapping spans (ROWS, not RANGE peers)") {
    // two byte-identical turns are RANGE frame peers — under the default
    // RANGE frame both would get the SECOND copy's token_end (overlap +
    // a gap); the ROWS frame must yield [0,3) and [3,6)-style tiling
    val dup = Seq(
      (1L, 1L, "assistant", "same words"),
      (1L, 1L, "assistant", "same words"),
      (1L, 2L, "user", "done")
    ).toDF("conv", "idx", "role", "content")
    val spans = Sft.lossSpans(dup, "conv", "idx", "role", "content")
      .orderBy("token_start").collect()
      .map(r => (r.getAs[Long]("token_start"), r.getAs[Long]("token_end")))
    assert(spans.toSeq == Seq((0L, 3L), (3L, 6L), (6L, 8L)), spans.toSeq)
  }

  test("preferencePairs: argmax/argmin with id tie-breaks, margin gate, degenerate prompts") {
    val scored = Seq(
      // p1: clear preference
      (1L, 10L, 0.9), (1L, 11L, 0.2), (1L, 12L, 0.5),
      // p2: max tie → chosen is the LOWER id; min distinct
      (2L, 20L, 0.8), (2L, 21L, 0.8), (2L, 22L, 0.1),
      // p3: all tied → no pair
      (3L, 30L, 0.5), (3L, 31L, 0.5),
      // p4: single response → no pair
      (4L, 40L, 0.7),
      // p5: margin below the gate
      (5L, 50L, 0.52), (5L, 51L, 0.50)
    ).toDF("p", "r", "s")
    val out = Sft.preferencePairs(scored, "p", "r", col("s"),
      minMargin = 0.05).orderBy("p").collect()
    assert(out.map(r => (r.getAs[Long]("p"), r.getAs[Long]("chosen_id"),
      r.getAs[Long]("rejected_id"))).toSeq ==
      Seq((1L, 10L, 11L), (2L, 20L, 22L)))
    assert(approx(out(0).getAs[Double]("margin"), 0.7, 1e-9))
    // margin 0 pairs never emitted even at minMargin = 0
    val zero = Sft.preferencePairs(scored.where(col("p") === 3L),
      "p", "r", col("s"), minMargin = 0.0).count()
    assert(zero == 0L)
  }
}
