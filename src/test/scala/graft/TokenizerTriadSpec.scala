package graft

import org.apache.spark.sql.functions._
import graft.ops.{TextOps, UnigramLm}

/** Cross-tokenizer contract suite: BPE, WordPiece, and the unigram LM
  * fitted on ONE shared corpus, pinned to the invariants every
  * subword tokenizer must share — lossless word reconstruction, OOV
  * accounting, and fertility arithmetic — so a future edit to one leg
  * can't silently skew it relative to the others. */
class TokenizerTriadSpec extends SparkSpec {
  import spark.implicits._

  /** Shared training corpus: repetitive enough that BPE merges fire
    * and WordPiece/unigram vocabularies cover every character. */
  private val corpus = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "quick quick brown brown lazy lazy dog dog fox fox",
    "a dog and a fox walk over the brown log",
    "the the the quick quick brown fox dog lazy over")

  /** A word containing a character ('é') that never appears at fit
    * time: OOV for WordPiece and the unigram LM; BPE still encodes it
    * (character fallback — BPE has no closed vocabulary). */
  private val alienWord = "éclair"

  private lazy val train = corpus.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  private lazy val merges = TextOps.bpeTrain(train, col("text"), nMerges = 20)
  private lazy val wpVocab = TextOps.wordpieceVocabFit(train, col("text"),
    topWords = 10, minCharCount = 1L)
  private lazy val ugModel = UnigramLm.unigramTrain(train, col("text"),
    vocabSize = 60, maxPieceLen = 4, iters = 2, seedSize = 200)

  private def distinctWords: Seq[String] =
    corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty).distinct

  test("lossless concat: every tokenizer's pieces rebuild the word " +
    "(or the whole word is the declared OOV token)") {
    // one word per row, so per-word token groups are unambiguous
    val words = (distinctWords :+ alienWord).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")

    // BPE: symbols concatenate back to the word, ALWAYS (no OOV) —
    // modulo the Sennrich end-of-word marker on the last symbol
    TextOps.bpeEncode(words, col("text"), merges)
      .select(col("text"), col("bpe_tokens")).collect().foreach { r =>
        assert(r.getSeq[String](1).mkString.replace("</w>", "")
            == r.getString(0),
          s"BPE pieces do not rebuild '${r.getString(0)}'")
      }

    // WordPiece: strip the "##" continuation marker and concatenate;
    // a word with any uncovered position is exactly one [UNK]
    TextOps.wordpieceEncode(words, col("text"), wpVocab)
      .select(col("text"), col("wp_tokens"), col("wp_n_unk_words"))
      .collect().foreach { r =>
        val w = r.getString(0)
        val toks = r.getSeq[String](1)
        if (r.getLong(2) == 0L)
          assert(toks.map(_.stripPrefix("##")).mkString == w,
            s"WordPiece pieces do not rebuild '$w'")
        else {
          assert(w == alienWord, s"unexpected OOV word '$w'")
          assert(toks == Seq("[UNK]"))
        }
      }

    // unigram: Viterbi pieces concatenate back to the (lowercased)
    // word; the alien word is unsegmentable (-inf, no pieces)
    (distinctWords :+ alienWord).foreach { w =>
      val (lp, n, pieces) = UnigramLm.viterbi(w, ugModel.logp,
        ugModel.maxPieceLen)
      if (w == alienWord) {
        assert(lp == Double.NegativeInfinity && pieces.isEmpty,
          s"alien word '$w' should be unsegmentable")
      } else {
        assert(pieces.mkString == w,
          s"unigram pieces do not rebuild '$w'")
        assert(n == pieces.length && lp < 0.0)
      }
    }
  }

  test("OOV accounting: the planted alien word is one OOV unit for " +
    "WordPiece and the unigram LM, and plain characters for BPE") {
    val doc = Seq((0L, s"the $alienWord dog")).toDF("doc_id", "text")

    val wp = TextOps.wordpieceEncode(doc, col("text"), wpVocab).head()
    assert(wp.getAs[Long]("wp_n_words") == 3L)
    assert(wp.getAs[Long]("wp_n_unk_words") == 1L)
    assert(wp.getSeq[String](wp.fieldIndex("wp_tokens"))
      .count(_ == "[UNK]") == 1)

    val ug = UnigramLm.unigramScore(doc, "doc_id", col("text"), ugModel)
      .head()
    assert(ug.getAs[Long]("n_words") == 3L)
    assert(ug.getAs[Long]("n_oov_words") == 1L)
    // OOV words are EXCLUDED from the piece count: "the" and "dog" are
    // fit-time pieces (or splits of them), so n_pieces stays positive
    assert(ug.getAs[Long]("n_pieces") >= 2L)

    val bpe = TextOps.bpeEncode(doc, col("text"), merges).head()
    val toks = bpe.getSeq[String](bpe.fieldIndex("bpe_tokens"))
    // BPE has no OOV: the alien word's characters all appear, in order
    assert(toks.mkString.replace("</w>", "") == "the" + alienWord + "dog")
  }

  test("fertility accounting: tokenizerFertility's group totals equal " +
    "the per-doc bpeEncode counts it aggregates") {
    val docs = train.withColumn("lang", lit("xx"))
    val fert = TextOps.tokenizerFertility(docs, col("text"), merges, "lang")
      .head()
    val perDoc = TextOps.bpeEncode(docs, col("text"), merges)
      .select(col("bpe_tokens_n"),
        TextOps.tokenCount(col("text")).cast("long").as("nw"))
      .collect()
    val nSub = perDoc.map(_.getLong(0)).sum
    val nWords = perDoc.map(_.getLong(1)).sum
    assert(fert.getAs[Long]("n_subwords") == nSub)
    assert(fert.getAs[Long]("n_words") == nWords)
    assert(fert.getAs[Double]("fertility") ==
      BigDecimal(nSub.toDouble / nWords)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // subword tokenizers never emit fewer pieces than words
    assert(nSub >= nWords && fert.getAs[Double]("fertility") >= 1.0)
  }

  test("cross-tokenizer fertility sanity on the shared corpus: every " +
    "leg's tokens-per-word is >= 1 and finite") {
    val docs = train
    val nWords = corpus.map(_.split("\\s+").count(_.nonEmpty)).sum.toLong

    val bpeN = TextOps.bpeEncode(docs, col("text"), merges)
      .agg(sum("bpe_tokens_n")).head().getLong(0)
    val wpRow = TextOps.wordpieceEncode(docs, col("text"), wpVocab)
      .agg(sum("wp_n_tokens").as("t"), sum("wp_n_words").as("w"),
        sum("wp_n_unk_words").as("u")).head()
    val ugRow = UnigramLm.unigramScore(docs, "doc_id", col("text"), ugModel)
      .agg(sum("n_pieces").as("p"), sum("n_words").as("w"),
        sum("n_oov_words").as("o")).head()

    assert(wpRow.getLong(1) == nWords && ugRow.getLong(1) == nWords,
      "word counts disagree across tokenizer legs")
    assert(wpRow.getLong(2) == 0L && ugRow.getLong(2) == 0L,
      "the shared training corpus must be fully covered by its own fit")
    assert(bpeN >= nWords && wpRow.getLong(0) >= nWords
      && ugRow.getLong(0) >= nWords)
  }
}
