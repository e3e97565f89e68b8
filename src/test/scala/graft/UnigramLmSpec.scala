package graft

import org.apache.spark.sql.functions._
import graft.ops.UnigramLm

/** Unigram-LM tokenizer (Kudo 2018, hard-EM variant): Viterbi laws,
  * EM behavior on planted structure, scoring invariants. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("viterbi: picks the max-likelihood split; ties to fewer pieces") {
    val lp = Map("a" -> -2.0, "b" -> -2.0, "ab" -> -1.0, "abab" -> -3.5)
    // "abab": [abab] = −3.5 beats [ab, ab] = −2.0? No: −2.0 > −3.5 —
    // two 'ab' pieces win on likelihood
    val (l, n, pieces) = UnigramLm.viterbi("abab", lp, maxPieceLen = 4)
    assert(l == -2.0 && n == 2 && pieces == List("ab", "ab"))
    // exact tie between [ab] and [a, b]: -1.0 vs -4.0 — no tie; force
    // one: p(ab) = p(a)+p(b)
    val lp2 = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0)
    val (l2, n2, p2) = UnigramLm.viterbi("ab", lp2, maxPieceLen = 2)
    assert(l2 == -2.0 && n2 == 1 && p2 == List("ab")) // fewer pieces wins
    // unsegmentable: char outside the vocab
    val (l3, n3, p3) = UnigramLm.viterbi("ax", lp, 4)
    assert(l3.isNegInfinity && n3 == 0 && p3.isEmpty)
    // segmentation always reassembles the word
    assert(UnigramLm.viterbi("ababab", lp, 4)._3.mkString == "ababab")
  }

  test("unigramTrain: frequent multi-char units survive EM; chars always kept") {
    // 'banana' dominates: 'an'/'na'/'ana'-family pieces should earn mass
    val docs = (Seq.fill(50)("banana banana split") ++
      Seq.fill(5)("band on the run")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m = UnigramLm.unigramTrain(docs, col("text"), vocabSize = 40,
      maxPieceLen = 3, iters = 3, seedSize = 200)
    val pieceSet = m.pieces.map(_._1).toSet
    // every character of the corpus is in the vocab
    "banasplitdoheru ".trim.foreach(c =>
      assert(pieceSet.contains(c.toString), s"missing char $c"))
    // at least one multi-char banana-substring survived with higher
    // prob than its char-by-char spelling
    val lp = m.logp
    val (lBan, nBan, _) = UnigramLm.viterbi("banana", lp, m.maxPieceLen)
    assert(nBan < 6, s"banana should NOT segment to single chars: $nBan")
    assert(lBan > "banana".map(c => lp(c.toString)).sum)
    // log-probs normalize: Σ exp(lp) ≈ 1 (9-dp rounding slack)
    val mass = m.pieces.map { case (_, l) => math.exp(l) }.sum
    assert(approx(mass, 1.0, 1e-6), s"prob mass $mass")
  }

  test("unigramTrain is partitioning-invariant (bit-equal model)") {
    val docs = (0L until 60L).map(i =>
      (i, s"alpha beta gamma w$i alphabeta")).toDF("doc_id", "text")
    val m1 = UnigramLm.unigramTrain(docs.repartition(1), col("text"),
      vocabSize = 60, maxPieceLen = 3, iters = 2, seedSize = 300)
    val m32 = UnigramLm.unigramTrain(docs.repartition(32), col("text"),
      vocabSize = 60, maxPieceLen = 3, iters = 2, seedSize = 300)
    assert(m1.pieces == m32.pieces)
  }

  test("unigramScore streams as-is: MemoryStream scores == batch scores") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val fit = Seq((1L, "banana band bandana"), (2L, "nab bana ban"))
      .toDF("doc_id", "text")
    val m = UnigramLm.unigramTrain(fit, col("text"), vocabSize = 30,
      maxPieceLen = 3, iters = 2, seedSize = 100)
    val rows = Seq((10L, "banana nab"), (11L, "band bandana banana"))
    val batch = UnigramLm.unigramScore(rows.toDF("doc_id", "text"),
      "doc_id", col("text"), m).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_pieces"),
        r.getAs[Double]("logp"))).toMap
    val input = MemoryStream[(Long, String)]
    val q = UnigramLm.unigramScore(input.toDF().toDF("doc_id", "text"),
        "doc_id", col("text"), m)
      .writeStream.format("memory").queryName("ug_stream")
      .outputMode("append").start()
    try {
      input.addData(rows.head); q.processAllAvailable()
      input.addData(rows(1)); q.processAllAvailable()
      val got = spark.table("ug_stream").collect()
        .map(r => r.getLong(0) -> (r.getAs[Long]("n_pieces"),
          r.getAs[Double]("logp"))).toMap
      assert(got == batch)
    } finally q.stop()
  }

  test("unigramScore: per-doc accounting, OOV isolation, blank docs") {
    val docs = Seq((1L, "banana band"), (2L, "qqq banana"), (3L, "  "))
      .toDF("doc_id", "text")
    val m = UnigramLm.unigramTrain(
      docs.where(col("doc_id") === 1L), col("text"),
      vocabSize = 30, maxPieceLen = 3, iters = 2, seedSize = 100)
    val out = UnigramLm.unigramScore(docs, "doc_id", col("text"), m)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_words") == 2L)
    assert(out(0).getAs[Long]("n_oov_words") == 0L)
    assert(out(0).getAs[Double]("logp") < 0.0)
    // 'qqq' has an unseen char: counted OOV, excluded from sums
    assert(out(1).getAs[Long]("n_oov_words") == 1L)
    val bananaOnly = UnigramLm.unigramScore(
      docs.where(col("doc_id") === 2L)
        .select(col("doc_id"), lit("banana").as("text")),
      "doc_id", col("text"), m).head().getAs[Double]("logp")
    assert(out(1).getAs[Double]("logp") == bananaOnly)
    // blank doc: zeros across the board
    assert(out(2).getAs[Long]("n_words") == 0L)
    assert(out(2).getAs[Double]("logp") == 0.0)
  }
}
