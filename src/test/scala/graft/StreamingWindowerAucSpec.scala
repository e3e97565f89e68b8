package graft

import org.apache.spark.sql.functions._
import graft.ops.{BinnedAuc, Curves, SlidingWindows}

/** The fully-parallel windower (global index + iterator ring buffer) must
  * be byte-equal to the single-partition spec; the one-pass binned AUC
  * must track the exact AUC within bin resolution. */
class StreamingWindowerAucSpec extends SparkSpec {
  import spark.implicits._

  test("withGlobalIndex: dense 1..n, honors order, fully parallel") {
    val df = (1 to 500).map(i => (i * 7 % 501, s"v$i")).toDF("key", "v").repartition(7)
    val idx = SlidingWindows.withGlobalIndex(df, Seq(col("key")), "rn", numPartitions = 5)
    val rows = idx.select("key", "rn").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.map(_._2).sorted.toSeq == (1L to 500L))
    assert(rows.sortBy(_._2).map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
  }

  test("slideGlobalStreaming == slideGlobal across a parameter grid, ride-along columns intact") {
    val df = (1 to 173).map(i => (i.toLong, i * 1.5, s"lab$i")).toDF("t", "x", "lab")
      .repartition(6)
    for {
      seqLen <- Seq(1, 5, 12)
      step <- Seq(1, 4)
      // 19 range partitions of ~9 rows with seqLen=12 forces carry-in
      // chains across MULTIPLE short predecessors; 1 partition is the
      // degenerate serial case
      rangeParts <- Seq(1, 4, 19)
    } {
      val expected = SlidingWindows.slideGlobal(df, Seq(col("t")), col("x"), seqLen, step)
        .select(col("win_id").cast("long"), col("window"), col("lab"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toList, r.getString(2)))
        .sortBy(_._1)
      val got = SlidingWindows.slideGlobalStreaming(df, Seq(col("t")), col("x"),
          seqLen, step, rangePartitions = rangeParts)
        .select(col("win_id"), col("window"), col("lab"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toList, r.getString(2)))
        .sortBy(_._1)
      assert(got.toSeq == expected.toSeq, s"seqLen=$seqLen step=$step rangeParts=$rangeParts")
    }
  }

  test("slideGlobalStreaming handles array features (window of rows)") {
    val df = (1 to 30).map(i => (i.toLong, Seq(i.toDouble, i * 2.0))).toDF("t", "row")
    val out = SlidingWindows.slideGlobalStreaming(df, Seq(col("t")), col("row"), 3, 3, 8)
      .select(col("win_id"), col("window")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[scala.collection.Seq[Double]](1).toList.map(_.toList)).toMap
    assert(out(3L) == List(List(1.0, 2.0), List(2.0, 4.0), List(3.0, 6.0)))
    assert(out.keySet == Set(3L, 6L, 9L, 12L, 15L, 18L, 21L, 24L, 27L, 30L))
  }

  test("BinnedAuc tracks exact AUC within bin resolution") {
    // deterministic scores with heavy ties at 3-decimal resolution
    val data = (1 to 4000).map { i =>
      val score = math.rint((i % 997) / 997.0 * 1000) / 1000.0
      val label = if ((i * 2654435761L % 100) < score * 100) 1 else 0
      (label, score)
    }
    val ds = data.toDS()
    val approxAuc = ds.select(new BinnedAuc(8192).toColumn).head()
    val exact = Curves.rocAuc(ds.toDF("y", "s"), col("y"), col("s")).head().getDouble(0)
    assert(math.abs(approxAuc - exact) < 2e-3, s"binned=$approxAuc exact=$exact")
    // degenerate: single class → NaN
    val oneClass = Seq((1, 0.5), (1, 0.9)).toDS()
    assert(oneClass.select(new BinnedAuc(64).toColumn).head().isNaN)
  }
}
