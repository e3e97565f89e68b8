package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-log operators — the dataset-versioning layer a continuously
  * re-crawled / re-labeled training corpus needs on top of
  * [[Dedup.corpusDiff]] (which DIFFS two snapshots; these BUILD the
  * snapshot or the history from an event stream of changes).
  *
  * Both operators are one key-partitioned window each: the change log
  * shuffles once on the entity key, attrs ride with the row, nothing is
  * re-joined. At 100 TB the change log is usually a small fraction of
  * the corpus; the base snapshot never shuffles at all in [[cdcMerge]]
  * when the log fits a broadcast.
  */
object Changelog {

  /** SCD Type-2 dimension build (Kimball's slowly-changing-dimension
    * method; the `valid_from`/`valid_to` interval table behind
    * point-in-time training joins — "what WAS this document's label when
    * the model saw it?"). From a change log carrying (key, ts, attrs):
    *
    *  1. collapse no-op rows — a log row whose attrs all equal the
    *     previous row's (null-safe) opens no new version;
    *  2. each surviving row opens a version at `valid_from = ts`,
    *     closed by the NEXT surviving row: `valid_to = lead(ts)`
    *     (half-open [from, to)), null `valid_to` ⇒ `is_current`.
    *
    * Two window functions over the SAME (key, ts ordering) — ONE
    * shuffle; the filter between them keeps the partitioning. `orderCols`
    * disambiguates equal timestamps deterministically (pass a sequence
    * column when the log can carry same-ts rows for one key; `valid_to`
    * still takes the lead row's TS value, so same-ts versions collapse
    * to zero-width intervals rather than reordering history). */
  def scd2(log: DataFrame, key: String, ts: String,
      attrs: Seq[String], orderCols: Seq[Column] = Nil): DataFrame = {
    require(attrs.nonEmpty, "scd2: need at least one attribute column")
    val ord = (col(ts) +: orderCols) :+ monotonicallyStableTiebreak(attrs)
    val w = Window.partitionBy(col(key)).orderBy(ord: _*)
    val changed = attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _) || row_number().over(w) === 1
    val kept = log.withColumn("__chg", changed).where(col("__chg"))
    val w2 = Window.partitionBy(col(key)).orderBy(ord: _*)
    kept
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__chg")
  }

  /** Deterministic final-ordering tiebreak: when (key, ts, orderCols)
    * still ties, order by the attr tuple itself so the window result
    * does not depend on partition scan order. */
  private def monotonicallyStableTiebreak(attrs: Seq[String]): Column =
    struct(attrs.map(col): _*)

  /** CDC merge (the Delta/Hudi/Iceberg MERGE INTO shape, engine-level):
    * apply a change log of upserts and deletes onto a base snapshot —
    * latest-wins per key. `op` must be 'U' (upsert: insert or update) or
    * 'D' (delete tombstone); any other value fails the run loudly rather
    * than silently dropping changes. Returns the post-merge snapshot
    * with the base's column layout.
    *
    * Shape: the log collapses to its LATEST row per key (one window —
    * ties on ts break by op then attrs, deterministic), then ONE
    * full-outer join against the base on the key:
    *  - key only in base           → base row survives;
    *  - latest op 'D'              → row dropped (tombstone), whether or
    *    not the base had it (a dangling delete is a no-op);
    *  - latest op 'U'              → the log row's attrs replace (or
    *    insert) the base row. */
  def cdcMerge(base: DataFrame, log: DataFrame, key: String, ts: String,
      op: String, attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "cdcMerge: need at least one attribute column")
    val badOp = log.where(!col(op).isin("U", "D")).limit(1).count()
    require(badOp == 0, s"cdcMerge: log contains ops outside {U, D}")
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).desc, col(op).desc, struct(attrs.map(col): _*).desc)
    val latest = log
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col(key).as("__lk"), col(op).as("__lop"),
        struct(attrs.map(col): _*).as("__lattrs"))
    base.join(latest, col(key) === col("__lk"), "full_outer")
      .where(coalesce(col("__lop"), lit("U")) =!= "D")
      .select(
        coalesce(col(key), col("__lk")).as(key) +:
        attrs.map(a => when(col("__lop") === "U",
          col("__lattrs").getField(a)).otherwise(col(a)).as(a)): _*)
  }
}
