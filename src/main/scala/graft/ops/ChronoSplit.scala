package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** G1 — per-group chronological 70/15/15 split (SURVEY §2.5 G1).
  *
  * Reference: `split_df_per_attack_and_state_chronologically`
  * (func_aux/func_preproc.py:154-203): for each (Attack, State) group, sort
  * by time; the first floor(0.7·n) rows → train, the next floor(0.15·n) →
  * val, the remainder → test; with a guard that if train+val would swallow
  * the whole group, the last row is forced into test (func_preproc.py:175-177).
  *
  * Spark-first design: the reference loops over groups on the driver; here
  * the whole split is ONE window computation — `row_number` and `count`
  * over `partitionBy(groupCols).orderBy(orderCols)` — i.e. a single shuffle
  * on the group keys, no driver iteration, scaling to any number of groups
  * and rows. Per-group data never has to fit in memory beyond one window
  * partition, and with thousands of (Attack, State) groups at 100 TB the
  * shuffle is well balanced; a single monster group would be the only skew
  * risk (AQE skew handling applies).
  */
object ChronoSplit {

  /** Add a `split ∈ {train,val,test}` column.
    *
    * @param orderCols must make the intra-group order total (ties break
    *                  nondeterministically otherwise — pass a unique id last).
    */
  def withSplit(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      trainFrac: Double = 0.70,
      valFrac: Double = 0.15,
      out: String = "split"): DataFrame = {
    val part = Window.partitionBy(groupCols.map(col): _*)
    val w = part.orderBy(orderCols: _*)
    val n = count(lit(1)).over(part)
    val rn = row_number().over(w)
    // Integer-truncation fractions, exactly as the reference:
    // n_train = int(n*0.7); n_val = int(n*0.15)  (func_preproc.py:168-171)
    val nTrain0 = floor(n * trainFrac)
    val nVal0 = floor(n * valFrac)
    // Guard (func_preproc.py:174-177): if n_train + n_val >= n then
    // n_train = max(1, n_train); n_val = max(0, min(n - n_train - 1, n_val)).
    val guard = nTrain0 + nVal0 >= n
    val nTrain = when(guard, greatest(lit(1L), nTrain0)).otherwise(nTrain0)
    val nVal = when(guard, greatest(lit(0L), least(n - nTrain - 1, nVal0))).otherwise(nVal0)
    df.withColumn(out,
      when(rn <= nTrain, "train")
        .when(rn <= nTrain + nVal, "val")
        .otherwise("test"))
  }
}
