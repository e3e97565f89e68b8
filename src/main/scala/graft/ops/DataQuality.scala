package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the Deequ-style
  * (Schelter et al. 2018, "Automating Large-Scale Data Quality
  * Verification", VLDB) contract gate a 100 TB ingest runs BEFORE the
  * corpus enters curation: completeness, uniqueness, ranges, domains,
  * patterns, and referential integrity, each as a declared rule with a
  * measured metric and a pass/fail verdict.
  *
  * Scale shape: every row-local rule (completeness, range, domain,
  * pattern, row count) FUSES into ONE map-side-combined aggregation
  * pass over the table — adding rules adds columns, not scans.
  * [[Rule.Unique]] adds exact `count(distinct struct)` inside the same
  * aggregation (the documented 100 TB swap is `approx_count_distinct`);
  * each [[Rule.RefIntegrity]] adds one left-anti-join count against its
  * dimension (broadcast when small). The report is |rules| rows.
  */
object DataQuality {

  sealed trait Rule {
    /** Stable report key: `kind(column…)`. */
    def name: String
  }
  object Rule {
    /** Fraction of non-null values must be ≥ `minFrac` (1.0 = NOT NULL). */
    final case class NotNull(column: String, minFrac: Double = 1.0) extends Rule {
      require(minFrac >= 0 && minFrac <= 1, "minFrac in [0,1]")
      def name = s"not_null($column)"
    }
    /** The column tuple must be globally unique. */
    final case class Unique(columns: Seq[String]) extends Rule {
      require(columns.nonEmpty, "Unique needs columns")
      def name = s"unique(${columns.mkString(",")})"
    }
    /** Fraction of non-null values inside [lo, hi] must be ≥ `minFrac`. */
    final case class InRange(column: String, lo: Double, hi: Double,
        minFrac: Double = 1.0) extends Rule {
      require(lo <= hi, "lo <= hi")
      def name = s"in_range($column)"
    }
    /** Fraction of non-null values in `values` must be ≥ `minFrac`. */
    final case class InSet(column: String, values: Seq[String],
        minFrac: Double = 1.0) extends Rule {
      require(values.nonEmpty, "InSet needs values")
      def name = s"in_set($column)"
    }
    /** Fraction of non-null values matching `regex` must be ≥ `minFrac`. */
    final case class MatchesRegex(column: String, regex: String,
        minFrac: Double = 1.0) extends Rule {
      def name = s"matches_regex($column)"
    }
    /** Row count within [lo, hi]. */
    final case class RowCountBetween(lo: Long, hi: Long) extends Rule {
      require(lo <= hi, "lo <= hi")
      def name = "row_count"
    }
    /** Every non-null value must exist in `dimColumn` of `dim` (FK
      * coverage); metric = fraction of rows with a match. */
    final case class RefIntegrity(column: String, dim: DataFrame,
        dimColumn: String) extends Rule {
      def name = s"ref_integrity($column)"
    }
  }
  import Rule._

  /** Run the rule suite; returns one row per rule:
    * (rule, metric, threshold, pass). Metrics are fractions (or the raw
    * row count for [[Rule.RowCountBetween]]), rounded to 6 dp —
    * fractions of exact integer counts, engine-portable. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "check: need at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      s"check: duplicate rule names — add distinguishing columns")
    val spark = df.sparkSession
    import spark.implicits._

    def frac(cnt: Column, base: Column): Column =
      when(base > 0, round(cnt.cast("double") / base.cast("double"), 6))
        .otherwise(lit(1.0))

    val n = count(lit(1))
    // one fused aggregation: (metric, threshold-pass precursor) per rule
    val fused: Seq[(Rule, Column)] = rules.collect {
      case r @ NotNull(c, _) =>
        r -> frac(count(col(c)), n)
      case r @ Unique(cols) =>
        // struct() is never null, so countDistinct covers every row:
        // metric = distinct tuples / rows, 1.0 ⇔ unique
        r -> frac(countDistinct(struct(cols.map(col): _*)), n)
      case r @ InRange(c, lo, hi, _) =>
        r -> frac(sum(when(col(c).isNotNull &&
            col(c).cast("double").between(lo, hi), 1L).otherwise(0L)),
          count(col(c)))
      case r @ InSet(c, vs, _) =>
        r -> frac(sum(when(col(c).isin(vs: _*), 1L).otherwise(0L)),
          count(col(c)))
      case r @ MatchesRegex(c, re, _) =>
        r -> frac(sum(when(col(c).rlike(re), 1L).otherwise(0L)),
          count(col(c)))
      case r @ RowCountBetween(_, _) =>
        r -> n.cast("double")
    }
    val fusedRow: Map[String, Double] =
      if (fused.isEmpty) Map.empty
      else {
        val aggs = fused.map { case (r, c) => c.as(r.name) }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        fused.map { case (r, _) => r.name -> row.getAs[Double](r.name) }.toMap
      }
    // referential-integrity rules: one anti-join count each
    val refRows: Map[String, Double] = rules.collect {
      case r @ RefIntegrity(c, dim, dc) =>
        val total = df.where(col(c).isNotNull).count()
        val misses =
          if (total == 0) 0L
          else df.select(col(c)).where(col(c).isNotNull)
            .join(dim.select(col(dc).as(c)).distinct(), Seq(c), "left_anti")
            .count()
        r.name -> (if (total == 0) 1.0
          else BigDecimal((total - misses).toDouble / total)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val metrics = fusedRow ++ refRows
    rules.map { r =>
      val m = metrics(r.name)
      val (threshold, pass) = r match {
        case NotNull(_, f) => (f, m >= f)
        case Unique(_) => (1.0, m >= 1.0)
        case InRange(_, _, _, f) => (f, m >= f)
        case InSet(_, _, f) => (f, m >= f)
        case MatchesRegex(_, _, f) => (f, m >= f)
        case RowCountBetween(lo, hi) =>
          (lo.toDouble, m >= lo.toDouble && m <= hi.toDouble)
        case RefIntegrity(_, _, _) => (1.0, m >= 1.0)
      }
      (r.name, m, threshold, pass)
    }.toDF("rule", "metric", "threshold", "pass")
  }
}
