package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking — the data-contract
  * gate a 100 TB ingest runs BEFORE anything downstream trusts the
  * batch (the published shape of Amazon Deequ / Great Expectations,
  * re-expressed as Spark aggregates).
  *
  * Scale shape: every row-scan rule (not-null, range, regex, accepted
  * set) folds into ONE shared aggregate pass over the table —
  * conditional sums, map-side combined, zero shuffles beyond the final
  * one-row reduce; rule count adds columns, not passes. Key rules
  * (uniqueness) add one groupBy each on their key; referential rules
  * add one broadcast-able left join each against the dimension's
  * distinct keys. Nothing here is ever corpus × corpus.
  *
  * Null semantics (documented, engine-portable): range/regex/accepted
  * rules do NOT count nulls as violations (SQL ternary logic — pair
  * them with NotNull to forbid nulls); Unique counts every row beyond
  * the first per key, with null keys grouping like any other value;
  * RefIntegrity counts non-null orphans only.
  *
  * Output: one row per rule — (rule, column, n_rows, n_violations,
  * passed) — deterministic and hash-checkable in any engine.
  */
object DataQuality {

  sealed trait Rule
  /** Column must never be null. */
  case class NotNull(col: String) extends Rule
  /** Key column(s) must identify at most one row. */
  case class Unique(cols: Seq[String]) extends Rule
  /** Non-null values must lie in [lo, hi]. */
  case class InRange(col: String, lo: Double, hi: Double) extends Rule
  /** Non-null values must match the regex (keep the pattern in the
    * portable POSIX-ish subset if oracles replay it). */
  case class Matches(col: String, regex: String) extends Rule
  /** Non-null values must be one of `values`. */
  case class Accepted(col: String, values: Seq[String]) extends Rule
  /** Non-null foreign keys must exist in `dim.dimCol`. */
  case class RefIntegrity(col: String, dim: DataFrame, dimCol: String)
    extends Rule

  private def label(r: Rule): (String, String) = r match {
    case NotNull(c) => ("not_null", c)
    case Unique(cs) => ("unique", cs.mkString(","))
    case InRange(c, _, _) => ("in_range", c)
    case Matches(c, _) => ("matches", c)
    case Accepted(c, _) => ("accepted", c)
    case RefIntegrity(c, _, _) => ("ref_integrity", c)
  }

  /** Violation-count expression for a row-scan rule (fused into the
    * single shared aggregate pass). */
  private def scanViolations(r: Rule): Option[Column] = {
    // coalesce: sum() over an EMPTY table is NULL — an empty batch (a
    // realistic failed-upstream input) must PASS with 0 violations, not
    // emit an un-checkable NULL row
    def cnt(c: Column) = coalesce(sum(c), lit(0L))
    r match {
      case NotNull(c) =>
        Some(cnt(when(col(c).isNull, 1L).otherwise(0L)))
      case InRange(c, lo, hi) =>
        Some(cnt(when(col(c).cast("double").between(lo, hi) === false, 1L)
          .otherwise(0L)))
      case Matches(c, re) =>
        Some(cnt(when(col(c).rlike(re) === false, 1L).otherwise(0L)))
      case Accepted(c, vs) =>
        Some(cnt(when(col(c).isin(vs: _*) === false, 1L).otherwise(0L)))
      case _ => None
    }
  }

  /** Run every rule against `df`; returns the per-rule summary frame
    * (rule, column, n_rows, n_violations, passed). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    val scanRules = rules.filter(scanViolations(_).isDefined)
    // one shared pass: count(*) + one conditional sum per scan rule
    val scanned: Option[DataFrame] =
      if (scanRules.isEmpty) None
      else {
        val aggs = scanRules.zipWithIndex.map { case (r, i) =>
          scanViolations(r).get.as(s"v$i")
        }
        val row = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
        // melt the one-row aggregate into per-rule rows IN the plan (no
        // collect): explode over a literal-tagged struct array
        val melted = row.select(col("n_rows"), explode(array(
          scanRules.zipWithIndex.map { case (r, i) =>
            val (nm, cl) = label(r)
            struct(lit(nm).as("rule"), lit(cl).as("column"),
              col(s"v$i").as("n_violations"))
          }: _*)).as("e"))
        Some(melted.select(col("e.rule").as("rule"),
          col("e.column").as("column"), col("n_rows"),
          col("e.n_violations").as("n_violations")))
      }
    val keyed: Seq[DataFrame] = rules.collect {
      case Unique(cs) =>
        // violations = rows beyond the first per key = n - distinct keys
        df.agg(count(lit(1)).as("n_rows"),
            (count(lit(1)) -
              count_distinct(struct(cs.map(col): _*))).as("n_violations"))
          .select(lit("unique").as("rule"),
            lit(cs.mkString(",")).as("column"),
            col("n_rows"), col("n_violations"))
      case RefIntegrity(c, dim, dc) =>
        val keys = dim.select(col(dc).as("__dq_key")).distinct()
        df.select(col(c)).join(keys, col(c) === col("__dq_key"), "left")
          .agg(count(lit(1)).as("n_rows"),
            coalesce(sum(when(col(c).isNotNull && col("__dq_key").isNull, 1L)
              .otherwise(0L)), lit(0L)).as("n_violations"))
          .select(lit("ref_integrity").as("rule"), lit(c).as("column"),
            col("n_rows"), col("n_violations"))
    }
    val parts = scanned.toSeq ++ keyed
    parts.reduce(_ unionByName _)
      .withColumn("passed", col("n_violations") === 0L)
      .select("rule", "column", "n_rows", "n_violations", "passed")
  }
}
