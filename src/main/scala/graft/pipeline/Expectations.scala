package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations evaluated in ONE aggregation pass — the
  * engine form of the reference's scattered runtime self-checks (shape
  * assertion `datasources.py:349-353`, sentinel fills `:717-730`, empty-
  * batch guard `:756`): declare what a batch must satisfy, get one
  * violation count per rule from a single job, and let the pipeline
  * decide whether to land.
  *
  * Each rule compiles to a conditional COUNT over the same scan —
  * checking ten rules costs one pass, not ten (at 100 TB the batch is
  * read once; map-side partial aggregation reduces each partition to one
  * row of counters). Uniqueness rules fold into the SAME aggregate as
  * `rows − count_distinct(struct(keys))`: Catalyst plans the mixed
  * distinct/plain aggregate as one Expand (rows multiplied logically,
  * per distinct key set), but the batch is still scanned once — there is
  * no per-rule extra pass.
  */
object Expectations {

  sealed trait Rule { def name: String }
  /** Column must never be null. */
  final case class NotNull(col: String) extends Rule {
    def name = s"not_null($col)"
  }
  /** Column must fall in [lo, hi] when present. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    def name = s"in_range($col,$lo,$hi)"
  }
  /** Column must match the regex when present. */
  final case class Matches(col: String, regex: String) extends Rule {
    def name = s"matches($col)"
  }
  /** Arbitrary row predicate that must hold. */
  final case class Holds(name: String, predicate: Column) extends Rule
  /** Key columns must be unique across the batch. */
  final case class Unique(cols: String*) extends Rule {
    def name = s"unique(${cols.mkString(",")})"
  }

  /** Violation counts per rule name (0 = satisfied), plus "rows". */
  def check(df: DataFrame, rules: Seq[Rule]): Map[String, Long] = {
    val counters: Seq[Column] = count(lit(1)).as("rows") +: rules.map {
      case NotNull(c) =>
        count(when(col(c).isNull, 1)).as(s"not_null($c)")
      case InRange(c, lo, hi) =>
        count(when(col(c) < lo || col(c) > hi, 1)).as(s"in_range($c,$lo,$hi)")
      case Matches(c, re) =>
        count(when(col(c).isNotNull && !col(c).rlike(re), 1)).as(s"matches($c)")
      case Holds(n, p) => count(when(!coalesce(p, lit(false)), 1)).as(n)
      case u @ Unique(cols @ _*) =>
        // struct() is non-null even over null fields, so every row counts
        // and null keys compare equal — same semantics as distinct()
        (count(lit(1)) - count_distinct(struct(cols.map(col): _*))).as(u.name)
    }
    val row = df.agg(counters.head, counters.tail: _*).collect()(0)
    row.schema.fieldNames.zipWithIndex
      .map { case (n, i) => n -> row.getLong(i) }.toMap
  }

  /** True iff every rule has zero violations. */
  def pass(df: DataFrame, rules: Seq[Rule]): Boolean =
    check(df, rules).forall { case (n, v) => n == "rows" || v == 0L }
}
