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
  * row of counters). Uniqueness is the exception: it needs its own
  * groupBy, and is counted as (rows − distinct keys).
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
    val (uniques, rowRules) = rules.partition(_.isInstanceOf[Unique])
    val counters: Seq[Column] = count(lit(1)).as("rows") +: rowRules.map {
      case NotNull(c) =>
        count(when(col(c).isNull, 1)).as(s"not_null($c)")
      case InRange(c, lo, hi) =>
        count(when(col(c) < lo || col(c) > hi, 1)).as(s"in_range($c,$lo,$hi)")
      case Matches(c, re) =>
        count(when(col(c).isNotNull && !col(c).rlike(re), 1)).as(s"matches($c)")
      case Holds(n, p) => count(when(!coalesce(p, lit(false)), 1)).as(n)
      case u: Unique => throw new IllegalStateException(u.name) // partitioned out
    }
    val row = df.agg(counters.head, counters.tail: _*).collect()(0)
    val base = row.schema.fieldNames.zipWithIndex
      .map { case (n, i) => n -> row.getLong(i) }.toMap
    val uniq = uniques.collect { case u @ Unique(cols @ _*) =>
      val dups = base("rows") -
        df.select(cols.map(col): _*).distinct().count()
      u.name -> dups
    }
    base ++ uniq
  }

  /** True iff every rule has zero violations. */
  def pass(df: DataFrame, rules: Seq[Rule]): Boolean =
    check(df, rules).forall { case (n, v) => n == "rows" || v == 0L }
}
