package graft.pipeline

import java.time.LocalDate

/** Injected clock so every scheduling predicate is deterministic under
  * test. The reference's gates are all `today()`-relative
  * (`functions/utils/datasources.py:131,479-480,608-609`), which makes
  * them untestable as written — SURVEY §7 "hard parts" (4) prescribes
  * injecting a clock instead.
  */
trait Clock {
  def today: LocalDate
}

object Clock {
  /** Production clock: the JVM's current UTC date. */
  object System extends Clock {
    def today: LocalDate = LocalDate.now(java.time.ZoneOffset.UTC)
  }

  /** Test clock pinned to one date. */
  final case class Fixed(today: LocalDate) extends Clock
}
