package graft.ops

import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkTestBase

/** Algebraic laws over the set/join/dedup operators (SURVEY §5.3),
  * property-checked with scalacheck generators of small literal frames.
  * Driven through Prop/Test directly (no scalatestplus bridge in the
  * offline cache). */
class LawsSpec extends SparkTestBase {
  import spark.implicits._

  private val rows: Gen[List[(Int, String)]] = Gen.resize(12,
    Gen.listOf(Gen.zip(Gen.choose(0, 5), Gen.oneOf("x", "y", "z"))))

  private def df(xs: List[(Int, String)]): DataFrame = {
    // toDF on an empty list still needs a schema — seed with a dummy row
    // and strip it, keeping the frame genuinely empty but typed
    if (xs.isEmpty) List((0, "x")).toDF("k", "v").limit(0)
    else xs.toDF("k", "v")
  }

  private def check(name: String)(p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  test("dedup is idempotent") {
    check("dedup")(Prop.forAll(rows) { xs =>
      val once = df(xs).distinct()
      once.distinct().count() == once.count()
    })
  }

  test("union-all row count is additive") {
    check("union")(Prop.forAll(rows, rows) { (a, b) =>
      df(a).unionAll(df(b)).count() == a.size.toLong + b.size.toLong
    })
  }

  test("anti-join result is a subset of the left input; semi+anti partition it") {
    check("anti")(Prop.forAll(rows, rows) { (a, b) =>
      val l = df(a).distinct()
      val anti = l.join(df(b), Seq("k", "v"), "left_anti").count()
      val semi = l.join(df(b), Seq("k", "v"), "left_semi").count()
      anti + semi == l.count()
    })
  }

  test("tagged-union symmetric difference equals except-both-ways") {
    check("symmdiff")(Prop.forAll(rows, rows) { (a, b) =>
      val (da, db) = (df(a).distinct(), df(b).distinct())
      val viaExcept = da.except(db).unionAll(db.except(da))
        .as[(Int, String)].collect().toSet
      val viaCount = da.withColumn("side", org.apache.spark.sql.functions.lit(0))
        .unionAll(db.withColumn("side", org.apache.spark.sql.functions.lit(1)))
        .groupBy("k", "v")
        .count().where(org.apache.spark.sql.functions.col("count") === 1)
        .select("k", "v").as[(Int, String)].collect().toSet
      viaExcept == viaCount
    })
  }

  test("intersectAll and exceptAll partition the left multiset") {
    check("bagops")(Prop.forAll(rows, rows) { (a, b) =>
      val (da, db) = (df(a), df(b))
      da.intersectAll(db).count() + da.exceptAll(db).count() == a.size.toLong
    })
  }

  test("watermark (max) is monotone under union") {
    check("watermark")(Prop.forAll(rows, rows) { (a, b) =>
      import org.apache.spark.sql.functions.max
      def hi(d: DataFrame): Option[Int] =
        Option(d.agg(max("k")).collect()(0).get(0)).map(_.asInstanceOf[Int])
      val u = hi(df(a).unionAll(df(b)))
      Seq(hi(df(a)), hi(df(b))).flatten.forall(h => u.exists(_ >= h))
    })
  }

  test("int -> string -> int cast roundtrips") {
    check("cast")(Prop.forAll(rows) { xs =>
      df(xs).select($"k".cast("string").cast("int").as("k"), $"v")
        .as[(Int, String)].collect().toList.sorted == xs.sorted
    })
  }

  // ---- boilerplate chunk scrub laws ----

  private val corpus: Gen[List[String]] = Gen.resize(6,
    Gen.nonEmptyListOf(Gen.resize(30,
      Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d"))
        .map(_.mkString(" ")))))

  test("boilerplate scrub: chunk accounting and subsequence laws hold") {
    check("scrub")(Prop.forAll(corpus) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = TextOps.boilerplateScrubDocs(docs.toDF("doc_id", "text"))
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      docs.forall { case (id, text) =>
        val toks = text.split(" ").toList
        val (_, clean, nChunks, nDropped) = got(id)
        val expectChunks = (toks.size - 1) / 10 + 1
        // accounting: every chunk either survives or is counted dropped
        nChunks == expectChunks && nDropped >= 0 && nDropped <= nChunks &&
        // the cleaned text is a concatenation of surviving chunks in
        // order — hence a subsequence of the original token list
        isSubsequence(
          if (clean.isEmpty) Nil else clean.split(" ").toList, toks) &&
        // nothing dropped ⇒ text unchanged
        (nDropped > 0 || clean == text)
      }
    })
  }

  test("boilerplate scrub: a corpus of one doc never drops anything") {
    check("scrub-single")(Prop.forAll(corpus.map(_.take(1))) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      TextOps.boilerplateScrubDocs(docs.toDF("doc_id", "text"))
        .as[(Long, String, Long, Long)].collect()
        .forall(r => r._4 == 0L && r._2 == docs.head._2)
    })
  }

  private def isSubsequence(sub: List[String], full: List[String]): Boolean = {
    var rest = full
    sub.forall { t =>
      val i = rest.indexOf(t)
      if (i < 0) false else { rest = rest.drop(i + 1); true }
    }
  }
}
