package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** Semantics of the corpus-curation operators: planted repetition is
  * caught, planted contamination is caught, sampling is deterministic
  * and exact, packing conserves tokens and respects its budget law. */
class CurationSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  // -------------------------------------------------------------------
  // repetition_quality
  // -------------------------------------------------------------------

  test("repetition: pure-spam doc is dropped, diverse doc kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.fill(30)("spam").mkString(" ")), // top-unigram frac = 1.0
      (2L, (1 to 30).map(i => s"w$i").mkString(" ")) // all distinct
    ).toDF("doc_id", "text")
    val m = Curation.repetitionMetrics(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    val spam = m(1L)
    assert(spam.getAs[Long]("top_token_q6") === 1000000L)
    assert(spam.getAs[Long]("dup_bigram_q6") === 28L * 1000000L / 29L) // 29 bigrams, 1 distinct
    assert(!spam.getAs[Boolean]("keep"))
    val diverse = m(2L)
    assert(diverse.getAs[Long]("top_token_q6") === 1000000L / 30)
    assert(diverse.getAs[Long]("dup_bigram_q6") === 0L)
    assert(diverse.getAs[Boolean]("keep"))
  }

  test("repetition: hand-computed fractions on a mixed doc") {
    import spark.implicits._
    // tokens: a a a b c  → n_tok=5, top_c=3
    // bigrams: "a a","a a","a b","b c" → n_bg=4, distinct=3 → dup=1
    val docs = Seq((7L, "a a a b c")).toDF("doc_id", "text")
    val r = Curation.repetitionMetrics(docs).collect().head
    assert(r.getAs[Long]("n_tok") === 5L)
    assert(r.getAs[Long]("top_token_q6") === 3L * 1000000L / 5L)
    assert(r.getAs[Long]("dup_bigram_q6") === 1L * 1000000L / 4L)
    assert(!r.getAs[Boolean]("keep")) // top 60% > 14%
  }

  test("repetition: single-token doc does not divide by zero") {
    import spark.implicits._
    val docs = Seq((9L, "lonely")).toDF("doc_id", "text")
    val r = Curation.repetitionMetrics(docs).collect().head
    assert(r.getAs[Long]("n_tok") === 1L)
    assert(r.getAs[Long]("dup_bigram_q6") === 0L)
    assert(r.getAs[Long]("top_token_q6") === 1000000L)
  }

  // -------------------------------------------------------------------
  // contamination_check
  // -------------------------------------------------------------------

  test("contamination: verbatim benchmark copy is flagged, disjoint doc is clean") {
    import spark.implicits._
    val benchText = (1 to 12).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, "bench", benchText),
      (2L, "web", benchText), // verbatim copy → every 4-gram hits
      (3L, "web", (1 to 12).map(i => s"c$i").mkString(" ")) // disjoint vocab
    ).toDF("doc_id", "source", "text")
    val r = Curation.contaminationReport(docs, Seq("bench"), minHits = 3)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(!r.contains(1L)) // benchmark docs are not reported
    val copy = r(2L)
    assert(copy.getAs[Long]("n_grams") === 9L) // 12 tokens → 9 distinct 4-grams
    assert(copy.getAs[Long]("n_hits") === 9L)
    assert(copy.getAs[Boolean]("contaminated"))
    val clean = r(3L)
    assert(clean.getAs[Long]("n_hits") === 0L)
    assert(!clean.getAs[Boolean]("contaminated"))
  }

  test("contamination: within-doc repeated 4-gram counts once") {
    import spark.implicits._
    val phrase = "p1 p2 p3 p4"
    val docs = Seq(
      (1L, "bench", phrase),
      // the contaminated 4-gram appears twice in the corpus doc
      (2L, "web", s"$phrase x $phrase")
    ).toDF("doc_id", "source", "text")
    val r = Curation.contaminationReport(docs, Seq("bench"), minHits = 1)
      .where($"doc_id" === 2L).collect().head
    assert(r.getAs[Long]("n_hits") === 1L)
  }

  // -------------------------------------------------------------------
  // sampling
  // -------------------------------------------------------------------

  test("stratified sample: deterministic, rate-respecting, filter-only") {
    val q = SparkEntry.queries("stratified_sample")
    val a = q(spark, sfDir).collect().map(_.toSeq).toSet
    val b = q(spark, sfDir).collect().map(_.toSeq).toSet
    assert(a === b) // no RNG anywhere
    // every surviving row's bucket honors its language's rate
    a.foreach { r =>
      val (lang, bucket) = (r(1).asInstanceOf[String], r(3).asInstanceOf[Long])
      val cap = lang match { case "en" => 2500L; case "fr" => 5000L; case _ => 10000L }
      assert(bucket < cap, s"lang=$lang bucket=$bucket")
    }
  }

  test("sample_exact_k: exactly min(k, stratum) rows per language") {
    import spark.implicits._
    val out = SparkEntry.queries("sample_exact_k")(spark, sfDir)
    val perLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val full = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    full.foreach { case (lang, n) =>
      assert(perLang.getOrElse(lang, 0L) === math.min(20L, n))
    }
  }

  // -------------------------------------------------------------------
  // sequence packing / domain mixing
  // -------------------------------------------------------------------

  test("sequence packing conserves tokens; seq ids contiguous; budget law") {
    import spark.implicits._
    val out = SparkEntry.queries("sequence_packing")(spark, sfDir).cache()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(size(split(col("text"), " ", -1)).cast("long").as("n_tok"))
    val totalDirect = docs.agg(sum("n_tok")).as[Long].collect().head
    val maxTok = docs.agg(max("n_tok")).as[Long].collect().head
    assert(out.agg(sum("seq_tokens")).as[Long].collect().head === totalDirect)
    // per group: seq ids are 0..max with no gaps
    out.groupBy("lang", "source")
      .agg(min("seq_id").as("lo"), max("seq_id").as("hi"),
        countDistinct("seq_id").as("n"))
      .collect().foreach { r =>
        assert(r.getAs[Long]("lo") === 0L)
        assert(r.getAs[Long]("n") === r.getAs[Long]("hi") + 1L)
      }
    // a sequence holds the docs that START inside its 512-token slot, so
    // its token sum is < budget + the largest straddling document
    out.collect().foreach { r =>
      assert(r.getAs[Long]("seq_tokens") < 512L + maxTok)
    }
    out.unpersist()
  }

  test("domain mixing equalizes planned token share across languages") {
    import spark.implicits._
    val rows = SparkEntry.queries("domain_mixing")(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("lang_tokens")).sum
    val n = rows.length.toLong
    rows.foreach { r =>
      val lt = r.getAs[Long]("lang_tokens")
      val epochs = r.getAs[Long]("mix_epochs_q6")
      assert(epochs === total * 1000000L / (n * lt)) // exact integer law
      // planned share within quantization error of the uniform target
      val planned = r.getAs[Long]("planned_tokens")
      assert(math.abs(planned - total / n) <= total / n / 1000 + lt / 1000000L + 1)
    }
  }
}
