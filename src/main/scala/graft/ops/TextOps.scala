package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Kit
import graft.sources.Tables

/** Text-analysis / dedup operators over the `documents` table — the
  * training-data-pipeline surface (SURVEY §2.10). All token/shingle work
  * uses higher-order array functions (no UDFs), so it scales as ordinary
  * codegen'd expressions; the near-dup join is shingle-bucketed (candidate
  * pairs only), never a naive doc×doc cross join.
  */
object TextOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Exact dedup by content hash: one surviving doc_id per distinct text
    * (md5 — identical hex in Spark and DuckDB). The groupBy shuffles the
    * 16-byte hash, not the document body. */
  val dedupExactDocs: QueryDef = QueryDef.sql(
    "dedup_exact_docs",
    """SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_id,
      |  COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(text)""") { (s, dir) =>
    import s.implicits._
    t(s, dir, "documents")
      .groupBy(md5($"text").as("text_md5"))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** Per-document quality stats: char length, whitespace token count,
    * BPE-ish token count (word-or-punct regex), alpha char count, space
    * count — the length/punct/stopword quality-scoring kit. */
  val textStats: QueryDef = QueryDef.sql(
    "text_stats",
    """SELECT doc_id, lang,
      |  length(text) AS n_chars_calc,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_ws,
      |  CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_tokens_bpeish,
      |  length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha,
      |  length(text) - length(replace(text, ' ', '')) AS n_spaces
      |FROM documents""") { (s, dir) =>
    import s.implicits._
    t(s, dir, "documents").select(
      $"doc_id", $"lang",
      length($"text").cast(LongType).as("n_chars_calc"),
      size(split($"text", " ", -1)).cast(LongType).as("n_tokens_ws"),
      size(regexp_extract_all($"text", lit("\\w+|[^\\w\\s]"), lit(0)))
        .cast(LongType).as("n_tokens_bpeish"),
      length(regexp_replace($"text", "[^a-z]", "")).cast(LongType).as("n_alpha"),
      (length($"text") - length(regexp_replace($"text", " ", "")))
        .cast(LongType).as("n_spaces"))
  }

  /** Language histogram with exact integer stats (A-style rollup on the
    * declared lang column). */
  val langHistogram: QueryDef = QueryDef.sql(
    "lang_histogram",
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
      |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      |FROM documents GROUP BY lang""") { (s, dir) =>
    import s.implicits._
    t(s, dir, "documents").groupBy($"lang").agg(
      count(lit(1)).as("n_docs"),
      sum($"n_chars").as("total_chars"),
      (sum($"n_chars").cast(DoubleType) / count(lit(1))).as("avg_chars"),
      min($"n_chars").as("min_chars"),
      max($"n_chars").as("max_chars"))
  }

  /** Stopword-ratio language ID heuristic: count occurrences of English
    * function words per doc (substring-count via length arithmetic — no
    * regex in the hot path), classify by a fixed threshold on the ratio.
    * Deterministic and ANSI-expressible → oracle-checkable. */
  val langIdHeuristic: QueryDef = QueryDef.sql(
    "lang_id_heuristic",
    """SELECT doc_id,
      |  CAST((length(text) - length(replace(text, ' the ', ''))) / 5
      |     + (length(text) - length(replace(text, ' a ', ''))) / 3 AS BIGINT) AS en_hits,
      |  CASE WHEN (length(text) - length(replace(text, ' the ', ''))) / 5
      |          + (length(text) - length(replace(text, ' a ', ''))) / 3 >= 2
      |       THEN 'en' ELSE 'unknown' END AS lang_guess
      |FROM documents""") { (s, dir) =>
    import s.implicits._
    def hits(word: String): org.apache.spark.sql.Column =
      (length($"text") - length(regexp_replace($"text",
        java.util.regex.Pattern.quote(word), ""))) / lit(word.length)
    val enHits = (hits(" the ") + hits(" a ")).cast(LongType)
    t(s, dir, "documents").select(
      $"doc_id",
      enHits.as("en_hits"),
      when(enHits >= 2, "en").otherwise("unknown").as("lang_guess"))
  }

  /** Document fingerprint: md5 over the normalized text (lower + strip
    * non-alphanumerics) — stable under whitespace/punct jitter, the cheap
    * first stage of a dedup cascade. */
  val docFingerprint: QueryDef = QueryDef.sql(
    "doc_fingerprint",
    """SELECT doc_id,
      |  md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS fingerprint
      |FROM documents""") { (s, dir) =>
    import s.implicits._
    t(s, dir, "documents").select(
      $"doc_id",
      md5(regexp_replace(lower($"text"), "[^a-z0-9 ]", "")).as("fingerprint"))
  }

  /** Exact n-gram Jaccard near-dup detection, shingle-bucketed: explode
    * distinct word-3-grams, self-join on the shingle (candidate pairs
    * share ≥1 shingle — never doc×doc), count intersections, Jaccard =
    * |∩| / (|A|+|B|−|∩|), keep pairs ≥ 0.30. Quantized (floor×1e6) so the
    * double division is engine-portable. At 100 TB the same plan holds:
    * the shuffle key is the shingle, hot shingles are the skew risk —
    * AQE skew-join handles it, or pre-filter stopword-only shingles. */
  val ngramJaccardNeardup: QueryDef = QueryDef.sql(
    "ngram_jaccard_neardup",
    """WITH tok AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s
      |  FROM tok, UNNEST(range(1, greatest(len(ts) - 1, 1))) AS t(i)),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_both
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT doc_a, doc_b,
      |  CAST(FLOOR(CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both) * 1000000) AS BIGINT) AS jaccard_q6
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = doc_a
      |JOIN sizes sb ON sb.doc_id = doc_b
      |WHERE CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both) >= 0.30""") { (s, dir) =>
    import s.implicits._
    val sh = t(s, dir, "documents")
      .select($"doc_id", split(lower($"text"), " ").as("ts"))
      .select($"doc_id", explode(expr(
        "transform(sequence(0, greatest(size(ts) - 3, 0)), i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2]))"))
        .as("s"))
      .distinct()
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val a = sh.toDF("doc_a", "s")
    val b = sh.toDF("doc_b", "s")
    val inter = a.join(b, Seq("s")).where($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("n_both"))
    val jac = $"n_both".cast(DoubleType) / ($"sa.n" + $"sb.n" - $"n_both")
    inter
      .join(sizes.as("sa"), $"sa.doc_id" === $"doc_a")
      .join(sizes.as("sb"), $"sb.doc_id" === $"doc_b")
      .where(jac >= 0.30)
      .select($"doc_a", $"doc_b", Kit.quantize(jac, 6).as("jaccard_q6"))
  }

  val all: Seq[QueryDef] = Seq(
    dedupExactDocs, textStats, langHistogram, langIdHeuristic,
    docFingerprint, ngramJaccardNeardup)
}
