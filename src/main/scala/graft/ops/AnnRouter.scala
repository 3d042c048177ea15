package graft.ops

import org.apache.spark.sql.DataFrame

import graft.functions.Kit

/** Corpus-stat-driven dispatch across the ANN ladder — the engine picks
  * the decade-appropriate retrieval algorithm instead of the user
  * knowing which decade they're in (SURVEY §2.10). One registered query,
  * `ann_auto_topk`, whose result IS the chosen branch's result:
  *
  *   - n ≤ 784        → exact broadcast top-k ([[Similarity.exactTopkFrom]])
  *   - 784 < n ≤ 500k → IVF probe-2 + exact scoring ([[Similarity.ivfTopkFrom]])
  *   - n > 500k       → IVF-PQ + exact re-rank ([[Pq.ivfpqFrom]])
  *
  * Both thresholds come from the family's own evidence, not taste:
  *
  * EXACT→IVF at n = 784 is the arithmetic crossover of the family's
  * measured cost model at its q = n/25 query convention. Exact work is
  * q·n = n²/25 dot products; IVF work is assignment n·K + probe q·K +
  * scoring q·(nprobe·n/K) with K = ⌈√n⌉ and nprobe = 2, i.e.
  * n^1.5·(1 + 1/25 + 2/25) = (28/25)·n^1.5. Equal when √n/25 = 28/25 ⇒
  * n = 28² = 784. Below it the index build costs more dots than it
  * saves (and brute force has perfect recall for free); above it the
  * gap widens as √n.
  *
  * IVF→IVF-PQ at n = 500,000 is a RESIDENCY budget, not a FLOP
  * crossover: STRESS_r09 §6 measured exact-IVF and IVF-PQ at query-side
  * wall parity at 2M vectors, while the full-width int64 corpus cached
  * at 1,096 MB vs 88 MB for the 4 B/vector code column (12.4×). PQ's
  * win is what stays resident — at 500k vectors the ~520 B/vector
  * payload passes a 256 MB per-executor cache budget (500k·520 B ≈
  * 260 MB), the fixture-scaled analogue of "the vectors no longer fit";
  * a deployment recomputes T2 as budgetBytes/520 from its executor
  * memory. Recall is NOT the trade here: IVF-PQ's measured hit sets
  * equal exact-IVF's at every decade (the ceiling is IVF probe-2
  * candidate generation, common to both branches).
  *
  * The DuckDB oracle replays the SAME dispatch from COUNT(*): all three
  * branch pipelines are gated by scalar-subquery predicates on n, so a
  * Spark/oracle disagreement on either the thresholds or any branch's
  * arithmetic is a hash mismatch. The gates sit on the branch CTE
  * INPUTS (xdots/idots/padc), not just the output union (round-9
  * ADVICE): DuckDB folds the scalar predicate into the scans, so a
  * dead branch — in particular the quadratic exact all-pairs — prunes
  * instead of executing at every fixture size. The fixture scales exercise exact
  * (n = 500 at sf0.001/sf0.01) and IVF (n = 2,000 at sf0.1); the
  * IVF-PQ branch is dispatch-tested in AnnRouterSpec and measured at
  * the 1000× decade (2M vectors) in the scale harness.
  *
  * Reference anchor: the reference routes each pipeline run to a
  * per-source handler by inspecting the source descriptor
  * (`main.py:14-90` dispatch table); this is the same decide-then-run
  * shape driven by corpus statistics instead of source names.
  */
object AnnRouter {

  /** Exact→IVF crossover: n²/25 = (28/25)·n^1.5 ⇒ n = 28². */
  val T1 = 784L

  /** IVF→IVF-PQ residency threshold: 256 MB budget / 520 B per
    * full-width vector row (see object scaladoc). */
  val T2 = 500000L

  /** The dispatch decision — pure, spec-tested at the boundaries, and
    * replayed by the oracle's gating predicates. */
  def choose(n: Long): String =
    if (n <= T1) "exact" else if (n <= T2) "ivf" else "ivfpq"

  /** PRODUCTION dispatch (round-9 verdict #3): same thresholds as
    * [[choose]], but when a current-format, non-stale stored index
    * ([[AnnIndex]]) covers the corpus, the above-T1 branches serve from
    * it instead of re-deriving the artifacts per call — the
    * amortization the lifecycle measured (39.5 s stored vs 149.3 s
    * re-derive at 2M vectors, AnnIndexScale). Dispatch inspects only
    * index METADATA (built_n, format, cell census over the 16 B/row
    * entries) — never the corpus — so routing overhead stays a small
    * constant at any decade.
    *
    *   - `n ≤ T1`: brute force always wins (an index probe costs more
    *     dots than the whole scan) — never routed to the store.
    *   - index current (built_n == n, format matches, no staleness
    *     trip): [[AnnIndex.topk]] — probe stored centroids, ADC over
    *     stored codes, exact re-rank via the shortlist fetch.
    *   - index absent/stale/mis-sized: fall back to the re-deriving
    *     branch of [[choose]] — correctness never waits on maintenance.
    *
    * The REGISTERED `ann_auto_topk` keeps re-deriving (the oracle must
    * replay the whole computation — the honest-cost convention);
    * AnnRouterSpec pins this form's row-parity against both the stored
    * path and the fallback, and the scale harness measures the 1000×
    * dispatch wall. */
  def routedTopk(idx: AnnIndex, base: DataFrame): DataFrame = {
    val s = base.sparkSession
    import s.implicits._
    val n = base.count()
    val branch = choose(n)
    val viaStore = branch != "exact" &&
      idx.builtN.contains(n) && !idx.needsRebuild()
    if (viaStore)
      idx.topk(base.where($"vec_id" % 25 === 0), base, k = 5)
        .select($"qid", $"cid", Kit.quantize($"cos", 6).as("cos_q6"))
    else branch match {
      case "exact" => Similarity.exactTopkFrom(base, 5)
      case "ivf"   => Similarity.ivfTopkFrom(base, n)
      case _       => Pq.ivfpqFrom(base, n)
    }
  }

  val annAutoTopk: QueryDef = QueryDef.sql(
    "ann_auto_topk",
    Similarity.oraclePrefix + ",\n" + Similarity.ivfCellsSql + ",\n" +
      Pq.pqSql +
      """,
        |xdots AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS cid,
        |    CAST(SUM(a.v * b.v) AS BIGINT) AS dot
        |  FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id <> b.vec_id
        |  WHERE a.vec_id % 25 = 0 AND (SELECT n FROM nn) <= 784
        |  GROUP BY 1, 2),
        |xsims AS (
        |  SELECT qid, cid,
        |    CAST(dot AS DOUBLE)
        |      / (SQRT(CAST(na.nrm AS DOUBLE)) * SQRT(CAST(nb.nrm AS DOUBLE))) AS cos
        |  FROM xdots
        |  JOIN norms na ON na.vec_id = qid
        |  JOIN norms nb ON nb.vec_id = cid),
        |xout AS (
        |  SELECT qid, cid, CAST(FLOOR(cos * 1000000) AS BIGINT) AS cos_q6
        |  FROM xsims
        |  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) <= 5),
        |rcand AS (
        |  SELECT DISTINCT p.qid, a.vec_id AS cid
        |  FROM probes p JOIN assign a ON a.cell = p.cell
        |  WHERE a.vec_id <> p.qid),
        |idots AS (
        |  SELECT c.qid, c.cid, CAST(SUM(fa.v * fb.v) AS BIGINT) AS dot
        |  FROM rcand c
        |  JOIN flat fa ON fa.vec_id = c.qid
        |  JOIN flat fb ON fb.vec_id = c.cid AND fb.i = fa.i
        |  WHERE (SELECT n FROM nn) > 784 AND (SELECT n FROM nn) <= 500000
        |  GROUP BY 1, 2),
        |isims AS (
        |  SELECT qid, cid,
        |    CAST(dot AS DOUBLE)
        |      / (SQRT(CAST(na.nrm AS DOUBLE)) * SQRT(CAST(nb.nrm AS DOUBLE))) AS cos
        |  FROM idots
        |  JOIN norms na ON na.vec_id = qid
        |  JOIN norms nb ON nb.vec_id = cid),
        |iout AS (
        |  SELECT qid, cid, CAST(FLOOR(cos * 1000000) AS BIGINT) AS cos_q6
        |  FROM isims
        |  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) <= 5),
        |padc AS (
        |  SELECT c.qid, c.cid, CAST(SUM(l.d2) AS BIGINT) AS adc_d2
        |  FROM rcand c
        |  JOIN codes x ON x.vec_id = c.cid
        |  JOIN qlut l ON l.qid = c.qid AND l.m = x.m AND l.j = x.code
        |  WHERE (SELECT n FROM nn) > 500000
        |  GROUP BY 1, 2),
        |pshort AS (
        |  SELECT qid, cid FROM padc
        |  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY adc_d2, cid) <= 20),
        |prdots AS (
        |  SELECT s.qid, s.cid, CAST(SUM(fa.v * fb.v) AS BIGINT) AS dot
        |  FROM pshort s
        |  JOIN flat fa ON fa.vec_id = s.qid
        |  JOIN flat fb ON fb.vec_id = s.cid AND fb.i = fa.i
        |  GROUP BY 1, 2),
        |prsims AS (
        |  SELECT qid, cid,
        |    CAST(dot AS DOUBLE)
        |      / (SQRT(CAST(na.nrm AS DOUBLE)) * SQRT(CAST(nb.nrm AS DOUBLE))) AS cos
        |  FROM prdots
        |  JOIN norms na ON na.vec_id = qid
        |  JOIN norms nb ON nb.vec_id = cid),
        |pout AS (
        |  SELECT qid, cid, CAST(FLOOR(cos * 1000000) AS BIGINT) AS cos_q6
        |  FROM prsims
        |  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) <= 5)
        |SELECT qid, cid, cos_q6 FROM xout
        |WHERE (SELECT n FROM nn) <= 784
        |UNION ALL
        |SELECT qid, cid, cos_q6 FROM iout
        |WHERE (SELECT n FROM nn) > 784 AND (SELECT n FROM nn) <= 500000
        |UNION ALL
        |SELECT qid, cid, cos_q6 FROM pout
        |WHERE (SELECT n FROM nn) > 500000""".stripMargin) { (s, dir) =>
    val base = Similarity.quantized(s, dir)
    val n = base.count()
    choose(n) match {
      case "exact" => Similarity.exactTopkFrom(base, 5)
      case "ivf"   => Similarity.ivfTopkFrom(base, n)
      case _       => Pq.ivfpqFrom(base, n)
    }
  }

  val all: Seq[QueryDef] = Seq(annAutoTopk)
}
