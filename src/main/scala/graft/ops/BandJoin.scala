package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-aware candidate enumeration for LSH band self-joins.
  *
  * Every banded detector in this engine ([[Similarity]]'s sign-LSH and
  * random-projection families, [[TextOps]]' MinHash) enumerates
  * candidate pairs with a self-join on `(band, bucket)`. That join's
  * cost is Σ m² over bucket sizes m — and a single HOT bucket (an
  * all-zeros embedding cluster, a boilerplate-dominated shingle, an
  * adversarial corpus) concentrates m²/2 pairs in ONE shuffle
  * partition. AQE's skew-join split does NOT help here: its heuristic
  * reads shuffle partition BYTES, and a hot LSH bucket is kilobytes of
  * (id, band, bucket) rows that EXPAND to millions of output pairs —
  * input-size-blind fan-out skew (measured in STRESS_r06.md: the
  * planted 20%-hot-bucket fixture leaves the executed plan without a
  * single `skew=true` split while one straggler task enumerates ~8M
  * pairs).
  *
  * The fix is the classic salted self-join, applied ADAPTIVELY so the
  * 99.99% of well-behaved buckets pay nothing:
  *
  *   1. one windowed count over `(band, bucket)` annotates every band
  *      row with its bucket size `m` — a single shuffle of the same
  *      rows the band join itself shuffles (O(corpus bands), not
  *      O(pairs)) — and the annotated table is materialized ONCE as a
  *      cached stage table every later stage reads;
  *   2. rows with m ≤ `hotThreshold` take the ordinary `(band, bucket)`
  *      self-join, same plan freedom (broadcast/SMJ) as the unsalted
  *      join;
  *   3. hot rows get a deterministic salt `hash(id) mod S`; each side
  *      is replicated S ways (left over peer-salt `p`, right over
  *      peer-salt `q`) and the join key becomes
  *      `(band, bucket, saltA, saltB)` — each (a, b) pair matches
  *      EXACTLY once (at saltA = q, saltB = p), and a bucket's m²/2
  *      pairs spread over S² independent shuffle keys, bounding any one
  *      task at ~m²/S². Replication cost is S× the hot rows only.
  *
  * Output: distinct undirected pairs `(va, vb)` with `va < vb` — the
  * same contract as the unsalted join the callers previously inlined,
  * so oracles are unchanged (salting redistributes enumeration, never
  * membership; pinned by BandJoinSpec against the naive join).
  *
  * At 100 TB: the sizes pass and the salted union keep every stage
  * shuffling (band, bucket, id)-shaped rows; no stage's per-task work
  * exceeds max(coldThreshold², hotMax²/S²) pair enumerations, so one
  * poisoned bucket degrades a task by a bounded factor instead of
  * serializing the stage.
  */
object BandJoin {

  /** Session-tunable geometry (defaults in parentheses): a deployment
    * facing a known-skewed corpus lowers the threshold; evidence runs
    * disable salting entirely (threshold Long.MaxValue) to measure the
    * straggler they are avoiding (STRESS_r06.md does exactly that). */
  val HotThresholdConf = "spark.graft.lsh.hotThreshold" // (1024)
  val SaltsConf = "spark.graft.lsh.salts"               // (8)

  /** Distinct undirected candidate pairs (va < vb) from a `(id, band,
    * k)` band table, salting buckets with more than `hotThreshold`
    * members across `salts`² join keys. `dedup = false` skips the final
    * distinct — correct ONLY when the band table has a single band per
    * id (one bucket each, so no pair can collide twice); the dedup's
    * shuffle of the full candidate volume is this join's single biggest
    * non-enumeration cost (measured ~0.5 s on ann_lsh_topk at sf0.1). */
  def selfCandidates(bands: DataFrame, dedup: Boolean = true): DataFrame = {
    val conf = bands.sparkSession.conf
    selfCandidates(bands,
      conf.get(HotThresholdConf, "1024").toLong,
      conf.get(SaltsConf, "8").toInt, dedup)
  }

  /** As [[selfCandidates(bands:org\.apache\.spark\.sql\.DataFrame,dedup:Boolean)*]],
    * with explicit geometry. */
  def selfCandidates(bands: DataFrame, hotThreshold: Long,
                     salts: Int, dedup: Boolean): DataFrame = {
    val s = bands.sparkSession
    import s.implicits._
    // Bucket sizes via a WINDOWED count, materialized ONCE as an eager
    // cached stage table. Two measured round-6 pathologies shaped this:
    // (a) a separate sizes aggregation + broadcast anti-join gave the
    // plan FIVE consumers of the lazy band input, and Spark builds
    // broadcast exchanges on CONCURRENT threads — they raced the
    // caller's stage-table cache before it was populated and each
    // recomputed the full upstream lineage (for MinHash, the
    // md5-per-shingle pipeline: 3× wall on the registered query);
    // (b) even cache-hit, the extra subtrees cost ~2× vs the plain
    // join. The window needs the same (band, k) shuffle the sizes
    // aggregation needed, annotates every row in place, and the eager
    // count() pays the lineage exactly once; hot/cold are then FILTERS
    // over the ~32-byte-per-row cached table. At 100 TB this is the
    // same written-stage-table discipline as the signature table
    // itself. The cache entry is released by the harness's per-query
    // clearCache (same lifecycle as the callers' stage tables).
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"band", $"k")
    val sized = bands.toDF("id", "band", "k")
      .withColumn("m", count(lit(1)).over(w)).persist()
    sized.count()
    // AQE-coalescing guard on the HOT path, learned the measured way
    // (STRESS_r06.md): the salted join's input is SMALL IN BYTES (a
    // band row is ~24 bytes) but EXPANDS quadratically per bucket, and
    // AQE's partition coalescing — like its skew split — only reads
    // shuffle bytes. Left to its defaults it merged the salted join's
    // 32 partitions into 3 tasks and re-serialized the very straggler
    // the salting had split (measured 41 s maxTask; 5.7 s pinned).
    // Explicit-numPartitions repartitions pin the exchanges
    // (user-specified counts are exempt from coalescing) on exactly the
    // join keys, so they satisfy the join's required distribution — no
    // extra shuffle beyond the one the join needs anyway. The COLD join
    // is deliberately NOT pinned: its per-bucket fan-out is bounded by
    // hotThreshold², and pinning would forfeit the broadcast-hash plan
    // that makes well-behaved corpora cheap (measured 2.1× on the 10×
    // MinHash fixture).
    val n = s.sessionState.conf.numShufflePartitions
    val cold = sized.where($"m" <= hotThreshold)
    val hot = sized.where($"m" > hotThreshold)
      .withColumn("salt", pmod(xxhash64($"id"), lit(salts)))
    val coldPairs = cold.select($"id".as("va"), $"band", $"k")
      .join(cold.select($"id".as("vb"), $"band", $"k"), Seq("band", "k"))
      .where($"va" < $"vb")
    // Common-case short-circuit: no hot bucket → the plain self-join IS
    // the whole answer. The probe is a ~ms scan of the cached stage
    // table, and skipping the empty hot subtree saves its 3 pinned
    // 32-task stages plus the union from every well-behaved query.
    if (hot.isEmpty)
      return if (dedup) coldPairs.select($"va", $"vb").distinct()
             else coldPairs.select($"va", $"vb")
    // left replicated over peer-salt p, right over peer-salt q; matching
    // (band, k, saltA, p) = (band, k, q, saltB) pairs each (a, b) exactly
    // once and splits one bucket's enumeration over salts^2 shuffle keys
    val peers = explode(sequence(lit(0L), lit(salts - 1L)))
    // disjoint column names per side: a band self-join on shared
    // attribute references is ambiguous to the analyzer
    val hotA = hot.select($"id".as("va"), $"band".as("band_a"),
      $"k".as("k_a"), $"salt".as("sa")).withColumn("p", peers)
      .repartition(n, $"band_a", $"k_a", $"sa", $"p")
    val hotB = hot.select($"id".as("vb"), $"band".as("band_b"),
      $"k".as("k_b"), $"salt".as("sb")).withColumn("q", peers)
      .repartition(n, $"band_b", $"k_b", $"q", $"sb")
    val hotPairs = hotA.join(hotB,
      $"band_a" === $"band_b" && $"k_a" === $"k_b" &&
        $"sa" === $"q" && $"p" === $"sb")
      .where($"va" < $"vb")
    val all = coldPairs.select($"va", $"vb")
      .union(hotPairs.select($"va", $"vb"))
    if (dedup) all.distinct() else all
  }
}
