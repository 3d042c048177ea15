#!/usr/bin/env bash
# Planted-pair cross-engine evidence run (round-6 review item): the
# driver fixture's embeddings are random unit vectors, so at sf0.1 the
# strict/proj near-dup detectors verify against DuckDB on ZERO rows —
# evidence that never exercises the md5-derived projection weights, band
# packing, or candidate join on a pair that should match. This run
# replays the SAME driver protocol (graft.Verify + scripts/selfcheck.py)
# over the gen_stress.py corpus, whose ~1% planted near-identical pairs
# (cos ~ 0.987) make every detector's expected output non-empty.
#
#   scripts/verify_planted.sh [baseSfDir] [workDir]
#
# Exit 0 = selfcheck PASS on all five embedding queries, AND the three
# near-dup detectors each produced rows (a vacuously-green empty result
# fails). Spark-side planted-pair exactness is SimilarityPlantedSpec.
set -euo pipefail
cd "$(dirname "$0")/.."

BASE="${1:-/root/testdata/sf0.1}"
WORK="${2:-/tmp/verify_planted_work}"
QUERIES="embedding_neardup_strict,embedding_neardup_proj,embedding_neardup_auto,ann_lsh_topk,ivf_topk"

rm -rf "$WORK" && mkdir -p "$WORK"
python3 scripts/gen_stress.py "$BASE" "$WORK/fixture" 1

SPARK_GRAFT_ONLY="$QUERIES" \
  sbt -batch "runMain graft.Verify $WORK/fixture $WORK/out" >/dev/null

python3 scripts/selfcheck.py "$WORK/fixture" "$WORK/out"

# non-vacuous: every near-dup detector must have found planted pairs
python3 - "$WORK/out" <<'EOF'
import sys, duckdb
out = sys.argv[1]
for q in ("embedding_neardup_strict", "embedding_neardup_proj",
          "embedding_neardup_auto"):
    n = duckdb.sql(f"SELECT COUNT(*) FROM read_parquet('{out}/{q}/*.parquet')").fetchone()[0]
    assert n > 0, f"{q}: empty result — planted pairs not found"
    print(f"non-empty {q}: {n} rows")
EOF
