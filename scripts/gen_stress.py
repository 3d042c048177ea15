#!/usr/bin/env python3
"""Deterministic 10x stress fixture for the dedup/graph/ANN family.

The driver's fixtures stop at sf0.1 (5k documents / 2k embeddings); the
100-TB arguments in SURVEY.md section 8 need at least one measured point
beyond that. This generator synthesizes a documents/embeddings pair that
is FACTOR times sf0.1 with the same statistical shape:

- vocabulary and per-language/source mix sampled from the sf0.1 fixture
- doc lengths drawn from the empirical sf0.1 length distribution
- ~5% of docs are planted near-duplicates of an earlier doc (3 word
  substitutions) so detector recall/candidate volume stays comparable
- embeddings are a 16-center Gaussian mixture (center id = label), the
  same cluster structure the IVF/kmeans ops expect

Everything is seeded; two runs produce byte-identical parquet. Usage:

    python3 scripts/gen_stress.py /root/testdata/sf0.1 /tmp/sf1_stress 10
"""
import sys
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

def main():
    base, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    rng = np.random.default_rng(20260813)
    con = duckdb.connect()

    docs = con.execute(
        f"SELECT doc_id, text, lang, source FROM read_parquet('{base}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    vocab = sorted({w for _, t, _, _ in docs for w in t.split(" ")})
    lengths = np.array([len(t.split(" ")) for _, t, _, _ in docs])
    langs = [l for _, _, l, _ in docs]
    sources = [s for _, _, _, s in docs]

    n_docs = len(docs) * factor
    out_rows = []
    texts = []
    for i in range(n_docs):
        if i >= 100 and rng.random() < 0.05:
            # planted near-dup: mutate an earlier stress doc (3 word swaps)
            src = int(rng.integers(0, i))
            words = texts[src].split(" ")
            for _ in range(3):
                words[int(rng.integers(0, len(words)))] = vocab[int(rng.integers(0, len(vocab)))]
            text = " ".join(words)
        else:
            ln = int(lengths[int(rng.integers(0, len(lengths)))])
            text = " ".join(vocab[int(j)] for j in rng.integers(0, len(vocab), ln))
        texts.append(text)
        out_rows.append((i, text,
                         langs[int(rng.integers(0, len(langs)))],
                         sources[int(rng.integers(0, len(sources)))],
                         len(text)))
    import os
    os.makedirs(out, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in out_rows], pa.int64()),
        "text": pa.array([r[1] for r in out_rows], pa.string()),
        "lang": pa.array([r[2] for r in out_rows], pa.string()),
        "source": pa.array([r[3] for r in out_rows], pa.string()),
        "n_chars": pa.array([r[4] for r in out_rows], pa.int64()),
    }), f"{out}/documents.parquet")

    n_vec = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{base}/embeddings.parquet')"
    ).fetchone()[0] * factor
    dim, k = 64, 16
    centers = rng.normal(0, 1.0, (k, dim)).astype(np.float32)
    labels = rng.integers(0, k, n_vec)
    vecs = (centers[labels] +
            rng.normal(0, 0.35, (n_vec, dim))).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n_vec), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    }), f"{out}/embeddings.parquet")
    print(f"wrote {n_docs} documents, {n_vec} embeddings to {out}")

if __name__ == "__main__":
    main()
