"""Generate a MEASUREMENT-ONLY scaled corpus mimicking the driver's
testdata distributions (word-soup documents + 64-dim embeddings).

The driver's own sf1.0 dir (50k docs / 20k embeddings) existed only
during the bonus-start bench and was removed; optimization work still
has to be validated at that scale (VERDICT r6: config tuned only to
sf0.1 may not hold). This tool rebuilds a statistically matching corpus
— same vocab (30 uniform words + the 'dup' marker), doc length 8-100
words, 5% seeded near-dup docs, 20 sources, 5 langs with the observed
mix, unit-ish Gaussian embeddings — at any multiple of sf0.1. It is NOT
the driver's data (different RNG), so numbers measured on it are
relative evidence, not the driver's absolute seconds.

Usage: python tools/gen_scale_corpus.py /tmp/gs_scale/sf1x 50000 20000
Other tables (lineitem, orders, events, ...) are symlinked from sf0.1
so the full query surface still runs against the generated dir.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def gen_documents(n_docs: int, rng: np.random.Generator) -> pa.Table:
    lens = rng.integers(8, 101, size=n_docs)
    texts: list[str] = []
    vocab = np.array(VOCAB)
    for i in range(n_docs):
        words = vocab[rng.integers(0, len(vocab), size=lens[i])]
        texts.append(" ".join(words))
    # 5% near-dup docs: copy an earlier doc, substitute one word with
    # the 'dup' marker (J ~= 0.97 at word-3-gram level, like testdata)
    n_dup = n_docs // 20
    dup_ids = rng.choice(np.arange(n_docs // 2, n_docs), size=n_dup,
                         replace=False)
    for d in dup_ids:
        src = int(rng.integers(0, n_docs // 2))
        w = texts[src].split(" ")
        w[int(rng.integers(0, len(w)))] = "dup"
        texts[d] = " ".join(w)
    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    return pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n_docs)],
                           pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(n_vecs: int, rng: np.random.Generator,
                   dim: int = 64) -> pa.Table:
    x = rng.standard_normal((n_vecs, dim)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    # ~1.5% seeded near-dup vectors (cosine ~= 0.99)
    n_dup = max(1, n_vecs // 64)
    dup_ids = rng.choice(np.arange(n_vecs // 2, n_vecs), size=n_dup,
                         replace=False)
    for d in dup_ids:
        src = int(rng.integers(0, n_vecs // 2))
        v = x[src] + 0.05 * rng.standard_normal(dim).astype(np.float32)
        x[d] = v / np.linalg.norm(v)
    return pa.table({
        "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
        "embedding": pa.array(list(x), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n_vecs), pa.int32()),
    })


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gs_scale/sf1x"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    pq.write_table(gen_documents(n_docs, rng),
                   os.path.join(out, "documents.parquet"))
    pq.write_table(gen_embeddings(n_vecs, rng),
                   os.path.join(out, "embeddings.parquet"))
    src_dir = "/root/testdata/sf0.1"
    for name in os.listdir(src_dir):
        dst = os.path.join(out, name)
        if name.endswith(".parquet") and not os.path.exists(dst):
            os.symlink(os.path.join(src_dir, name), dst)
    print(f"wrote {out}: {n_docs} docs, {n_vecs} embeddings "
          "(rest symlinked from sf0.1)")


if __name__ == "__main__":
    main()
