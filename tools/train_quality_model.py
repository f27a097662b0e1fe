"""Offline trainer for the frozen linear quality model
(name_match_ml_spark/functions/quality_model.py).

Distills the rule-based gopher gate into a fasttext-class linear
classifier over hashed word-unigram counts (the CCNet/LLaMA-style
model-based quality filter): 64 md5_60 hash buckets + bias, logistic
regression by deterministic full-batch gradient descent (no RNG), and
weights frozen onto a 1e6 integer grid.  Run manually when retraining:

    python tools/train_quality_model.py [sf_dir]

and paste the printed literals into quality_model.py.  The runtime
operator never trains — the declared query is a pure int64 fold over
frozen literals.
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import numpy as np

N_BUCKETS = 64
LR = 0.05
ITERS = 2000
L2 = 1e-3


def bucket(word: str) -> int:
    return int(hashlib.md5(word.encode()).hexdigest()[:15], 16) % N_BUCKETS


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    sys.path.insert(0, "/root/repo")
    from name_match_ml_spark.suite import ORACLE_SQL

    labels = dict(
        con.execute(
            f"SELECT doc_id, passes FROM ({ORACLE_SQL['gopher_quality']})"
        ).fetchall()
    )
    rows = con.execute("SELECT doc_id, lower(text) FROM documents").fetchall()

    X = np.zeros((len(rows), N_BUCKETS + 1))
    y = np.zeros(len(rows))
    for k, (doc_id, text) in enumerate(rows):
        for w in text.split():
            if w:
                X[k, bucket(w)] += 1.0
        X[k, N_BUCKETS] = 1.0  # bias
        y[k] = 1.0 if labels[doc_id] else 0.0

    # feature scaling for conditioning only; folded back into the
    # frozen weights afterwards so the runtime uses raw counts
    scale = X.std(axis=0)
    scale[scale == 0] = 1.0
    scale[N_BUCKETS] = 1.0
    Xs = X / scale

    w = np.zeros(N_BUCKETS + 1)
    for _ in range(ITERS):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w)))
        g = Xs.T @ (p - y) / len(y) + L2 * w
        g[N_BUCKETS] -= L2 * w[N_BUCKETS]
        w -= LR * g

    w_raw = w / scale
    p = 1.0 / (1.0 + np.exp(-(X @ w_raw)))
    acc = float(((p >= 0.5) == (y == 1.0)).mean())
    grid = np.round(w_raw * 1_000_000).astype(np.int64)
    acc_grid = float(
        (((X @ grid) >= 0) == (y == 1.0)).mean()
    )
    print(f"# train accuracy float={acc:.4f} grid={acc_grid:.4f} n={len(y)}")
    print(f"QUALITY_BIAS_GRID = {int(grid[N_BUCKETS])}")
    print("QUALITY_WEIGHTS_GRID = [")
    for i in range(0, N_BUCKETS, 8):
        print("    " + ", ".join(str(int(v)) for v in grid[i : i + 8]) + ",")
    print("]")


if __name__ == "__main__":
    main(*sys.argv[1:])
