#!/usr/bin/env python
"""Generate a larger scale factor by replicating /root/testdata/sf0.1.

The driver ships sf0.001/0.01/0.1 only; proving the scale TREND (VERDICT
r2 next-round #6) needs a bigger corpus.  Each replica shifts every key
family by replica_index * (max_key + 1) so fact/dimension joins stay
referentially intact and cardinalities scale by the replica count:

* ``customer/orders/lineitem/part/supplier``: key columns shifted;
  ``nation``/``region`` are fixed dimensions and copied once.
* ``events``: event ids and user ids shifted, timestamps kept — an event
  stream scales by more events in the same window, not a longer window.
* ``documents``: doc ids shifted and every WORD suffixed with the replica
  tag, so replicas are internally identical to sf0.1 but share no
  shingles across replicas — near-dup pair structure scales exactly
  linearly instead of exploding quadratically through cross-replica
  duplicate groups.
* ``embeddings``: vec ids shifted, vectors rotated (np.roll) per replica
  — norms and within-replica geometry preserved, no cross-replica
  identical vectors.

Output is git-ignored (.scale_data/); ~10x sf0.1 ≈ 170 MB.

Usage: python tools/make_scale_data.py [--factor 10] [--out .scale_data/sf1.0]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

KEY_SHIFTS = {
    # table -> {column: key_family}
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supp", "s_nationkey": None},  # nationkey fixed
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
COPY_ONCE = ["nation", "region"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default=".scale_data/sf1.0")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    for t in COPY_ONCE:
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{args.out}/{t}.parquet")
        print(t, "copied (dimension)")

    # span of each key family = max + 1 over the source
    spans: dict[str, int] = {}
    tables = {}
    for t, cols in KEY_SHIFTS.items():
        tables[t] = pq.read_table(f"{SRC}/{t}.parquet")
        for col, fam in cols.items():
            if fam is None:
                continue
            m = int(pa.compute.max(tables[t][col]).as_py())
            spans[fam] = max(spans.get(fam, 0), m + 1)

    for t, cols in KEY_SHIFTS.items():
        src = tables[t]
        reps = []
        for i in range(args.factor):
            cols_out = {}
            for name in src.column_names:
                arr = src[name]
                fam = cols.get(name)
                if fam and i > 0:
                    arr = pa.compute.add(arr, i * spans[fam])
                if t == "documents" and name == "text" and i > 0:
                    txt = arr.to_pylist()
                    tag = f"r{i}"
                    arr = pa.array(
                        [" ".join(w + tag for w in s.split()) if s else s for s in txt]
                    )
                if t == "embeddings" and name == "embedding" and i > 0:
                    mat = np.array(arr.to_pylist(), dtype=np.float32)
                    mat = np.roll(mat, i, axis=1)
                    arr = pa.array(list(mat), type=src.schema.field(name).type)
                cols_out[name] = arr
            reps.append(pa.table(cols_out, schema=src.schema if i == 0 else None))
        out = pa.concat_tables(
            [r.cast(src.schema) if r.schema != src.schema else r for r in reps]
        )
        pq.write_table(out, f"{args.out}/{t}.parquet")
        print(t, f"{src.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    sys_exit = main()
