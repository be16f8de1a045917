#!/usr/bin/env python3
"""Generate an APPROXIMATE sf1.0-scale testdata dir for optimization A/Bs.

The grading driver escalated its round-5 measurement to sf1.0 (50k docs,
6M lineitem — BENCH_r05.json "sf": 1.0) but only sf0.001/0.01/0.1 persist
under /root/testdata between rounds. This script synthesizes a 10x sf0.1
dir with the SAME schemas and empirical distributions (word frequencies,
doc-length and language mix learned from sf0.1's documents table; 10x
replication with key offsets for the relational tables) so optimizations
can be validated at the driver's measurement scale.

NOT driver data, NOT used by bench.py defaults, NOT a correctness input —
timing testbed only. Usage:

    python bench_gen_sfbig.py [out_dir]      # default /root/sfbig/sf1.0
"""

from __future__ import annotations

import collections
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SCALE = 10
SEED = 20260822


def gen_documents(out_dir: str) -> None:
    t = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    rng = np.random.default_rng(SEED)

    # empirical word distribution + per-doc word-count distribution
    wc = collections.Counter()
    lens = []
    for s in t["text"]:
        ws = s.split()
        wc.update(ws)
        lens.append(len(ws))
    words = list(wc)
    freqs = np.array([wc[w] for w in words], np.float64)
    freqs /= freqs.sum()
    lens = np.asarray(lens)

    langs, lang_p = zip(*collections.Counter(t["lang"]).items())
    lang_p = np.array(lang_p, np.float64)
    lang_p /= lang_p.sum()

    n = len(t) * SCALE
    out_text, out_lang = [], []
    n_dup = 0
    for i in range(n):
        # ~0.16% exact dups (copy-previous), like sf0.1's 8/5000
        if i > 0 and rng.random() < 0.0016:
            out_text.append(out_text[-1])
            n_dup += 1
        else:
            k = int(lens[rng.integers(0, len(lens))])
            idx = rng.choice(len(words), size=k, p=freqs)
            out_text.append(" ".join(words[j] for j in idx))
        out_lang.append(langs[int(rng.choice(len(langs), p=lang_p))])
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(out_text, pa.string()),
        "lang": pa.array(out_lang, pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
        "n_chars": pa.array([len(s) for s in out_text], pa.int64()),
    })
    # two row groups, mirroring the narrow-split layout the driver's sf1.0
    # documents parquet showed (OPTIMIZATION_r06 "2-split scan" note)
    pq.write_table(tbl, f"{out_dir}/documents.parquet",
                   row_group_size=(n + 1) // 2)
    print(f"documents: {n} rows ({n_dup} exact dups)")


def gen_events(out_dir: str) -> None:
    t = pq.read_table(f"{SRC}/events.parquet")
    n0 = t.num_rows
    rng = np.random.default_rng(SEED + 1)
    parts = []
    ts = t["ts"].to_numpy()
    span = ts.max() - ts.min()
    for r in range(SCALE):
        d = t.to_pandas()
        d["event_id"] = d["event_id"] + r * n0
        # keep the time span, interleave replicas with a sub-second jitter
        d["ts"] = d["ts"] + (np.timedelta64(r * 997, "ms"))
        d["user_id"] = d["user_id"] + (r % 3) * int(d["user_id"].max() + 1)
        parts.append(d)
    import pandas as pd

    big = pd.concat(parts, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(big, preserve_index=False),
                   f"{out_dir}/events.parquet",
                   row_group_size=max(1, len(big) // 4))
    print(f"events: {len(big)} rows (span {span})")


def gen_embeddings(out_dir: str) -> None:
    t = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    rng = np.random.default_rng(SEED + 2)
    base = np.stack([np.asarray(v, np.float32) for v in t["embedding"]])
    n0, dim = base.shape
    reps = []
    for r in range(SCALE):
        noise = rng.normal(0, 0.05, size=base.shape).astype(np.float32)
        reps.append(base + (noise if r else 0))
    vecs = np.concatenate(reps)
    n = len(vecs)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([v for v in vecs.tolist()],
                              pa.list_(pa.float32())),
        "label": pa.array(list(t["label"].astype("int32")) * SCALE,
                          pa.int32()),
    })
    pq.write_table(tbl, f"{out_dir}/embeddings.parquet",
                   row_group_size=max(1, n // 2))
    print(f"embeddings: {n} rows dim {dim}")


def gen_relational(out_dir: str) -> None:
    import pandas as pd

    copies = {"orders": ("o_orderkey",), "lineitem": ("l_orderkey",),
              "customer": ("c_custkey",), "part": ("p_partkey",),
              "supplier": ("s_suppkey",)}
    maxes = {}
    for name in ["orders", "customer", "part", "supplier"]:
        t = pq.read_table(f"{SRC}/{name}.parquet").to_pandas()
        keycol = copies[name][0]
        maxes[name] = int(t[keycol].max()) + 1
    for name, keys in copies.items():
        t = pq.read_table(f"{SRC}/{name}.parquet").to_pandas()
        parts = []
        for r in range(SCALE):
            d = t.copy()
            for k in keys:
                d[k] = d[k] + r * (maxes["orders"] if "orderkey" in k
                                   else maxes[name])
            if name == "orders":
                d["o_custkey"] = d["o_custkey"] + r * maxes["customer"]
            if name == "lineitem":
                d["l_partkey"] = d["l_partkey"] + r * maxes["part"]
                d["l_suppkey"] = d["l_suppkey"] + r * maxes["supplier"]
            parts.append(d)
        big = pd.concat(parts, ignore_index=True)
        pq.write_table(pa.Table.from_pandas(big, preserve_index=False),
                       f"{out_dir}/{name}.parquet",
                       row_group_size=max(1, len(big) // 4))
        print(f"{name}: {len(big)} rows")
    for name in ["nation", "region"]:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{out_dir}/{name}.parquet")
        print(f"{name}: {t.num_rows} rows (copied)")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/sfbig/sf1.0"
    os.makedirs(out_dir, exist_ok=True)
    gen_documents(out_dir)
    gen_events(out_dir)
    gen_embeddings(out_dir)
    gen_relational(out_dir)
    open(os.path.join(out_dir, "_DONE"), "w").close()
    print("done:", out_dir)


if __name__ == "__main__":
    main()
