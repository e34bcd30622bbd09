#!/usr/bin/env python3
"""Deterministic 10x amplification of sf0.1 -> the "sf1x" stretch-probe
fixture (BASELINE.md's scale probes run against it).

Round-5/6 history: the original amplification was built ad-hoc in /tmp and
the script was never committed, so the fixture died with the VM — this file
closes that reproducibility gap. It also fixes the round-5 embedding-noise
defect BASELINE.md documents: the old per-dim noise
`((vec_id*64+i)*2654435761 + k*40503) % 1000` is linear in i modulo 1000 (a
sawtooth), so noise vectors of different (vec_id, k) were shifted copies of
one periodic ramp and correlated strongly — the amplified corpus was DENSE
(4.63M pairs at cos >= 0.9). Here the noise is a splitmix64 hash of
(k, vec_id, dim): properly decorrelated, cross-copy cosine < 0.4 by
construction, so near-dup structure scales ~10x linearly as designed.
Probe rows measured on the regenerated fixture are marked in BASELINE.md.

Construction (copy k = 0..9; k=0 is the original rows):
- documents:  doc_id += k*1e6; k>0 inserts the copy token f"c{k}q" after
              every 5th token (every 64-char gram then spans an insertion
              => no cross-copy exact substrings; 3-gram Jaccard ~ 0.35).
- embeddings: vec_id += k*1e6; e_i += U(-0.6, 0.6) from splitmix64(k,id,i)
              (unit-norm inputs => cross-copy cos ~ 0.34 expected).
- events:     event_id += k*1e7; user_id += k*1e6; ts += k days
              (physical timestamp type preserved, unit-adaptive).
- customer:   c_custkey += k*1e6.
- orders:     o_orderkey += k*1e7; o_custkey += k*1e6.
- lineitem:   l_orderkey += k*1e7; l_partkey/l_suppkey += k*1e6.
- part/supplier: keys += k*1e6.
- region/nation: copied unchanged (shared dims across the 10 sub-stars).

Usage: python tools/make_sf1x.py [src_dir] [dst_dir] [K] [decorrelate]
       (defaults: /root/testdata/sf0.1 -> /tmp/sf1x, K=10 copies;
        K=100 builds the "sf10" 100x stretch fixture — round-12 verdict #6.
        Copies are written INCREMENTALLY, one per row group, so K=100 never
        materializes the whole amplified table in memory.)

Document modes:
- default (insertion): k>0 inserts a copy token after every 5th token.
  Cross-copy 3-gram Jaccard ~0.35 — below the 0.5 dedup threshold but
  SHARING ~35% of shingles, which deliberately stresses candidate pruning.
  That shared mass is quadratic in K (every df>=2 shingle pools all K
  copies into one prefix bucket): fine at K=10, a duplication BOMB at
  K=100 (~25M PPJoin candidates from 5k doc groups — measured as a 5-min
  driver GC stall). K=100 with this mode does not model "100x more data";
  it models every document having 99 near-copies.
- decorrelate: k>0 suffixes EVERY token with the copy id (w7 -> w7c3).
  Copies share NO shingles/grams, while each copy preserves the original
  corpus's internal near-dup structure exactly (all docs in a copy are
  transformed identically, so within-copy Jaccard relations are
  unchanged). 100x = 100 independent shards of equal structure — the
  honest "more data, same duplication rate" scale probe. Use for the
  sf1x-vs-sf10 decade measurements (generate BOTH scales in this mode).
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1x"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
DECOR = len(sys.argv) > 4 and sys.argv[4] == "decorrelate"


def splitmix64(x):
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


def offset_cols(t, k, offsets):
    cols = {}
    for name in t.column_names:
        c = t.column(name)
        if name in offsets:
            c = pa.chunked_array([pa.compute.add(ch, offsets[name] * k) for ch in c.chunks])
        cols[name] = c
    return pa.table(cols, schema=t.schema)


def copy_documents(t, k):
    if k == 0:
        return t
    doc_id = pa.compute.add(t.column("doc_id"), 1_000_000 * k)
    tok = f"c{k}q"
    texts = []
    for s in t.column("text").to_pylist():
        ws = s.split(" ")
        if DECOR:
            # copy-unique token suffix: zero cross-copy shingle/gram overlap,
            # within-copy dedup structure preserved (see module doc)
            texts.append(" ".join(w + tok for w in ws))
            continue
        out = []
        for i, w in enumerate(ws):
            out.append(w)
            if i % 5 == 4:
                out.append(tok)
        texts.append(" ".join(out))
    text = pa.array(texts, type=pa.string())
    n_chars = pa.array([len(s) for s in texts], type=pa.int64())
    return pa.table({"doc_id": doc_id, "text": text,
                     "lang": t.column("lang"), "source": t.column("source"),
                     "n_chars": n_chars}, schema=t.schema)


def copy_embeddings(t, k):
    if k == 0:
        return t
    vec_id = t.column("vec_id").to_numpy()
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float32)  # (n, 64)
    n, d = emb.shape
    idx = (np.uint64(k) * np.uint64(1 << 40)
           + vec_id.astype(np.uint64)[:, None] * np.uint64(64)
           + np.arange(d, dtype=np.uint64)[None, :])
    noise = ((splitmix64(idx) % np.uint64(2001)).astype(np.float64) - 1000.0) / 1000.0 * 0.6
    out = (emb + noise).astype(np.float32)
    return pa.table(
        {"vec_id": pa.array(vec_id + 1_000_000 * k, type=pa.int64()),
         "embedding": pa.array(list(out), type=pa.list_(pa.float32())),
         "label": t.column("label")}, schema=t.schema)


def copy_events(t, k):
    if k == 0:
        return t
    cols = {}
    for name in t.column_names:
        c = t.column(name)
        if name == "event_id":
            c = pa.compute.add(c, 10_000_000 * k)
        elif name == "user_id":
            c = pa.compute.add(c, 1_000_000 * k)
        elif name == "ts":
            # unit-adaptive: the fixture's ts encoding drifts between rounds
            # (ns through r5, us since r6) — offset by k days in whatever
            # unit the source actually uses, preserving its type exactly
            unit = t.schema.field(name).type.unit
            per_day = {"s": 86_400, "ms": 86_400_000,
                       "us": 86_400_000_000, "ns": 86_400_000_000_000}[unit]
            iv = c.cast(pa.int64())
            iv = pa.compute.add(iv, per_day * k)
            c = iv.cast(t.schema.field(name).type)
        cols[name] = c
    return pa.table(cols, schema=t.schema)


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    plans = {
        "documents": copy_documents,
        "embeddings": copy_embeddings,
        "events": copy_events,
        "customer": lambda t, k: offset_cols(t, k, {"c_custkey": 1_000_000}),
        "orders": lambda t, k: offset_cols(t, k, {"o_orderkey": 10_000_000,
                                                  "o_custkey": 1_000_000}),
        "lineitem": lambda t, k: offset_cols(t, k, {"l_orderkey": 10_000_000,
                                                    "l_partkey": 1_000_000,
                                                    "l_suppkey": 1_000_000}),
        "part": lambda t, k: offset_cols(t, k, {"p_partkey": 1_000_000}),
        "supplier": lambda t, k: offset_cols(t, k, {"s_suppkey": 1_000_000}),
        "region": None,
        "nation": None,
    }
    for name, fn in plans.items():
        t = pq.read_table(f"{SRC}/{name}.parquet")
        if fn is None:
            # preserve the source's physical timestamp type (events: unit-adaptive)
            pq.write_table(t, f"{DST}/{name}.parquet",
                           coerce_timestamps=None, use_deprecated_int96_timestamps=False)
            print(f"{name}: {t.num_rows} -> {t.num_rows}")
        else:
            # incremental: one copy per write, bounded memory at any K
            with pq.ParquetWriter(f"{DST}/{name}.parquet", t.schema) as w:
                for k in range(K):
                    w.write_table(fn(t, k))
            print(f"{name}: {t.num_rows} -> {t.num_rows * K}")


if __name__ == "__main__":
    main()
