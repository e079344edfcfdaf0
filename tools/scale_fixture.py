#!/usr/bin/env python3
"""Scale the driver's sf0.1 fixture 10x to a local sf1 (default /tmp/sf1)
for scaling-exponent stress runs (SCALE.md). Deterministic, structure-
preserving replication — each replica reproduces sf0.1's intra-replica
statistics while cross-replica degeneracy is deliberately broken so the
run measures ENGINE scaling, not data blowup:

- documents: doc_id += r*N; for r > 0 every token gets a replica prefix
  ("r3x" + token), so shingle/minhash/winnow pair structure per replica
  equals sf0.1's and cross-replica tokens never collide (total dup pairs
  grow linearly with corpus size — the null hypothesis for a healthy
  dedup operator).
- embeddings: vec_id += r*N; for r > 0 a SIGNED PERMUTATION of the
  dimensions (rotate by r, deterministic +-1 signs). An orthogonal map:
  in-replica norms and pairwise cosines are preserved EXACTLY, while
  cross-replica cosines decorrelate to ~0 at 64 dims — near-dup pair
  counts grow linearly, never quadratically.
- events / lineitem / orders: ids offset per replica, payloads kept.
- dims (region nation customer supplier part): copied as-is.

Usage: python3 tools/scale_fixture.py [out_dir] [factor]
"""
import hashlib
import os
import sys

import duckdb
import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"


def signs(r: int, d: int) -> np.ndarray:
    h = hashlib.md5(f"scale-fixture-{r}".encode()).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "little"))
    return rng.choice([-1.0, 1.0], size=d).astype(np.float32)


def main(out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def src(t):
        return f"read_parquet('{SRC}/{t}.parquet')"

    for t in ["region", "nation", "customer", "supplier", "part"]:
        con.execute(f"COPY (SELECT * FROM {src(t)}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")

    # documents: token-prefix replicas
    docs = con.execute(f"SELECT * FROM {src('documents')}").fetchdf()
    n_docs = len(docs)
    reps = []
    for r in range(factor):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + r * n_docs
        if r > 0:
            pre = f"r{r}x"
            d["text"] = d["text"].map(lambda t: " ".join(pre + w for w in t.split()))
            d["n_chars"] = d["text"].str.len()
        reps.append(d)
    pd.concat(reps, ignore_index=True).to_parquet(f"{out}/documents.parquet", index=False)

    # embeddings: signed-permutation replicas (orthogonal per replica)
    emb = con.execute(f"SELECT * FROM {src('embeddings')}").fetchdf()
    n_vec = len(emb)
    mat = np.stack(emb["embedding"].to_numpy())  # (n, d) float32
    d_dim = mat.shape[1]
    reps = []
    for r in range(factor):
        e = emb.copy()
        e["vec_id"] = e["vec_id"] + r * n_vec
        if r > 0:
            rolled = np.roll(mat, r % d_dim, axis=1) * signs(r, d_dim)
            e["embedding"] = list(rolled)
        reps.append(e)
    allemb = pd.concat(reps, ignore_index=True)
    allemb["embedding"] = allemb["embedding"].map(lambda v: np.asarray(v, dtype=np.float32))
    allemb.to_parquet(f"{out}/embeddings.parquet", index=False)

    # events / lineitem / orders: key offsets in SQL (keeps parquet types)
    n_users = con.execute(f"SELECT count(DISTINCT user_id) FROM {src('events')}").fetchone()[0]
    n_events = con.execute(f"SELECT count(*) FROM {src('events')}").fetchone()[0]
    max_ok = con.execute(f"SELECT max(o_orderkey) + 1 FROM {src('orders')}").fetchone()[0]
    max_ck = con.execute(f"SELECT max(o_custkey) + 1 FROM {src('orders')}").fetchone()[0]
    rng = f"range({factor})"
    # ts as INT64 epoch-nanos: the driver fixture is TIMESTAMP(NANOS),
    # which SparkEntry.events() reads via nanosAsLong + `ts div 1000` —
    # a plain BIGINT nanos column hits the same read path
    con.execute(
        f"""COPY (
          SELECT event_id + r.range * {n_events} AS event_id,
                 CAST(epoch_ns(ts) AS BIGINT) AS ts,
                 user_id + r.range * {n_users} AS user_id, event_type, value, props
          FROM {src('events')} CROSS JOIN {rng} r
        ) TO '{out}/events.parquet' (FORMAT PARQUET)""")
    con.execute(
        f"""COPY (
          SELECT l_orderkey + r.range * {max_ok} AS l_orderkey, l_partkey, l_suppkey,
                 l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
                 l_returnflag, l_linestatus, l_shipdate
          FROM {src('lineitem')} CROSS JOIN {rng} r
        ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
    con.execute(
        f"""COPY (
          SELECT o_orderkey + r.range * {max_ok} AS o_orderkey,
                 o_custkey + r.range * {max_ck} AS o_custkey,
                 o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM {src('orders')} CROSS JOIN {rng} r
        ) TO '{out}/orders.parquet' (FORMAT PARQUET)""")

    for t in ["documents", "embeddings", "events", "lineitem", "orders"]:
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    main(out, factor)
