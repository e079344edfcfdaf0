#!/usr/bin/env python3
"""Time the DuckDB oracle workload — the operative baseline the bench
gate is measured against. Runs every oracleSql entry from a Verify dump
(oracle_sql.json) over the same parquet tables at the given SF, reps
times each (interleaved, min-of-reps — the Bench.scala noise
discipline), and prints one JSON line mirroring BENCH json shape.

Usage: python3 tools/duckbench.py <sfDir> <verifyOutDir> [reps]
"""
import json
import sys
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    con.execute(f"SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    samples = {name: [] for name in oracle}
    for rep in range(reps):
        for name, sql in oracle.items():
            t0 = time.monotonic()
            con.execute(sql).fetchall()
            samples[name].append(time.monotonic() - t0)
    queries = {n: min(s) for n, s in samples.items()}
    total = sum(queries.values())
    print(json.dumps({
        "metric": "duckdb_total", "value": total, "unit": "sec",
        "queries": queries, "sf": sf_dir, "reps": reps, "n": len(queries),
    }))


if __name__ == "__main__":
    main()
