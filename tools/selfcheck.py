#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: run each oracle SQL
from verify-out/oracle_sql.json in DuckDB over the same parquet tables, and
compare to the Spark result parquet (columns sorted by name, rows sorted,
values hashed with float rounding tolerance).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import json
import sys
import duckdb
import pandas as pd
import numpy as np
import glob
import os

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Fixture-drift guard (VERDICT r9 item 3): the round-9 driver regenerated
# events.parquet from TIMESTAMP(NANOS) to timestamp[us] between the builder's
# certification and the official run, silently breaking 38 queries. Assert the
# schema of every column the engine branches on, and fail LOUDLY on anything
# new so drift is a one-line diagnostic instead of 38 opaque analysis errors.
EXPECTED = {
    "events": {"ts": {"timestamp[us]", "timestamp[ns]", "int64"}},
    "lineitem": {"l_shipdate": {"date32[day]", "timestamp[us]"}},
    "orders": {"o_orderdate": {"date32[day]", "timestamp[us]"}},
    "documents": {"text": {"string", "large_string"}},
    "embeddings": {"embedding": {"list<element: float>", "list<item: float>",
                                 "list<element: double>", "list<item: double>"}},
}


def check_fixture_schemas(sf_dir):
    import pyarrow.parquet as pq
    problems = []
    for table, cols in EXPECTED.items():
        p = f"{sf_dir}/{table}.parquet"
        if not os.path.exists(p):
            continue
        schema = pq.read_schema(p)
        for col, allowed in cols.items():
            if col not in schema.names:
                problems.append(f"{table}.{col}: column missing (schema: {schema.names})")
                continue
            actual = str(schema.field(col).type)
            if actual not in allowed:
                problems.append(
                    f"{table}.{col} is {actual}, expected one of {sorted(allowed)} — "
                    f"fixture schema drifted; update SparkEntry readers + this guard")
            # ADVICE r10: an int64 ts is interpreted as raw NANOSECONDS by
            # SparkEntry.events() (ts div 1000). An int64 column holding
            # micro/milliseconds would pass the type check yet misconvert by
            # 1000x — assert the value magnitude sits in the nanos range for
            # the fixture's 2020-2030 window (mirrors FixtureSpec).
            if table == "events" and col == "ts" and actual == "int64":
                import duckdb as _dk
                lo, hi = _dk.connect().execute(
                    f"SELECT min(ts), max(ts) FROM read_parquet('{p}')").fetchone()
                ns_lo, ns_hi = 1_577_836_800 * 10**9, 1_893_456_000 * 10**9  # 2020..2030 in ns
                if lo is None or hi is None:
                    problems.append(
                        f"events.ts int64 has no non-null values — cannot "
                        f"verify the nanos magnitude; fixture looks empty")
                elif not (ns_lo <= lo and hi <= ns_hi):
                    problems.append(
                        f"events.ts int64 values [{lo}, {hi}] are not in the "
                        f"2020-2030 NANOSECONDS range [{ns_lo}, {ns_hi}] — the "
                        f"column is probably micro/milliseconds; events() would "
                        f"misconvert by 1000x")
    if problems:
        print("FIXTURE SCHEMA DRIFT DETECTED:")
        for p in problems:
            print(f"  {p}")
        sys.exit(2)
    print(f"[fixtures] {sf_dir}: schemas OK")


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError, OverflowError):
                df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    check_fixture_schemas(sf_dir)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, w = norm(got.copy()), norm(want.copy())
        if list(g.columns) != list(w.columns):
            print(f"[FAIL] {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"[FAIL] {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        ok = True
        for c in g.columns:
            if pd.api.types.is_float_dtype(g[c]):
                a, b = g[c].to_numpy(), w[c].to_numpy()
                eq = (np.isclose(a, b, rtol=1e-9, atol=1e-9) | (pd.isna(a) & pd.isna(b)))
                if not eq.all():
                    i = int(np.argmin(eq))
                    print(f"[FAIL] {name}: col {c} differs at row {i}: {a[i]} != {b[i]}")
                    ok = False
                    break
            else:
                if not g[c].equals(w[c]):
                    diff = g[c] != w[c]
                    i = int(diff.idxmax())
                    print(f"[FAIL] {name}: col {c} differs at row {i}: {g[c][i]!r} != {w[c][i]!r}")
                    ok = False
                    break
        if ok:
            print(f"[pass] {name}: {len(g)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
