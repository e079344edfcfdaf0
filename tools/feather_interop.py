#!/usr/bin/env python3
"""Feather-lz4 wire interop harness for graft.functions.FeatherBlob.

Two modes:

  gen <outdir>      Write reference-side fixtures exactly as the
                    reference would (pandas Series -> to_feather lz4,
                    hostore/models/hostore.py:347-353), in both index
                    layouts the reference can emit, plus an expected.json
                    with the logical contents. Committed under
                    src/test/resources/feather/ so FeatherBlobSpec pins
                    the reference->graft direction in CI.

  check <file.feather>   Read a graft-encoded blob with pd.read_feather and
                    apply the reference's read-path fix
                    (set_index('index'), hostore.py:250-252), printing
                    name/rows — the graft->reference direction.
"""
import io
import json
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.ipc


def series():
    idx = pd.date_range("2021-03-01", periods=9, freq="30min")
    vals = [1.5, np.nan, -2.25, 0.0, np.nan, np.nan, 7.75, 1e12, -0.001]
    return pd.Series(vals, index=idx)


def expected(s):
    return {
        "ts_micros": [int(t.value // 1000) for t in s.index],
        "values": [None if np.isnan(v) else v for v in s.values],
    }


def gen(outdir):
    s = series()
    # modern layout: DatetimeIndex serialized via pandas schema metadata
    # as __index_level_0__ (pandas >= MIN_PANDAS_VERSION_FEATHER_SAVE_
    # DATETIME_INDEX branch of hostore.py:349-351)
    buf = io.BytesIO()
    s.to_frame(name="prm_modern").to_feather(buf, compression="lz4")
    open(f"{outdir}/modern_index.feather", "wb").write(buf.getvalue())
    # legacy layout: index reset into an explicit 'index' column (the
    # older-pandas branch); the read path set_index()s it back
    buf = io.BytesIO()
    s.to_frame(name="prm_legacy").reset_index(names=["index"]).to_feather(
        buf, compression="lz4")
    open(f"{outdir}/legacy_index.feather", "wb").write(buf.getvalue())
    # multi-batch file: same logical series split over 3 record batches
    df = s.to_frame(name="prm_batched").reset_index(names=["index"])
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    sink = io.BytesIO()
    with pa.ipc.new_file(
            sink, tbl.schema,
            options=pa.ipc.IpcWriteOptions(compression="lz4")) as w:
        for batch in tbl.to_batches(max_chunksize=4):
            w.write_batch(batch)
    open(f"{outdir}/multi_batch.feather", "wb").write(sink.getvalue())
    json.dump(expected(s), open(f"{outdir}/expected.json", "w"), indent=1)
    print(f"wrote 3 fixtures + expected.json to {outdir}")


def check(path):
    ds = pd.read_feather(path)
    if "index" in ds.columns:  # the reference's read-path fix
        ds = ds.set_index("index")
    col = ds.iloc[:, 0]
    exp = expected(series())
    got_ts = [int(t.value // 1000) for t in ds.index]
    got_vals = [None if np.isnan(v) else v for v in col.values]
    assert got_ts == exp["ts_micros"], f"ts mismatch: {got_ts} != {exp['ts_micros']}"
    assert got_vals == exp["values"], f"values mismatch: {got_vals} != {exp['values']}"
    print(f"OK: pd.read_feather({path}) -> series '{col.name}', "
          f"{len(col)} rows, byte-level reference read-path parity")


if __name__ == "__main__":
    if sys.argv[1] == "gen":
        gen(sys.argv[2])
    elif sys.argv[1] == "check":
        check(sys.argv[2])
    else:
        raise SystemExit(f"unknown mode {sys.argv[1]}")
