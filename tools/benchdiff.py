#!/usr/bin/env python3
"""Compare two Bench JSON artifacts per query and flag regressions.

Accepts either the raw one-line {"metric": ...} JSON (bench_last.json)
or a driver round artifact (BENCH_r*.json, whose `tail` embeds —
possibly truncated — the same line). Core counts can differ between
artifacts, so absolute ratios are normalized by the median ratio
across common queries before flagging: a query is a regression when
its ratio exceeds `threshold` × the median ratio (i.e. it got slower
RELATIVE to the rest of the suite).

Usage: python3 tools/benchdiff.py <old.json> <new.json> [threshold=1.3]
"""
import json
import statistics
import sys


def load_queries(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d["queries"]
    tail = d.get("tail", "")
    i = tail.find('"queries":{')
    if i < 0:
        raise SystemExit(f"{path}: no queries dict found")
    seg = tail[i + len('"queries":{'):tail.find("}", i)]
    out = {}
    for pair in seg.split(","):
        if ":" not in pair:
            continue
        k, v = pair.rsplit(":", 1)
        try:
            out[k.strip().strip('"')] = float(v)
        except ValueError:
            pass  # truncated tail: keep what parses
    return out


def main(old_path, new_path, threshold):
    old, new = load_queries(old_path), load_queries(new_path)
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries")
    ratios = {q: new[q] / old[q] for q in common if old[q] > 0}
    med = statistics.median(ratios.values())
    print(f"common={len(common)}  sum_old={sum(old[q] for q in common):.1f}s  "
          f"sum_new={sum(new[q] for q in common):.1f}s  median_ratio={med:.2f}x")
    flagged = [(r / med, q) for q, r in ratios.items() if r / med > threshold]
    for rel, q in sorted(flagged, reverse=True):
        print(f"  REGRESSION {rel:4.2f}x (rel to median): {q}: "
              f"{old[q]:.2f}s -> {new[q]:.2f}s")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"  dropped: {', '.join(only_old)}")
    if only_new:
        print(f"  added:   {', '.join(only_new)}")
    return 1 if flagged else 0


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    sys.exit(main(sys.argv[1], sys.argv[2], t))
