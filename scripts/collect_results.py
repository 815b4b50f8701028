#!/usr/bin/env python
"""JSONL results -> CSV, the fetch_*.py analogue
(/root/reference/scripts/fetch_scalability.py etc. pull MongoDB docs into
CSVs keyed on meta labels; here the source is exp_sweep.py's JSONL)."""

from __future__ import annotations

import argparse
import csv
import json
import sys

COLUMNS = [
    ("label", ("meta", "label")),
    ("dataset", ("meta", "dataset")),
    ("shards", ("meta", "num_shards")),
    ("zipf", ("meta", "zipf")),
    ("m", ("hnsw_parameters", "m")),
    ("ef_search", ("hnsw_parameters", "ef_search")),
    ("build_ms", ("build", "build_time_ms")),
    ("qps", ("queries", "queries_per_sec")),
    ("recall", ("queries", "recall")),
    ("distcomps", ("queries", "distance_computations")),
    ("scanned_rows", ("queries", "scanned_rows")),
    ("hbm_bytes", ("queries", "hbm_gather_bytes")),
    ("ici_bytes", ("queries", "ici_exchange_bytes")),
    ("cache_hit_rate", ("cache", "hit_rate")),
]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("jsonl")
    p.add_argument("--out", default="-")
    args = p.parse_args()
    rows = []
    with open(args.jsonl) as f:
        for line in f:
            if line.strip():
                doc = json.loads(line)
                rows.append(
                    [_get(doc, path) for _, path in COLUMNS]
                )
    out = sys.stdout if args.out == "-" else open(args.out, "w", newline="")
    w = csv.writer(out)
    w.writerow([c for c, _ in COLUMNS])
    w.writerows(rows)
    return 0


def _get(doc, path):
    for k in path:
        doc = doc.get(k, {}) if isinstance(doc, dict) else {}
    return doc if not isinstance(doc, dict) else ""


if __name__ == "__main__":
    raise SystemExit(main())
