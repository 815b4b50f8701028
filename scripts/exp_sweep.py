#!/usr/bin/env python
"""Experiment sweep driver.

The reference's exp_*.py scripts grid over datasets x labels x Zipf alpha
x threads/cache/CN-count and push each run's JSON to MongoDB
(/root/reference/scripts/exp_scalability.py, benchmark.py:71-79). Here
each run is one `python -m shine_tpu` invocation (no ssh cluster — the
mesh is in-process) and results append to a local JSONL file that
collect_results.py turns into CSV.

Examples:
  python scripts/exp_sweep.py --out results.jsonl \
      --synthetic 200000:128 --index hnsw flat ivf --ef-search 64 96 128
  python scripts/exp_sweep.py --out skew.jsonl --synthetic 100000:64 \
      --index flat --zipf 0 0.75 1.25
"""

from __future__ import annotations

import argparse
import itertools
import json
import subprocess
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True, help="JSONL results file (append)")
    p.add_argument("--synthetic", default="100000:64")
    p.add_argument("--data-path")
    p.add_argument("--index", nargs="+", default=["hnsw"])
    p.add_argument("--ef-search", nargs="+", type=int, default=[128])
    p.add_argument("--shards", nargs="+", type=int, default=[1])
    p.add_argument("--zipf", nargs="+", type=float, default=[0.0])
    p.add_argument("--cache-ratio", nargs="+", type=float, default=[-1.0],
                   help="cache sweep axis; 0 = cache off, -1 = axis unused "
                        "(exp_cache_size_and_skew.py analogue)")
    p.add_argument("--cpu-mesh", type=int, default=0,
                   help="run children on N virtual CPU devices "
                        "(SHINE_FORCE_CPU_DEVICES)")
    p.add_argument("--num-queries", type=int, default=2000)
    p.add_argument("--index-cache",
                   help="store the first hnsw run's graph here, load it in "
                        "the rest (benchmark.py:82-88 builds once too)")
    p.add_argument("--label", default="sweep")
    p.add_argument("--extra", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    import os

    env = os.environ.copy()
    if args.cpu_mesh:
        env["SHINE_FORCE_CPU_DEVICES"] = str(args.cpu_mesh)

    grid = list(itertools.product(
        args.index, args.ef_search, args.shards, args.zipf, args.cache_ratio
    ))
    for i, (index, ef, shards, zipf, ratio) in enumerate(grid):
        label = f"{args.label}:{index}"
        cmd = [sys.executable, "-m", "shine_tpu", "--index", index,
               "--ef-search", str(ef), "--shards", str(shards),
               "--zipf", str(zipf), "--num-queries", str(args.num_queries)]
        if ratio > 0:
            cmd += ["--cache", "--cache-ratio", str(ratio)]
            label += f":cache{ratio:g}"
        elif ratio == 0:
            label += ":nocache"
        cmd += ["--label", label]
        if args.data_path:
            cmd += ["--data-path", args.data_path]
        else:
            cmd += ["--synthetic", args.synthetic]
        if index == "hnsw" and args.index_cache:
            if os.path.exists(args.index_cache):
                cmd += ["--load-index", args.index_cache]
            else:
                cmd += ["--store-index", args.index_cache]
        cmd += args.extra
        print(f"[{i + 1}/{len(grid)}] {' '.join(cmd)}", file=sys.stderr)
        out = subprocess.run(cmd, capture_output=True, text=True, env=env)
        if out.returncode != 0:
            print(out.stderr[-2000:], file=sys.stderr)
            continue
        doc = json.loads(out.stdout.strip().splitlines()[-1])
        with open(args.out, "a") as f:
            f.write(json.dumps(doc) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
