#!/usr/bin/env python
"""Dataset preparation tools.

The reference's scripts/data/ utilities (/root/reference/scripts/data/):
  convert_format.py  fvecs/ivecs -> big-ann .fbin/.bin
  slice.py           take the first N vectors of a .fbin
  create_queries.py  split a query pool into warmup + timed workloads
  skew.py            Zipf-skewed workloads (ported as shine_tpu.io.skew)

Subcommands here mirror those. No dataset downloads (no egress): use
`synth` to materialize a clustered synthetic dataset in the same on-disk
layout the loader expects.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shine_tpu.io import save_dataset, synthetic_dataset, write_bin, read_bin  # noqa: E402


def cmd_convert(args) -> None:
    """fvecs/ivecs (per-row leading dim) -> .fbin/.bin."""
    raw = np.fromfile(args.src, dtype=np.uint8)
    dim = int(np.frombuffer(raw[:4], dtype=np.int32)[0])
    itemsize = 4
    row_bytes = 4 + dim * itemsize
    n = len(raw) // row_bytes
    rows = raw[: n * row_bytes].reshape(n, row_bytes)
    body = rows[:, 4:].copy()
    if args.src.endswith(".fvecs"):
        arr = body.view(np.float32).reshape(n, dim)
    else:
        arr = body.view(np.int32).reshape(n, dim).astype(np.uint32)
    write_bin(args.out, arr)
    print(f"wrote {args.out}: {n} x {dim}")


def cmd_slice(args) -> None:
    arr = read_bin(args.src)
    write_bin(args.out, arr[: args.n])
    print(f"wrote {args.out}: {min(args.n, len(arr))} rows")


def cmd_queries(args) -> None:
    """Zipf workload files: warmup-<name> + query-<name> (reference
    create_queries.py/skew.py)."""
    from shine_tpu.io.skew import skewed_workload

    pool = read_bin(args.src)
    w, t, _ = skewed_workload(
        pool, total=args.total, alpha=args.zipf, warmup=args.warmup, seed=args.seed
    )
    root = os.path.dirname(os.path.abspath(args.src))
    name = f"zipf{args.zipf}"
    write_bin(os.path.join(root, f"warmup-{name}.fbin"), w)
    write_bin(os.path.join(root, f"query-{name}.fbin"), t)
    print(f"wrote warmup-{name}.fbin ({len(w)}) and query-{name}.fbin ({len(t)})")


def cmd_synth(args) -> None:
    n, d = (int(x) for x in args.shape.split(":"))
    ds = synthetic_dataset(n=n, dim=d, num_queries=args.queries, seed=args.seed)
    save_dataset(ds, args.out)
    print(f"wrote {args.out}: base {n}x{d}, {args.queries} queries + ground truth")


def main() -> int:
    p = argparse.ArgumentParser(prog="data_tools")
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("convert", help="fvecs/ivecs -> fbin/bin")
    c.add_argument("src")
    c.add_argument("out")
    c.set_defaults(fn=cmd_convert)
    s = sub.add_parser("slice", help="first N rows of a bin file")
    s.add_argument("src")
    s.add_argument("out")
    s.add_argument("-n", type=int, required=True)
    s.set_defaults(fn=cmd_slice)
    q = sub.add_parser("queries", help="Zipf workload files from a query pool")
    q.add_argument("src")
    q.add_argument("--total", type=int, default=500_000)
    q.add_argument("--warmup", type=int, default=100_000)
    q.add_argument("--zipf", type=float, default=0.0)
    q.add_argument("--seed", type=int, default=0)
    q.set_defaults(fn=cmd_queries)
    y = sub.add_parser("synth", help="synthetic dataset in the on-disk layout")
    y.add_argument("shape", help="N:D")
    y.add_argument("out")
    y.add_argument("--queries", type=int, default=10_000)
    y.add_argument("--seed", type=int, default=0)
    y.set_defaults(fn=cmd_synth)
    args = p.parse_args()
    args.fn(args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
